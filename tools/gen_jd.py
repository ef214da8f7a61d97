"""Generate the constant J_l = D_l(Rx(-pi/2)) real-SH rotation blocks.

These play the role of e3nn's Jd.pt in the reference
(/root/reference/model/EF_layers.py:2195-2229) but are derived entirely from
our own spherical-harmonic implementation via least-squares fitting — no
external data. The runtime Euler factorisation (singa_tpu/equivariant/wigner.py)
is

    D(Rz(a) Ry(b) Rz(g)) = Dz(a) @ J @ Dz(b) @ J.T @ Dz(g),   J = D(Rx(-pi/2))

which this script verifies against direct numerical fits for random rotations
before writing ``singa_tpu/equivariant/jd.npz``.

Run: python tools/gen_jd.py [--lmax 11]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from singa_tpu.equivariant.sh import fit_wigner_d, rot_x, rot_y, rot_z  # noqa: E402


def z_block(l: int, angle: float) -> np.ndarray:
    """D_l(Rz(angle)) in the real basis: (m, -m) pairs rotate by m*angle."""
    n = 2 * l + 1
    D = np.zeros((n, n))
    D[l, l] = 1.0
    for m in range(1, l + 1):
        c, s = np.cos(m * angle), np.sin(m * angle)
        # basis order within block: index l+m is the cos (m>0) component,
        # index l-m the sin (-m) component.
        D[l + m, l + m] = c
        D[l + m, l - m] = -s
        D[l - m, l + m] = s
        D[l - m, l - m] = c
    return D


def euler_zyz(R: np.ndarray):
    beta = np.arccos(np.clip(R[2, 2], -1.0, 1.0))
    if abs(np.sin(beta)) < 1e-9:
        return np.arctan2(R[1, 0], R[0, 0]), beta, 0.0
    alpha = np.arctan2(R[1, 2], R[0, 2])
    gamma = np.arctan2(R[2, 1], -R[2, 0])
    return alpha, beta, gamma


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lmax", type=int, default=11)
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "..", "singa_tpu", "equivariant", "jd.npz"),
    )
    args = ap.parse_args()
    lmax = args.lmax

    J = fit_wigner_d(lmax, rot_x(-np.pi / 2.0))

    # sanity 1: z-block formula matches numeric fit for Rz
    for ang in (0.3, -1.2):
        fit = fit_wigner_d(lmax, rot_z(ang), seed=1)
        for l in range(lmax + 1):
            err = np.abs(z_block(l, ang) - fit[l]).max()
            assert err < 1e-8, (l, err)

    # sanity 2: Euler factorisation reconstructs D(R) for random rotations
    rng = np.random.default_rng(7)
    worst = 0.0
    for trial in range(6):
        A = rng.normal(size=(3, 3))
        Q, _ = np.linalg.qr(A)
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1.0
        a, b, g = euler_zyz(Q)
        R_rec = rot_z(a) @ rot_y(b) @ rot_z(g)
        assert np.abs(R_rec - Q).max() < 1e-10
        direct = fit_wigner_d(lmax, Q, seed=2 + trial)
        for l in range(lmax + 1):
            D = z_block(l, a) @ J[l] @ z_block(l, b) @ J[l].T @ z_block(l, g)
            err = np.abs(D - direct[l]).max()
            worst = max(worst, err)
            assert err < 1e-7, (trial, l, err)

    np.savez(
        args.out,
        **{f"J{l}": J[l] for l in range(lmax + 1)},
        lmax=np.int64(lmax),
    )
    print(f"wrote {os.path.abspath(args.out)} (lmax={lmax}, worst recon err {worst:.2e})")


if __name__ == "__main__":
    main()
