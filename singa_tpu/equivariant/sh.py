"""Real spherical harmonics, evaluated with stable normalised recurrences.

Self-contained replacement for the slices of e3nn the reference leans on
(/root/reference/model/EF_layers.py:19-20 imports o3 grids; model/Jd.pt ships
precomputed e3nn Wigner data). Everything here is derived from scratch:

* basis: standard real spherical harmonics, **z-up**, Condon-Shortley phase
  excluded; block ``l`` is ordered ``m = -l..l`` so index ``l^2 + (m + l)``.
* normalisation: orthonormal on the sphere (integral of Y^2 over S^2 = 1).

Used offline (float64 numpy) to generate the constant ``J = D(Rx(-pi/2))``
blocks (tools/gen_jd.py) and the S2 grid transform matrices; the training hot
path only consumes the resulting small constant matrices.
"""
from __future__ import annotations

import numpy as np


def num_coeffs(lmax: int) -> int:
    return (lmax + 1) ** 2


def real_sph_harm(lmax: int, xyz: np.ndarray) -> np.ndarray:
    """Evaluate all real SH up to ``lmax`` at unit vectors ``xyz [..., 3]``.

    Returns ``[..., (lmax+1)^2]`` float64. Input need not be normalised.
    """
    xyz = np.asarray(xyz, dtype=np.float64)
    shape = xyz.shape[:-1]
    v = xyz.reshape(-1, 3)
    norm = np.linalg.norm(v, axis=-1, keepdims=True)
    v = v / np.where(norm > 0, norm, 1.0)
    x, y, z = v[:, 0], v[:, 1], v[:, 2]

    ct = z  # cos(theta)
    st = np.sqrt(np.maximum(1.0 - z * z, 0.0))  # sin(theta) >= 0
    # azimuth: cos(m*phi), sin(m*phi) via Chebyshev-style recurrence on
    # (st*cos(phi), st*sin(phi)) to avoid dividing by st at the poles.
    phi = np.arctan2(y, x)

    n = v.shape[0]
    # P[l][m] = fully-normalised associated Legendre (no Condon-Shortley)
    P = np.zeros((lmax + 1, lmax + 1, n))
    P[0, 0] = np.sqrt(1.0 / (4.0 * np.pi))
    for m in range(1, lmax + 1):
        P[m, m] = np.sqrt((2 * m + 1) / (2.0 * m)) * st * P[m - 1, m - 1]
    for m in range(0, lmax):
        P[m + 1, m] = np.sqrt(2 * m + 3.0) * ct * P[m, m]
    for m in range(0, lmax + 1):
        for l in range(m + 2, lmax + 1):
            a = np.sqrt((4.0 * l * l - 1.0) / (l * l - m * m))
            b = np.sqrt(((l - 1.0) ** 2 - m * m) / (4.0 * (l - 1.0) ** 2 - 1.0))
            P[l, m] = a * (ct * P[l - 1, m] - b * P[l - 2, m])

    out = np.zeros((n, num_coeffs(lmax)))
    sqrt2 = np.sqrt(2.0)
    for l in range(lmax + 1):
        base = l * l + l  # index of m = 0
        out[:, base] = P[l, 0]
        for m in range(1, l + 1):
            cm = np.cos(m * phi)
            sm = np.sin(m * phi)
            out[:, base + m] = sqrt2 * P[l, m] * cm
            out[:, base - m] = sqrt2 * P[l, m] * sm
    return out.reshape(*shape, num_coeffs(lmax))


def fit_wigner_d(lmax: int, rot: np.ndarray, num_samples: int = 4096, seed: int = 0):
    """Numerically fit the real-SH rotation blocks D_l(rot) by least squares.

    D is defined by the homomorphic action ``Y(R x) = D(R) Y(x)``; solving
    ``Y_l(x) @ D_l^T = Y_l(R x)`` over random unit samples recovers each
    block to ~1e-12. Offline use only (constant generation & tests).
    """
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(num_samples, 3))
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    Y = real_sph_harm(lmax, x)
    Yr = real_sph_harm(lmax, x @ np.asarray(rot, dtype=np.float64).T)
    blocks = []
    for l in range(lmax + 1):
        s = l * l
        e = (l + 1) ** 2
        Dt, *_ = np.linalg.lstsq(Y[:, s:e], Yr[:, s:e], rcond=None)
        blocks.append(Dt.T)
    return blocks


def rot_x(t: float) -> np.ndarray:
    c, s = np.cos(t), np.sin(t)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], dtype=np.float64)


def rot_y(t: float) -> np.ndarray:
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float64)


def rot_z(t: float) -> np.ndarray:
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float64)
