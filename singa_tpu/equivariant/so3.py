"""SO(3) feature layout, coefficient bookkeeping and rotations.

An equivariant feature is a plain array ``[N, num_coeffs(lmax), C]`` in
*l-primary* order (block ``l`` occupies ``l^2 .. l^2+2l``, within-block order
``m = -l..l``). This replaces the reference's SO3_Embedding class and its
permutation-matrix ``to_m`` einsums (/root/reference/model/EF_layers.py:273-469,
1413-1552) with static gather indices.

Truncated layouts (edge frame, ``|m| <= mmax``) drop the high-m columns of
every block; ``CoefficientMapping`` precomputes all index arrays at trace time
as numpy constants.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from singa_tpu.equivariant.wigner import edge_rotation, wigner_blocks


def num_coeffs(lmax: int) -> int:
    return (lmax + 1) ** 2


def num_coeffs_trunc(lmax: int, mmax: int) -> int:
    return sum(2 * min(l, mmax) + 1 for l in range(lmax + 1))


@functools.lru_cache(maxsize=None)
class CoefficientMapping:
    """Static index bookkeeping for one (lmax, mmax) resolution.

    Layouts:
      * full l-primary: ``(lmax+1)^2`` coeffs, per-l blocks of ``m=-l..l``.
      * truncated l-primary: per-l blocks of ``m=-mm..mm`` with
        ``mm = min(l, mmax)``; the rotated edge-frame layout.
      * m-primary (on truncated): ``m=0`` coeffs for all l, then for each
        ``m=1..mmax`` the cos (+m) coeffs for ``l=m..lmax`` followed by the
        sin (-m) coeffs — exactly the blocking the SO(2) convolutions need
        (cf. reference EF_layers.py:807-875).
    """

    def __init__(self, lmax: int, mmax: int):
        self.lmax = lmax
        self.mmax = mmax
        self.n_full = num_coeffs(lmax)
        self.n_trunc = num_coeffs_trunc(lmax, mmax)

        # offsets of each l block in the truncated l-primary layout
        self.trunc_offset = []
        off = 0
        for l in range(lmax + 1):
            self.trunc_offset.append(off)
            off += 2 * min(l, mmax) + 1

        def t_idx(l: int, m: int) -> int:
            mm = min(l, mmax)
            assert -mm <= m <= mm
            return self.trunc_offset[l] + (m + mm)

        # m-primary permutation over the truncated layout
        perm = []
        self.m_size = []
        for l in range(lmax + 1):
            perm.append(t_idx(l, 0))
        self.m_size.append(lmax + 1)
        for m in range(1, mmax + 1):
            ls = list(range(m, lmax + 1))
            self.m_size.append(len(ls))
            for l in ls:  # cos (+m) part
                perm.append(t_idx(l, m))
            for l in ls:  # sin (-m) part
                perm.append(t_idx(l, -m))
        self.l_to_m = np.asarray(perm, dtype=np.int32)
        inv = np.zeros_like(self.l_to_m)
        inv[self.l_to_m] = np.arange(self.n_trunc, dtype=np.int32)
        self.m_to_l = inv

        # m=0 coefficient positions in the truncated l-primary layout
        self.m0_trunc = np.asarray(
            [t_idx(l, 0) for l in range(lmax + 1)], dtype=np.int32
        )
        # degree of every coefficient (full / truncated layouts)
        self.l_of_full = np.asarray(
            [l for l in range(lmax + 1) for _ in range(2 * l + 1)], dtype=np.int32
        )
        self.l_of_trunc = np.asarray(
            [l for l in range(lmax + 1) for _ in range(2 * min(l, mmax) + 1)],
            dtype=np.int32,
        )
        # rescale applied when rotating back with truncated m (reference
        # EF_layers.py:1530-1549): sqrt((2l+1)/(2mmax+1)) for l > mmax.
        scale = np.ones(lmax + 1)
        for l in range(lmax + 1):
            if l > mmax:
                scale[l] = np.sqrt((2 * l + 1) / (2 * mmax + 1))
        self.rotate_inv_rescale = scale[self.l_of_full].astype(np.float32)

    def to_m_primary(self, x: jax.Array) -> jax.Array:
        """[N, n_trunc, C] l-primary -> m-primary."""
        return jnp.take(x, self.l_to_m, axis=-2)

    def to_l_primary(self, x: jax.Array) -> jax.Array:
        """[N, n_trunc, C] m-primary -> l-primary."""
        return jnp.take(x, self.m_to_l, axis=-2)


@functools.lru_cache(maxsize=None)
class _PaddedLayout:
    """Gather indices between l-primary layouts and the (L, K, N) padded
    block layout used for single-einsum rotations. K = 2*mmax+1 row slots,
    N = 2*lmax+1 column slots; invalid slots map to a trailing zero column."""

    def __init__(self, lmax: int, mmax: int):
        L = lmax + 1
        K = 2 * mmax + 1
        N = 2 * lmax + 1
        mapping = CoefficientMapping(lmax, mmax)
        n_full = mapping.n_full
        n_trunc = mapping.n_trunc

        # full l-primary -> [L, N] slots (invalid -> n_full sentinel)
        full_to_pad = np.full((L, N), n_full, np.int32)
        for l in range(L):
            for n in range(2 * l + 1):
                full_to_pad[l, n] = l * l + n
        # [L, N] padded -> full gather (each valid coeff appears once)
        pad_to_full = np.zeros(n_full, np.int32)
        for l in range(L):
            for n in range(2 * l + 1):
                pad_to_full[l * l + n] = l * N + n

        # truncated l-primary -> [L, K] slots
        trunc_to_pad = np.full((L, K), n_trunc, np.int32)
        for l in range(L):
            mm = min(l, mmax)
            for k in range(2 * mm + 1):
                trunc_to_pad[l, k] = mapping.trunc_offset[l] + k
        pad_to_trunc = np.zeros(n_trunc, np.int32)
        for l in range(L):
            mm = min(l, mmax)
            for k in range(2 * mm + 1):
                pad_to_trunc[mapping.trunc_offset[l] + k] = l * K + k

        self.L, self.K, self.N = L, K, N
        self.full_to_pad = full_to_pad.reshape(-1)
        self.pad_to_full = pad_to_full
        self.trunc_to_pad = trunc_to_pad.reshape(-1)
        self.pad_to_trunc = pad_to_trunc
        # rotate_inv rescale per full coefficient
        self.inv_rescale = mapping.rotate_inv_rescale


def pad_wigner_blocks(blocks: list[jax.Array], lmax: int, mmax: int) -> jax.Array:
    """Stack per-l truncated blocks into one ``[E, L, K, N]`` tensor."""
    K = 2 * mmax + 1
    N = 2 * lmax + 1
    padded = []
    for l, b in enumerate(blocks):
        mm = min(l, mmax)
        b = jnp.pad(b, ((0, 0), (0, K - (2 * mm + 1)), (0, N - (2 * l + 1))))
        padded.append(b)
    return jnp.stack(padded, axis=1)


def edge_wigner(edge_vec: jax.Array, lmax: int, mmax: int, dtype=jnp.float32):
    """Padded Wigner tensor ``[E, L, K, N]`` for edge-aligned frames."""
    rot = edge_rotation(edge_vec.astype(dtype))
    blocks = wigner_blocks(rot, lmax, mmax, dtype=dtype)
    return pad_wigner_blocks(blocks, lmax, mmax)


class EdgeFrame(NamedTuple):
    """Per-edge frame as (azimuth, polar) angles: the frame rotation is
    ``R = Ry(-beta) Rz(-phi)``, which maps the edge direction onto +z with
    ZERO residual z-rotation (gamma == 0 in the ZYZ factorisation).

    Replaces the padded per-edge Wigner tensor of the round-1 design: the
    Wigner application factorises as ``D = J Z(-beta) J^T Z(-phi)`` where
    ``Z`` is an elementwise (cos, sin, flip) combine and ``J`` is one
    CONSTANT dense matrix shared by all edges — two clean MXU matmuls
    instead of per-(edge, l) micro-batched einsums (which ran at ~0 FLOPs
    for 10 ms each in the round-2 profile). The azimuthal gauge differs
    from the round-1 aux-vector frames; the architecture is gauge-covariant
    (the SO(2) convolutions commute with Z rotations), so this changes the
    model only through S2-grid aliasing, below test tolerance.
    """

    phi: jax.Array  # [E]
    beta: jax.Array  # [E]


@functools.lru_cache(maxsize=None)
class _JLayout:
    """Constants for J-factorised rotations at one (lmax, mmax)."""

    def __init__(self, lmax: int, mmax: int):
        from singa_tpu.equivariant.wigner import _load_jd

        jd = _load_jd()
        n_full = num_coeffs(lmax)
        J = np.zeros((n_full, n_full), np.float32)
        for l in range(lmax + 1):
            s = l * l
            J[s : s + 2 * l + 1, s : s + 2 * l + 1] = jd[l]
        self.J = J
        keep = []
        for l in range(lmax + 1):
            mm = min(l, mmax)
            for m in range(-mm, mm + 1):
                keep.append(l * l + (m + l))
        self.J_kept = J[np.asarray(keep, np.int32)]  # [n_trunc, n_full]
        self.m_of = np.concatenate(
            [np.arange(-l, l + 1) for l in range(lmax + 1)]
        ).astype(np.float32)
        self.flip = np.concatenate(
            [l * l + np.arange(2 * l, -1, -1) for l in range(lmax + 1)]
        ).astype(np.int32)
        self.inv_rescale = CoefficientMapping(lmax, mmax).rotate_inv_rescale
        # m-primary variant: the truncated-layout permutation folded into the
        # constant matrix, so the edge-frame chain never runs a per-edge
        # coefficient gather (to_m_primary cost ~56 ms/step in round 2)
        self.J_kept_m = self.J_kept[CoefficientMapping(lmax, mmax).l_to_m]

        # Gather-free z-rotations: fold the m-flip permutation F into the
        # constant matrices. For any constant M and z-rotation
        # z(th, u) = c(th) * u - s(th) * (F u)  (c/s diagonal in m),
        #   M z(th, u) = M (c*u) + (M F)(s*u)
        # because s is odd in m (s_flip = -s) and F is an involution. The
        # two halves stack along the CONTRACTION axis, and since K=n_full
        # already lane-pads to 128 on the MXU, the stacked K=2*n_full matmul
        # executes at the same cost — the per-edge flip gathers (the round-3
        # profile's hottest data-formatting entries) vanish for free.
        F = np.zeros_like(J)
        F[np.arange(n_full), self.flip] = 1.0
        self.rot_stage1 = np.concatenate([J.T, J.T @ F], axis=1)  # [n, 2n]
        self.rot_stage2 = np.concatenate(
            [self.J_kept, self.J_kept @ F], axis=1
        )  # [n_trunc, 2n]
        self.rot_stage2_m = np.concatenate(
            [self.J_kept_m, self.J_kept_m @ F], axis=1
        )
        # rotate_inv needs both v = J w and F v in one pass (w = z(beta, u)):
        # [[J, JF], [FJ, FJF]] @ [c*u; s*u] -> [v; Fv]
        JF = J @ F
        self.inv_stage2 = np.block(
            [[J, JF], [F @ J, F @ JF]]
        )  # [2n, 2n]


def edge_frame(edge_vec: jax.Array, eps: float = 1e-8) -> EdgeFrame:
    """Deterministic gamma-free edge frame angles from edge vectors [E, 3]."""
    v = edge_vec.astype(jnp.float32)
    n = jnp.linalg.norm(v, axis=-1)
    vn = v / jnp.maximum(n, eps)[:, None]
    beta = jnp.arccos(jnp.clip(vn[:, 2], -1.0, 1.0))
    phi = jnp.where(n > eps, jnp.arctan2(vn[:, 1], vn[:, 0]), 0.0)
    return EdgeFrame(phi=phi, beta=beta)


def _z_parts(theta: jax.Array, t: jax.Array, m_of) -> jax.Array:
    """[c(theta)*t ; s(theta)*t] stacked on the coefficient axis — the input
    to a folded-F constant matmul (see _JLayout). No gather."""
    cm = jnp.cos(m_of[None] * theta[:, None]).astype(t.dtype)
    sm = jnp.sin(m_of[None] * theta[:, None]).astype(t.dtype)
    return jnp.concatenate([cm[..., None] * t, sm[..., None] * t], axis=1)


def rotate(
    frame, x: jax.Array, lmax: int, mmax: int, m_primary: bool = False
) -> jax.Array:
    """Rotate full l-primary features into the (truncated) edge frame.

    ``frame``: an EdgeFrame (J-factorised fast path) or a padded Wigner
    tensor ``[E, L, K, N]`` (explicit path, tests). ``x``:
    ``[E, (lmax+1)^2, C]`` -> ``[E, n_trunc, C]``. With ``m_primary`` the
    output layout permutation is folded into the constant matrix (free).
    """
    if isinstance(frame, EdgeFrame):
        lay = _JLayout(lmax, mmax)
        dt = x.dtype
        m_of = jnp.asarray(lay.m_of)
        # gather-free z-rotations: both halves of M z(th, u) = M(c*u) +
        # (MF)(s*u) ride ONE matmul with the stacked [M | MF] constant
        # (K doubles 49 -> 98 but stays inside the 128-lane MXU pad; see
        # _JLayout.rot_stage1)
        ab = _z_parts(-frame.phi, x, m_of)
        t = jnp.einsum("ij,ejc->eic", jnp.asarray(lay.rot_stage1, dt), ab)
        ab = _z_parts(-frame.beta, t, m_of)
        jk2 = lay.rot_stage2_m if m_primary else lay.rot_stage2
        return jnp.einsum("kj,ejc->ekc", jnp.asarray(jk2, dt), ab)
    if m_primary:
        out = rotate(frame, x, lmax, mmax)
        return CoefficientMapping(lmax, mmax).to_m_primary(out)
    wigner = frame
    lay = _PaddedLayout(lmax, mmax)
    E, _, C = x.shape
    x_pad = jnp.concatenate([x, jnp.zeros((E, 1, C), x.dtype)], axis=1)
    xg = jnp.take(x_pad, lay.full_to_pad, axis=1).reshape(E, lay.L, lay.N, C)
    out = jnp.einsum("elkn,elnc->elkc", wigner.astype(x.dtype), xg)
    out = out.reshape(E, lay.L * lay.K, C)
    return jnp.take(out, lay.pad_to_trunc, axis=1)


def rotate_inv(
    frame,
    x: jax.Array,
    lmax: int,
    mmax: int,
    rescale: bool = True,
    m_primary: bool = False,
) -> jax.Array:
    """Rotate truncated edge-frame features back: ``[E, n_trunc, C] ->
    [E, full, C]`` via D^T, with the reference's m-truncation rescale
    (EF_layers.py:1530-1549). ``m_primary``: input is m-primary (the layout
    permutation is folded into the constant matrix)."""
    if isinstance(frame, EdgeFrame):
        lay = _JLayout(lmax, mmax)
        dt = x.dtype
        n_full = lay.J.shape[0]
        m_of = jnp.asarray(lay.m_of)
        jk = lay.J_kept_m if m_primary else lay.J_kept
        u = jnp.einsum("kj,ekc->ejc", jnp.asarray(jk, dt), x)
        # one stacked matmul yields BOTH v = J z(beta, u) and F v, so the
        # final z(phi) needs no gather either (see _JLayout.inv_stage2)
        ab = _z_parts(frame.beta, u, m_of)
        vv = jnp.einsum("ij,ejc->eic", jnp.asarray(lay.inv_stage2, dt), ab)
        v, fv = vv[:, :n_full], vv[:, n_full:]
        cm = jnp.cos(m_of[None] * frame.phi[:, None]).astype(dt)
        sm = jnp.sin(m_of[None] * frame.phi[:, None]).astype(dt)
        t = cm[..., None] * v - sm[..., None] * fv
        if rescale:
            t = t * jnp.asarray(lay.inv_rescale, dt)[None, :, None]
        return t
    if m_primary:
        x = CoefficientMapping(lmax, mmax).to_l_primary(x)
    wigner = frame
    lay = _PaddedLayout(lmax, mmax)
    E, _, C = x.shape
    x_pad = jnp.concatenate([x, jnp.zeros((E, 1, C), x.dtype)], axis=1)
    xg = jnp.take(x_pad, lay.trunc_to_pad, axis=1).reshape(E, lay.L, lay.K, C)
    out = jnp.einsum("elkn,elkc->elnc", wigner.astype(x.dtype), xg)
    out = out.reshape(E, lay.L * lay.N, C)
    out = jnp.take(out, lay.pad_to_full, axis=1)
    if rescale:
        out = out * jnp.asarray(lay.inv_rescale, x.dtype)[None, :, None]
    return out


def node_wigner(pos_like_rot: jax.Array, lmax: int, mmax: int):
    """Alias of wigner_blocks for explicit rotations (tests, augmentation)."""
    return wigner_blocks(pos_like_rot, lmax, mmax)


def rotate_full(rot: jax.Array, x: jax.Array, lmax: int) -> jax.Array:
    """Apply an explicit global rotation to full l-primary features (test helper)."""
    blocks = wigner_blocks(rot, lmax, lmax, dtype=x.dtype)
    outs = []
    for l in range(lmax + 1):
        s = l * l
        xl = jax.lax.slice_in_dim(x, s, s + 2 * l + 1, axis=-2)
        outs.append(jnp.einsum("ekn,enc->ekc", blocks[l], xl))
    return jnp.concatenate(outs, axis=-2)
