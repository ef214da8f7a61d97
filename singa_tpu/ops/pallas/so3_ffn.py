"""Fully-fused equivariant feed-forward block as one Pallas TPU kernel.

Fuses the whole FFN of a TransBlock (reference FeedForwardNetwork,
EF_layers.py:152-270, use_sep_s2_act path):

    gate = silu(x[l=0] @ Wg + bg)
    h    = SO3Linear1(x)            # per-degree [C -> H], bias on l=0
    mid  = from_grid(silu(to_grid(h)))   with row0 := gate
    y    = SO3Linear2(mid)          # per-degree [H -> C], bias on l=0

into a single kernel (custom VJP, backward also one kernel). Why: at the
flagship shapes the intermediates h/mid are [N, 49, 512] (784 MB bf16 as
(8,128) tiles) and the grid tensor [N, 512, G] is ~3 GB — XLA materialises
them in HBM in forward, backward AND remat recompute; they were ~30% of the
round-2 step and made every remat policy except full-recompute OOM. Here the
hidden dimension is processed in 128-channel chunks that never leave VMEM;
HBM traffic is just x in / y out plus the small weights.

Layout: coefficients ride in an L-PADDED layout — each degree's (2l+1) rows
padded to a multiple of 8 (49 -> 80 for lmax 6) with matching zero columns
in the grid matrices. Mosaic can only merge leading vector dims when they
are tile-aligned ("unsupported shape cast" otherwise), and the padded
blocks make every per-degree [TN, blk, C] -> [TN*blk, C] merge legal while
keeping the per-degree matmuls large. Zero-padded rows/columns contribute
exact zeros through every term, forward and backward.

Weight gradients are accumulated in VMEM across the node-tile grid (TPU
grids execute sequentially; accumulator outputs use a constant block index
with a first-step zero init). Ragged node counts are zero-padded by the
wrapper for the same reason.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sigmoid(x):
    # tanh-form sigmoid: on this VPU the tanh lowering measured faster than
    # the logistic lowering for the [TN, HC, G] grid activation (the kernel's
    # dominant VPU cost, ~33 ms/step standalone at flagship shapes)
    return 0.5 * (jnp.tanh(0.5 * x) + 1.0)


def _silu(x):
    return x * _sigmoid(x)


def _silu_grad(x):
    s = _sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


@functools.lru_cache(maxsize=None)
def _pad_layout(lmax: int):
    """[(src_start, src_end, dst_start, blk)] per degree + total padded rows."""
    out = []
    off = 0
    for l in range(lmax + 1):
        sz = 2 * l + 1
        blk = ((sz + 7) // 8) * 8
        out.append((l * l, (l + 1) * (l + 1), off, blk))
        off += blk
    return tuple(out), off


def _row0(shape, axis=1):
    return jax.lax.broadcasted_iota(jnp.int32, shape, axis) == 0


def _to_g(h, mat):
    """[TN, P, HC] x [G, P] -> [TN, HC, G].

    Explicit last-two transpose + leading merge, then ONE [TN*HC, P] x [P, G]
    matmul: the direct dot_general with a sublane contraction over P lowers
    to a pathologically slow Mosaic path (~200x in isolation, round-3 probe
    tools/bench_ffn_parts.py)."""
    TN, P, HC = h.shape
    ht = h.transpose(0, 2, 1).reshape(TN * HC, P)
    y = jax.lax.dot_general(
        ht, mat.astype(h.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TN*HC, G]
    return y.reshape(TN, HC, -1)


def _from_g(a, mat):
    """[TN, HC, G] x [G, P] -> [TN, P, HC] (merged matmul, see _to_g)."""
    TN, HC, G = a.shape
    y = jax.lax.dot_general(
        a.reshape(TN * HC, G), mat.astype(a.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TN*HC, P]
    return y.reshape(TN, HC, -1).transpose(0, 2, 1)


def _mm(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _blk_mm(xl, w):
    """[TN, blk, K] x [K, F] -> [TN, blk, F] via an aligned merge."""
    TN, blk, K = xl.shape
    y = _mm(xl.reshape(TN * blk, K), w)
    return y.reshape(TN, blk, -1)


def _blk_outer(a, b):
    """[TN, blk, A] x [TN, blk, B] -> [A, B] (merge + single contraction)."""
    TN, blk, A = a.shape
    return jax.lax.dot_general(
        a.reshape(TN * blk, A), b.reshape(TN * blk, -1),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )


def _ffn_fwd_kernel(
    lmax, n_chunks, x_ref, w1_ref, b1_ref, wg_ref, bg_ref, w2_ref, b2_ref,
    tg_ref, fg_ref, y_ref,
):
    x = x_ref[:]  # [TN, P, C] l-padded
    dt = x.dtype
    TN = x.shape[0]
    H = w1_ref.shape[2]
    HC = H // n_chunks
    blocks, _ = _pad_layout(lmax)
    Co = w2_ref.shape[2]

    g0 = _mm(x[:, 0, :], wg_ref[:].astype(dt)) + bg_ref[:]  # [TN, H] f32
    # lin1 ONCE at full width (K=C per degree is already MXU-starved; running
    # it 7 x n_chunks times quadrupled the small-matmul count), then the grid
    # chain in HC chunks, collecting mid so lin2 runs once with K=H
    h_full = jnp.concatenate(
        [
            _blk_mm(x[:, ds : ds + blk, :], w1_ref[l].astype(dt))
            for l, (_, _, ds, blk) in enumerate(blocks)
        ],
        axis=1,
    )  # [TN, P, H] f32
    h_full = jnp.where(_row0(h_full.shape), h_full + b1_ref[:][None, None, :], h_full)
    h_full = h_full.astype(dt)
    gate = _silu(g0).astype(dt)  # [TN, H]
    mid_parts = []
    for hc in range(n_chunks):
        sl = slice(hc * HC, (hc + 1) * HC)
        grid = _to_g(h_full[:, :, sl], tg_ref[:])  # [TN, HC, G] f32
        # f32 sigmoid: Mosaic mis-lowers bf16 `logistic` (f32 scalar
        # broadcast into a bf16 vector fails MLIR verification)
        act = _silu(grid).astype(dt)
        mid = _from_g(act, fg_ref[:])  # [TN, P, HC] f32
        # slice THEN expand_dims: `gate[:, None, sl]` falls off jnp's
        # basic-indexing fast path and lowers to a gather Mosaic rejects
        g_sl = jnp.expand_dims(gate[:, sl], 1)
        mid = jnp.where(_row0(mid.shape), g_sl, mid).astype(dt)
        mid_parts.append(mid)
    mid_full = jnp.concatenate(mid_parts, axis=2)  # [TN, P, H]
    y = jnp.concatenate(
        [
            _blk_mm(mid_full[:, ds : ds + blk, :], w2_ref[l].astype(dt))
            for l, (_, _, ds, blk) in enumerate(blocks)
        ],
        axis=1,
    )
    y = jnp.where(_row0(y.shape), y + b2_ref[:][None, None, :], y)
    y_ref[:] = y.astype(y_ref.dtype)


def _ffn_bwd_kernel(
    lmax, n_chunks, x_ref, dy_ref, w1_ref, b1_ref, wg_ref, bg_ref, w2_ref,
    w1t_ref, w2t_ref, wgt_ref, tg_ref, fg_ref,
    dx_ref, dw1_ref, db1_ref, dwg_ref, dbg_ref, dw2_ref, db2_ref,
):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dwg_ref[:] = jnp.zeros_like(dwg_ref)
        dbg_ref[:] = jnp.zeros_like(dbg_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    x = x_ref[:]  # [TN, P, C]
    dy = dy_ref[:].astype(jnp.float32)
    dt = x.dtype
    TN = x.shape[0]
    C = x.shape[2]
    H = w1_ref.shape[2]
    HC = H // n_chunks
    blocks, _ = _pad_layout(lmax)

    x0 = x[:, 0, :]
    g0 = _mm(x0, wg_ref[:].astype(dt)) + bg_ref[:]  # [TN, H] f32
    db2_ref[:] += jnp.sum(dy[:, 0, :], axis=0)
    # ---- recompute lin1 ONCE at full width (see fwd kernel) ----
    h_full = jnp.concatenate(
        [
            _blk_mm(x[:, ds : ds + blk, :], w1_ref[l].astype(dt))
            for l, (_, _, ds, blk) in enumerate(blocks)
        ],
        axis=1,
    )
    h_full = jnp.where(_row0(h_full.shape), h_full + b1_ref[:][None, None, :], h_full)
    h_full = h_full.astype(dt)
    # ---- dmid needs only dy (transposed weights are trace-time operands) ----
    dmid_full = jnp.concatenate(
        [
            _blk_mm(dy[:, ds : ds + blk, :].astype(dt), w2t_ref[l].astype(dt))
            for l, (_, _, ds, blk) in enumerate(blocks)
        ],
        axis=1,
    )  # [TN, P, H] f32
    dg0 = _silu_grad(g0) * dmid_full[:, 0, :]
    dmid_full = jnp.where(_row0(dmid_full.shape), 0.0, dmid_full).astype(dt)
    gate = _silu(g0).astype(dt)
    # ---- grid chain per chunk: 4 grid matmuls, grid stays chunk-local ----
    mid_parts = []
    dh_parts = []
    for hc in range(n_chunks):
        sl = slice(hc * HC, (hc + 1) * HC)
        grid = _to_g(h_full[:, :, sl], tg_ref[:])  # [TN, HC, G] f32
        act = _silu(grid).astype(dt)  # f32 sigmoid: see fwd kernel note
        mid = _from_g(act, fg_ref[:])
        g_sl = jnp.expand_dims(gate[:, sl], 1)  # see fwd kernel note
        mid_parts.append(
            jnp.where(_row0(mid.shape), g_sl, mid).astype(dt)
        )
        dact = _to_g(dmid_full[:, :, sl], fg_ref[:])  # [TN, HC, G]
        dgrid = (_silu_grad(grid) * dact).astype(dt)
        dh_parts.append(_from_g(dgrid, tg_ref[:]))  # [TN, P, HC] f32
    mid_full = jnp.concatenate(mid_parts, axis=2)  # [TN, P, H]
    dh_full = jnp.concatenate(dh_parts, axis=2)  # [TN, P, H] f32
    db1_ref[:] += jnp.sum(dh_full[:, 0, :], axis=0)
    # ---- weight grads + dx at full width (K = TN*blk / H) ----
    dhc = dh_full.astype(dt)
    dx_parts = []
    for l, (_, _, ds, blk) in enumerate(blocks):
        dyl = dy[:, ds : ds + blk, :].astype(dt)
        dw2_ref[l] += _blk_outer(mid_full[:, ds : ds + blk, :], dyl)
        dhl = dhc[:, ds : ds + blk, :]
        dw1_ref[l] += _blk_outer(x[:, ds : ds + blk, :], dhl)
        dx_parts.append(_blk_mm(dhl, w1t_ref[l].astype(dt)))
    # ---- gate path ----
    dg0 = dg0.astype(dt)
    dwg_ref[:] += jax.lax.dot_general(
        x0, dg0, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dbg_ref[:] += jnp.sum(dg0.astype(jnp.float32), axis=0)
    dx0 = _mm(dg0, wgt_ref[:].astype(dt))  # [TN, C]
    dx = jnp.concatenate(dx_parts, axis=1)
    dx = jnp.where(_row0(dx.shape), dx + dx0[:, None, :], dx)
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _tiles(n: int, bwd: bool = False) -> int:
    # sized against the 100 MB scoped-VMEM limit (CompilerParams below; the
    # 16 MB default forced TN=32/16 in round 2, leaving every matmul
    # instance M-starved on the MXU — raising the limit was worth ~2x).
    # Hardware-swept round 3: TN 128 fwd AND bwd with HC=128 chunks is the
    # plateau (bwd 128 measured 69.2 vs 68.4 graphs/s at 64 in the full
    # step; HC 256 a wash, attn-style bwd-tile halving a loss). Env
    # overrides kept for future sweeps.
    env = os.environ.get("SINGA_TPU_FFN_TN_BWD" if bwd else "SINGA_TPU_FFN_TN")
    cap = int(env) if env else 128
    return cap if n >= cap else max(8, n)


def _hc_chunk() -> int:
    return int(os.environ.get("SINGA_TPU_FFN_HC", "128"))


def _pad_coeffs(x, lmax):
    """[N, I, C] -> [N, P, C] l-padded (zero rows)."""
    blocks, _ = _pad_layout(lmax)
    parts = []
    for (s, e, _, blk) in blocks:
        seg = x[:, s:e, :]
        if blk > e - s:
            seg = jnp.pad(seg, ((0, 0), (0, blk - (e - s)), (0, 0)))
        parts.append(seg)
    return jnp.concatenate(parts, axis=1)


def _unpad_coeffs(y, lmax):
    blocks, _ = _pad_layout(lmax)
    return jnp.concatenate(
        [y[:, ds : ds + (e - s), :] for (s, e, ds, _) in blocks], axis=1
    )


def pad_grid_mat(mat, lmax):
    """[G, I] numpy -> [G, P] with zero columns on padded rows. Must be
    called host-side (constants), before the jitted region."""
    blocks, P = _pad_layout(lmax)
    out = np.zeros((mat.shape[0], P), np.float32)
    mat = np.asarray(mat, np.float32)
    for (s, e, ds, _) in blocks:
        out[:, ds : ds + (e - s)] = mat[:, s:e]
    return out


def _pad_n(x, tn):
    """Zero-pad the node axis to a tile multiple: ragged final blocks have
    UNDEFINED padding content, which the weight-grad reductions would sum;
    zero rows contribute exactly zero through every term instead."""
    n = x.shape[0]
    pad = (-n) % tn
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def so3_ffn_fused(x, w1, b1, wg, bg, w2, b2, tgp, fgp, lmax, interpret=False):
    """x [N, I, C]; w1 [L, C, H]; b1 [H]; wg [C, H]; bg [H]; w2 [L, H, Co];
    b2 [Co]; tgp/fgp [G, P] L-PADDED grid mats (pad_grid_mat). Returns
    y [N, I, Co]."""
    n0 = x.shape[0]
    tn = _tiles(n0)
    xp = _pad_n(_pad_coeffs(x, lmax), tn)
    n, p, c = xp.shape
    h = w1.shape[2]
    n_chunks = max(1, h // _hc_chunk())
    grid_dims = (n // tn,)
    full = lambda a: pl.BlockSpec(a.shape, lambda m: (0,) * a.ndim, memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((tn, p, c), lambda m: (m, 0, 0), memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        functools.partial(_ffn_fwd_kernel, lmax, n_chunks),
        out_shape=jax.ShapeDtypeStruct((n, p, w2.shape[2]), x.dtype),
        grid=grid_dims,
        in_specs=[xspec] + [full(a) for a in (w1, b1, wg, bg, w2, b2, tgp, fgp)],
        out_specs=pl.BlockSpec((tn, p, w2.shape[2]), lambda m: (m, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, w1, b1, wg, bg, w2, b2, tgp, fgp)
    return _unpad_coeffs(y[:n0], lmax)


def _fwd(x, w1, b1, wg, bg, w2, b2, tg, fg, lmax, interpret):
    y = so3_ffn_fused(x, w1, b1, wg, bg, w2, b2, tg, fg, lmax, interpret)
    return y, (x, w1, b1, wg, bg, w2, tg, fg)


def _bwd(lmax, interpret, res, dy):
    x, w1, b1, wg, bg, w2, tgp, fgp = res
    n0 = x.shape[0]
    tn = _tiles(n0, bwd=True)
    xp = _pad_n(_pad_coeffs(x, lmax), tn)
    dyp = _pad_n(_pad_coeffs(dy, lmax), tn)
    n, p, c = xp.shape
    h = w1.shape[2]
    n_chunks = max(1, h // _hc_chunk())
    grid_dims = (n // tn,)
    full = lambda a: pl.BlockSpec(a.shape, lambda m: (0,) * a.ndim, memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((tn, p, c), lambda m: (m, 0, 0), memory_space=pltpu.VMEM)
    acc = lambda shape: (
        jax.ShapeDtypeStruct(shape, jnp.float32),
        pl.BlockSpec(shape, lambda m: (0,) * len(shape), memory_space=pltpu.VMEM),
    )
    outs = [
        (jax.ShapeDtypeStruct(xp.shape, x.dtype),
         pl.BlockSpec((tn, p, c), lambda m: (m, 0, 0), memory_space=pltpu.VMEM)),
        acc(w1.shape), acc(b1.shape), acc(wg.shape), acc(bg.shape),
        acc(w2.shape), acc((w2.shape[2],)),
    ]
    w1t = jnp.swapaxes(w1, 1, 2)
    w2t = jnp.swapaxes(w2, 1, 2)
    wgt = wg.T
    dx, dw1, db1, dwg, dbg, dw2, db2 = pl.pallas_call(
        functools.partial(_ffn_bwd_kernel, lmax, n_chunks),
        out_shape=tuple(o[0] for o in outs),
        grid=grid_dims,
        in_specs=[xspec, xspec]
        + [full(a) for a in (w1, b1, wg, bg, w2, w1t, w2t, wgt, tgp, fgp)],
        out_specs=tuple(o[1] for o in outs),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, dyp, w1, b1, wg, bg, w2, w1t, w2t, wgt, tgp, fgp)
    cast = lambda g, pm: g.astype(pm.dtype)
    return (
        _unpad_coeffs(dx[:n0], lmax),
        cast(dw1, w1), cast(db1, b1), cast(dwg, wg), cast(dbg, bg),
        cast(dw2, w2), db2.astype(w2.dtype), None, None,
    )


so3_ffn_fused.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Fused GATE-activation FFN (reference use_gate_act, EF_layers.py:220-223 +
# GateActivation 1683-1733): lin1 -> per-degree sigmoid gates -> lin2, no
# grid transforms. Same VMEM rationale as the s2 kernel above: the [N, P, H]
# hidden is 686 MB bf16 per call at flagship shapes, and the XLA gate path
# OOM'd batch 32 by 150 MB purely on those intermediates (round-4 compile
# log). Here they never leave VMEM, forward or backward.
# ---------------------------------------------------------------------------


def _gate_ffn_fwd_kernel(
    lmax, x_ref, w1_ref, b1_ref, wg_ref, bg_ref, w2_ref, b2_ref, y_ref
):
    x = x_ref[:]  # [TN, P, C] l-padded
    dt = x.dtype
    H = w1_ref.shape[2]
    blocks, _ = _pad_layout(lmax)

    # gating scalars: [TN, lmax*H]; degree l (>=1) uses columns (l-1)*H:l*H
    g0 = _mm(x[:, 0, :], wg_ref[:].astype(dt)) + bg_ref[:]
    gates = _sigmoid(g0).astype(dt)

    outs = []
    for l, (_, _, ds, blk) in enumerate(blocks):
        h = _blk_mm(x[:, ds : ds + blk, :], w1_ref[l].astype(dt))  # [TN, blk, H] f32
        if l == 0:
            h = jnp.where(_row0(h.shape), _silu(h + b1_ref[:][None, None, :]), 0.0)
        else:
            h = h * jnp.expand_dims(gates[:, (l - 1) * H : l * H], 1)
        y = _blk_mm(h.astype(dt), w2_ref[l].astype(dt))
        outs.append(y)
    y = jnp.concatenate(outs, axis=1)
    y = jnp.where(_row0(y.shape), y + b2_ref[:][None, None, :], y)
    y_ref[:] = y.astype(y_ref.dtype)


def _gate_ffn_bwd_kernel(
    lmax, x_ref, dy_ref, w1_ref, b1_ref, wg_ref, bg_ref, w2_ref,
    w1t_ref, w2t_ref, wgt_ref,
    dx_ref, dw1_ref, db1_ref, dwg_ref, dbg_ref, dw2_ref, db2_ref,
):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dwg_ref[:] = jnp.zeros_like(dwg_ref)
        dbg_ref[:] = jnp.zeros_like(dbg_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    x = x_ref[:]  # [TN, P, C]
    dy = dy_ref[:].astype(jnp.float32)
    dt = x.dtype
    H = w1_ref.shape[2]
    blocks, _ = _pad_layout(lmax)

    x0 = x[:, 0, :]
    g0 = _mm(x0, wg_ref[:].astype(dt)) + bg_ref[:]  # [TN, lmax*H] f32
    gates_f32 = _sigmoid(g0)
    gates = gates_f32.astype(dt)
    db2_ref[:] += jnp.sum(dy[:, 0, :], axis=0)

    dg0_parts = []
    dx_parts = []
    for l, (_, _, ds, blk) in enumerate(blocks):
        xl = x[:, ds : ds + blk, :]
        dyl = dy[:, ds : ds + blk, :].astype(dt)
        h = _blk_mm(xl, w1_ref[l].astype(dt))  # [TN, blk, H] f32
        dmid = _blk_mm(dyl, w2t_ref[l].astype(dt))  # [TN, blk, H] f32
        if l == 0:
            hb = h + b1_ref[:][None, None, :]
            mid = jnp.where(_row0(h.shape), _silu(hb), 0.0).astype(dt)
            dh = jnp.where(_row0(h.shape), _silu_grad(hb) * dmid, 0.0)
        else:
            g_l = jnp.expand_dims(gates[:, (l - 1) * H : l * H], 1)
            mid = (h * g_l).astype(dt)
            dh = dmid * g_l
            # dgate_l = sum over coefficient rows of dmid * h (padded rows
            # are exact zeros through lin1)
            dg0_parts.append(jnp.sum(dmid * h, axis=1))  # [TN, H] f32
        dw2_ref[l] += _blk_outer(mid, dyl)
        dhc = dh.astype(dt)
        dw1_ref[l] += _blk_outer(xl, dhc)
        dx_parts.append(_blk_mm(dhc, w1t_ref[l].astype(dt)))
        if l == 0:
            db1_ref[:] += jnp.sum(dh[:, 0, :], axis=0)
    # gate path: dg0 = sigmoid'(g0) * dgates
    dgates = jnp.concatenate(dg0_parts, axis=1)  # [TN, lmax*H]
    dg0 = (gates_f32 * (1.0 - gates_f32) * dgates).astype(dt)
    dwg_ref[:] += jax.lax.dot_general(
        x0, dg0, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dbg_ref[:] += jnp.sum(dg0.astype(jnp.float32), axis=0)
    dx0 = _mm(dg0, wgt_ref[:].astype(dt))  # [TN, C]
    dx = jnp.concatenate(dx_parts, axis=1)
    dx = jnp.where(_row0(dx.shape), dx + dx0[:, None, :], dx)
    dx_ref[:] = dx.astype(dx_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def so3_gate_ffn_fused(x, w1, b1, wg, bg, w2, b2, lmax, interpret=False):
    """Gate-activation FFN as one Pallas kernel.

    x [N, I, C]; w1 [L, C, H]; b1 [H]; wg [C, lmax*H]; bg [lmax*H];
    w2 [L, H, Co]; b2 [Co]. Returns y [N, I, Co]. Matches the XLA gate path
    of FeedForwardNetwork (attention.py): the l=0 row is silu(lin1 + b1),
    degrees l>=1 are lin1 * sigmoid(gating[l-1]) — b1 reaches only the l=0
    row because add_l0 biases row 0 alone in the XLA form."""
    n0 = x.shape[0]
    tn = _tiles(n0)
    xp = _pad_n(_pad_coeffs(x, lmax), tn)
    n, p, c = xp.shape
    grid_dims = (n // tn,)
    full = lambda a: pl.BlockSpec(a.shape, lambda m: (0,) * a.ndim, memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((tn, p, c), lambda m: (m, 0, 0), memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        functools.partial(_gate_ffn_fwd_kernel, lmax),
        out_shape=jax.ShapeDtypeStruct((n, p, w2.shape[2]), x.dtype),
        grid=grid_dims,
        in_specs=[xspec] + [full(a) for a in (w1, b1, wg, bg, w2, b2)],
        out_specs=pl.BlockSpec((tn, p, w2.shape[2]), lambda m: (m, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, w1, b1, wg, bg, w2, b2)
    return _unpad_coeffs(y[:n0], lmax)


def _gate_fwd(x, w1, b1, wg, bg, w2, b2, lmax, interpret):
    y = so3_gate_ffn_fused(x, w1, b1, wg, bg, w2, b2, lmax, interpret)
    return y, (x, w1, b1, wg, bg, w2)


def _gate_bwd(lmax, interpret, res, dy):
    x, w1, b1, wg, bg, w2 = res
    n0 = x.shape[0]
    tn = _tiles(n0, bwd=True)
    xp = _pad_n(_pad_coeffs(x, lmax), tn)
    dyp = _pad_n(_pad_coeffs(dy, lmax), tn)
    n, p, c = xp.shape
    grid_dims = (n // tn,)
    full = lambda a: pl.BlockSpec(a.shape, lambda m: (0,) * a.ndim, memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((tn, p, c), lambda m: (m, 0, 0), memory_space=pltpu.VMEM)
    acc = lambda shape: (
        jax.ShapeDtypeStruct(shape, jnp.float32),
        pl.BlockSpec(shape, lambda m: (0,) * len(shape), memory_space=pltpu.VMEM),
    )
    outs = [
        (jax.ShapeDtypeStruct(xp.shape, x.dtype),
         pl.BlockSpec((tn, p, c), lambda m: (m, 0, 0), memory_space=pltpu.VMEM)),
        acc(w1.shape), acc(b1.shape), acc(wg.shape), acc(bg.shape),
        acc(w2.shape), acc((w2.shape[2],)),
    ]
    w1t = jnp.swapaxes(w1, 1, 2)
    w2t = jnp.swapaxes(w2, 1, 2)
    wgt = wg.T
    dx, dw1, db1, dwg, dbg, dw2, db2 = pl.pallas_call(
        functools.partial(_gate_ffn_bwd_kernel, lmax),
        out_shape=tuple(o[0] for o in outs),
        grid=grid_dims,
        in_specs=[xspec, xspec]
        + [full(a) for a in (w1, b1, wg, bg, w2, w1t, w2t, wgt)],
        out_specs=tuple(o[1] for o in outs),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, dyp, w1, b1, wg, bg, w2, w1t, w2t, wgt)
    cast = lambda g, pm: g.astype(pm.dtype)
    return (
        _unpad_coeffs(dx[:n0], lmax),
        cast(dw1, w1), cast(db1, b1), cast(dwg, wg), cast(dbg, bg),
        cast(dw2, w2), db2.astype(w2.dtype),
    )


so3_gate_ffn_fused.defvjp(_gate_fwd, _gate_bwd)
