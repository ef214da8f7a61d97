"""Fused neighbor-list graph attention as one Pallas TPU kernel per layer.

Fuses the pair-tensor core of NeighborGraphMHA (models/neighbor_graph.py):

    smear   = RBF(dist)                                  [TI, K, De]
    w_k/w_v = EdgeMLP(-smear)                            pair modulations
    k_nb/v_nb = one-hot gather of neighbour rows         (MXU contraction)
    s[i,k,h] = sum_d q~[i,h,d] * w_k[i,k,d] * k_nb[i,k,h,d]
    a        = softmax over {K neighbours + self}        (diag terms precomputed)
    agg[i,h,d] = sum_k a * w_v * v_nb  +  a_self * diag_value

Everything between the node arrays and the aggregated output lives in VMEM:
the XLA version streamed [B, N, K, *] pair tensors (smear, MLP hiddens,
modulations, score/aggregate products) through HBM for ~180 ms/step at the
flagship shapes. The backward is one kernel too, accumulating the four
EdgeMLP weight grads and the per-node dk/dv across node tiles (sequential
TPU grid; first-step init).

The self/diagonal attention slot stays outside (it is O(N), not O(N*K)):
the kernel receives the diag scores and the diag value term precomputed and
handles them inside the softmax.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ssp(x):
    return jax.nn.softplus(x) - np.log(2.0).astype(np.float32)


def _ssp_grad(x):
    return jax.nn.sigmoid(x)


def _mm(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _mm3(a, b):
    """[TI, K, X] x [X, F] -> [TI, K, F] (aligned (TI, K) free-dim merge)."""
    return jax.lax.dot_general(
        a, b, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _outer3(a, b):
    """[TI, K, A] x [TI, K, B] -> [A, B] via an aligned merge."""
    TI, K, A = a.shape
    return jax.lax.dot_general(
        a.reshape(TI * K, A), b.reshape(TI * K, -1),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )


def _smear_neg(dist, centers, coeff, dtype):
    """-RBF(dist): [TI, K] -> [TI, K, De] (the Laplacian off-diagonal attr)."""
    diff = dist[..., None] - centers
    return (-jnp.exp(coeff * diff * diff)).astype(dtype)


def _edge_mlp(e2, w1, b1, w2, b2, dt):
    """[TI, K, De] -> (pre-activation hidden, output) [TI, K, Hh/F]."""
    pre = _mm3(e2, w1.astype(dt)) + b1
    out = _mm3(_ssp(pre).astype(dt), w2.astype(dt)) + b2
    return pre, out


def _head_mats(H, d):
    """Constant segment matrices for head bookkeeping on 128/256-wide lanes:
    SEG [H*d, H] sums each head's d-block; EXP = SEG^T expands per-head
    scalars back to lanes; TILE [d, H*d] repeats a shared-[d] vector per
    head. Mosaic has no aligned lane->sublane reshape, so [R, H, d] tensors
    are avoided entirely in favour of these contractions."""
    seg = np.zeros((H * d, H), np.float32)
    til = np.zeros((d, H * d), np.float32)
    for h in range(H):
        seg[h * d : (h + 1) * d, h] = 1.0
        til[:, h * d : (h + 1) * d] = np.eye(d)
    return seg, til


def _attn_fwd_kernel(
    K, H, kd, vd, coeff, gathered,
    *refs,
):
    if gathered:
        # hybrid form: neighbour rows pre-gathered outside the kernel (XLA
        # row gather, DMA-bound) — no O(TI*K*N) one-hot matmuls in forward
        (qt_ref, knb_ref, vnb_ref, msk_ref, dist_ref, ds_ref, dv_ref,
         centers_ref, wk1_ref, bk1_ref, wk2_ref, bk2_ref,
         wv1_ref, bv1_ref, wv2_ref, bv2_ref,
         segk_ref, tilk_ref, segv_ref, tilv_ref, out_ref) = refs
        dt = knb_ref.dtype
    else:
        (qt_ref, k_ref, v_ref, nbr_ref, msk_ref, dist_ref, ds_ref, dv_ref,
         centers_ref, wk1_ref, bk1_ref, wk2_ref, bk2_ref,
         wv1_ref, bv1_ref, wv2_ref, bv2_ref,
         segk_ref, tilk_ref, segv_ref, tilv_ref, out_ref) = refs
        dt = k_ref.dtype
    TI = qt_ref.shape[0]
    seg_k, tile_k = segk_ref[:].astype(dt), tilk_ref[:].astype(dt)
    seg_v, tile_v = segv_ref[:].astype(dt), tilv_ref[:].astype(dt)

    if gathered:
        k_nb = knb_ref[:].astype(jnp.float32)  # [TI, K, H*kd]
        v_nb = vnb_ref[:].astype(jnp.float32)  # [TI, K, H*vd]
    else:
        N = k_ref.shape[0]
        onehot = (
            nbr_ref[:][:, :, None]
            == jax.lax.broadcasted_iota(jnp.int32, (TI, K, N), 2)
        ).astype(dt)
        k_nb = _mm3(onehot, k_ref[:])  # [TI, K, H*kd] f32
        v_nb = _mm3(onehot, v_ref[:])  # [TI, K, H*vd] f32

    e2 = _smear_neg(dist_ref[:], centers_ref[:], coeff, dt)  # [TI, K, De]
    _, w_k = _edge_mlp(e2, wk1_ref[:], bk1_ref[:], wk2_ref[:], bk2_ref[:], dt)
    _, w_v = _edge_mlp(e2, wv1_ref[:], bv1_ref[:], wv2_ref[:], bv2_ref[:], dt)
    w_k_t = _mm3(w_k.astype(dt), tile_k)  # [TI, K, H*kd] per-head repeat
    w_v_t = _mm3(w_v.astype(dt), tile_v)  # [TI, K, H*vd]

    qt = qt_ref[:].astype(jnp.float32)[:, None, :]  # [TI, 1, H*kd]
    kw = k_nb * w_k_t
    scale = 1.0 / np.sqrt(kd)
    s_off = _mm3((kw * qt).astype(dt), seg_k) * scale  # [TI, K, H]
    neg = jnp.float32(-1e9)
    s_off = jnp.where(msk_ref[:][..., None] != 0, s_off, neg)
    s_diag = ds_ref[:].astype(jnp.float32)  # [TI, H]

    m = jnp.maximum(jnp.max(s_off, axis=1), s_diag)  # [TI, H]
    p_off = jnp.exp(s_off - m[:, None, :])
    p_diag = jnp.exp(s_diag - m)
    denom = jnp.sum(p_off, axis=1) + p_diag
    a_off = p_off / denom[:, None, :]  # [TI, K, H]
    a_diag = p_diag / denom  # [TI, H]

    a_t = _mm3(a_off.astype(dt), seg_v.T)  # [TI, K, H*vd]
    agg = jnp.sum(a_t * w_v_t * v_nb, axis=1)  # [TI, H*vd]
    a_diag_t = _mm(a_diag.astype(dt), seg_v.T)  # [TI, H*vd]
    agg = agg + a_diag_t * dv_ref[:].astype(jnp.float32)
    out_ref[:] = agg.astype(out_ref.dtype)


def _attn_bwd_kernel(
    K, H, kd, vd, coeff, gathered,
    *refs,
):
    if gathered:
        # hybrid: neighbour rows re-gathered outside; nbr still feeds the
        # one-hot TRANSPOSE for the dk/dv scatter (exact, MXU-ridden)
        (qt_ref, knb_ref, vnb_ref, nbr_ref, msk_ref, dist_ref, ds_ref,
         dv_ref,
         centers_ref, wk1_ref, bk1_ref, wk2_ref, bk2_ref,
         wv1_ref, bv1_ref, wv2_ref, bv2_ref,
         segk_ref, tilk_ref, segv_ref, tilv_ref, g_ref,
         dqt_ref, dk_ref, dv_all_ref, dds_ref, ddv_ref,
         dwk1_ref, dbk1_ref, dwk2_ref, dbk2_ref,
         dwv1_ref, dbv1_ref, dwv2_ref, dbv2_ref) = refs
        dt = knb_ref.dtype
    else:
        (qt_ref, k_ref, v_ref, nbr_ref, msk_ref, dist_ref, ds_ref, dv_ref,
         centers_ref, wk1_ref, bk1_ref, wk2_ref, bk2_ref,
         wv1_ref, bv1_ref, wv2_ref, bv2_ref,
         segk_ref, tilk_ref, segv_ref, tilv_ref, g_ref,
         dqt_ref, dk_ref, dv_all_ref, dds_ref, ddv_ref,
         dwk1_ref, dbk1_ref, dwk2_ref, dbk2_ref,
         dwv1_ref, dbv1_ref, dwv2_ref, dbv2_ref) = refs
        dt = k_ref.dtype
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init_w():
        for r in (dwk1_ref, dbk1_ref, dwk2_ref, dbk2_ref,
                  dwv1_ref, dbv1_ref, dwv2_ref, dbv2_ref):
            r[:] = jnp.zeros_like(r)

    @pl.when(pl.program_id(1) == 0)
    def _init_kv():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dv_all_ref[:] = jnp.zeros_like(dv_all_ref)

    TI = qt_ref.shape[0]
    N = dk_ref.shape[0]
    seg_k, tile_k = segk_ref[:].astype(dt), tilk_ref[:].astype(dt)
    seg_v, tile_v = segv_ref[:].astype(dt), tilv_ref[:].astype(dt)

    # ---- recompute forward ----
    onehot = (
        nbr_ref[:][:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (TI, K, N), 2)
    ).astype(dt)
    if gathered:
        k_nb = knb_ref[:].astype(jnp.float32)
        v_nb = vnb_ref[:].astype(jnp.float32)
    else:
        k_nb = _mm3(onehot, k_ref[:])
        v_nb = _mm3(onehot, v_ref[:])
    e2 = _smear_neg(dist_ref[:], centers_ref[:], coeff, dt)
    pre_k, w_k = _edge_mlp(e2, wk1_ref[:], bk1_ref[:], wk2_ref[:], bk2_ref[:], dt)
    pre_v, w_v = _edge_mlp(e2, wv1_ref[:], bv1_ref[:], wv2_ref[:], bv2_ref[:], dt)
    w_k_t = _mm3(w_k.astype(dt), tile_k)
    w_v_t = _mm3(w_v.astype(dt), tile_v)

    qt = qt_ref[:].astype(jnp.float32)[:, None, :]
    kw = k_nb * w_k_t
    scale = 1.0 / np.sqrt(kd)
    s_off = _mm3((kw * qt).astype(dt), seg_k) * scale
    neg = jnp.float32(-1e9)
    live = msk_ref[:][..., None] != 0
    s_off = jnp.where(live, s_off, neg)
    s_diag = ds_ref[:].astype(jnp.float32)
    m = jnp.maximum(jnp.max(s_off, axis=1), s_diag)
    p_off = jnp.exp(s_off - m[:, None, :])
    p_diag = jnp.exp(s_diag - m)
    denom = jnp.sum(p_off, axis=1) + p_diag
    a_off = p_off / denom[:, None, :]
    a_diag = p_diag / denom
    diag_value = dv_ref[:].astype(jnp.float32)  # [TI, H*vd]

    # ---- backward ----
    g = g_ref[:].astype(jnp.float32)  # [TI, H*vd]
    gb = g[:, None, :]
    wvv = w_v_t * v_nb  # [TI, K, H*vd]
    da_off = _mm3((gb * wvv).astype(dt), seg_v)  # [TI, K, H]
    da_diag = _mm((g * diag_value).astype(dt), seg_v)  # [TI, H]
    a_t = _mm3(a_off.astype(dt), seg_v.T)
    dwv_t = a_t * gb * v_nb  # [TI, K, H*vd]
    dwv3 = _mm3(dwv_t.astype(dt), tile_v.T)  # [TI, K, vd] (sum over heads)
    dv_nb = a_t * w_v_t * gb
    a_diag_t = _mm(a_diag.astype(dt), seg_v.T)
    ddv_ref[:] = (a_diag_t * g).astype(ddv_ref.dtype)
    # softmax backward over the K+1 slots
    dot = jnp.sum(a_off * da_off, axis=1) + a_diag * da_diag  # [TI, H]
    ds_off = a_off * (da_off - dot[:, None, :])
    dds_ref[:] = (a_diag * (da_diag - dot)).astype(dds_ref.dtype)
    ds_off = jnp.where(live, ds_off, 0.0) * scale
    ds_t = _mm3(ds_off.astype(dt), seg_k.T)  # [TI, K, H*kd]
    # score paths
    dqt_ref[:] = jnp.sum(ds_t * kw, axis=1).astype(dqt_ref.dtype)
    dk_nb = ds_t * w_k_t * qt
    dw_k3 = _mm3((ds_t * k_nb * qt).astype(dt), tile_k.T)  # [TI, K, kd]
    # edge-MLP backward (dist carries no parameters; no ddist needed)
    for (dw3, pre, w1r, w2r, dw1r, db1r, dw2r, db2r) in (
        (dw_k3, pre_k, wk1_ref, wk2_ref, dwk1_ref, dbk1_ref, dwk2_ref, dbk2_ref),
        (dwv3, pre_v, wv1_ref, wv2_ref, dwv1_ref, dbv1_ref, dwv2_ref, dbv2_ref),
    ):
        hidden = _ssp(pre).astype(dt)
        dw3 = dw3.astype(dt)
        dw2r[:] += _outer3(hidden, dw3)
        db2r[:] += jnp.sum(jnp.sum(dw3.astype(jnp.float32), axis=0), axis=0)
        dh = (_mm3(dw3, w2r[:].astype(dt).T) * _ssp_grad(pre)).astype(dt)
        dw1r[:] += _outer3(e2, dh)
        db1r[:] += jnp.sum(jnp.sum(dh.astype(jnp.float32), axis=0), axis=0)
    # node k/v grads via the one-hot transpose: contract (TI, K) jointly
    # through an aligned merge (batched matmuls are unsupported in Mosaic)
    oh2 = onehot.reshape(TI * K, N)
    dk_ref[:] += jax.lax.dot_general(
        oh2, dk_nb.astype(dt).reshape(TI * K, -1),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dv_all_ref[:] += jax.lax.dot_general(
        oh2, dv_nb.astype(dt).reshape(TI * K, -1),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )


def _specs(N, TI, K, H, kd, vd):
    """2-D flattened layouts: node arrays are [B*N, w] (tile (TI, w), index
    b*(N//TI)+i); per-graph arrays use block (N, w) at block-index b."""
    nt = N // TI
    tile = lambda w: pl.BlockSpec((TI, w), lambda b, i: (b * nt + i, 0), memory_space=pltpu.VMEM)
    per_b = lambda w: pl.BlockSpec((N, w), lambda b, i: (b, 0), memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda b, i: (0,) * a.ndim, memory_space=pltpu.VMEM)
    return tile, per_b, full


def _flat(x):
    return x.reshape((-1,) + x.shape[2:])


_VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _ti(n: int, bwd: bool = False) -> int:
    """Largest node-tile that divides N exactly (no ragged blocks:
    reductions would sum undefined padding content). Default caps 64/32
    under the raised 100 MB scoped-VMEM limit — the 16 MB default forced
    32/16 tiles that left the pair matmuls M-starved on the MXU (same
    lesson as the FFN kernel, round 2); env caps kept for sweeps."""
    env = os.environ.get("SINGA_TPU_ATTN_TI_BWD" if bwd else "SINGA_TPU_ATTN_TI")
    t = int(env) if env else (32 if bwd else 64)
    while t > 1 and n % t:
        t //= 2
    return max(t, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(17, 18))
def neighbor_attn_fused(
    qt, k, v, nbr, nbr_mask, dist, diag_scores, diag_value,
    centers, wk1, bk1, wk2, bk2, wv1, bv1, wv2, bv2,
    coeff, interpret=False,
):
    """qt/k/v [B, N, H*d]; nbr/nbr_mask/dist [B, N, K]; diag_scores [B, N, H];
    diag_value [B, N, H*vd]; EdgeMLP params; coeff = -0.5/width^2.
    Returns agg [B, N, H*vd]."""
    B, N, HK = qt.shape
    K = nbr.shape[2]
    H = diag_scores.shape[2]
    kd = HK // H
    vd = v.shape[2] // H
    De = centers.shape[0]
    TI = _ti(N)
    grid = (B, N // TI)
    tile, per_b, full = _specs(N, TI, K, H, kd, vd)
    kern = functools.partial(_attn_fwd_kernel, K, H, kd, vd, coeff, False)
    sk, tk = _head_mats(H, kd)
    sv, tv = _head_mats(H, vd)
    segk, tilk = jnp.asarray(sk), jnp.asarray(tk)
    segv, tilv = jnp.asarray(sv), jnp.asarray(tv)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B * N, H * vd), qt.dtype),
        grid=grid,
        in_specs=[
            tile(H * kd), per_b(H * kd), per_b(H * vd),
            tile(K), tile(K), tile(K), tile(H), tile(H * vd),
            full(centers), full(wk1), full(bk1), full(wk2), full(bk2),
            full(wv1), full(bv1), full(wv2), full(bv2),
            full(segk), full(tilk), full(segv), full(tilv),
        ],
        out_specs=tile(H * vd),
        interpret=interpret,
        compiler_params=_VMEM,
    )(
        _flat(qt), _flat(k), _flat(v), _flat(nbr),
        _flat(nbr_mask.astype(jnp.int32)), _flat(dist),
        _flat(diag_scores), _flat(diag_value),
        centers, wk1, bk1, wk2, bk2, wv1, bv1, wv2, bv2,
        segk, tilk, segv, tilv,
    )
    return out.reshape(B, N, H * vd)


def _fwd(qt, k, v, nbr, nbr_mask, dist, diag_scores, diag_value,
         centers, wk1, bk1, wk2, bk2, wv1, bv1, wv2, bv2, coeff, interpret):
    out = neighbor_attn_fused(
        qt, k, v, nbr, nbr_mask, dist, diag_scores, diag_value,
        centers, wk1, bk1, wk2, bk2, wv1, bv1, wv2, bv2, coeff, interpret,
    )
    return out, (qt, k, v, nbr, nbr_mask, dist, diag_scores, diag_value,
                 centers, wk1, bk1, wk2, bk2, wv1, bv1, wv2, bv2)


def _bwd(coeff, interpret, res, g):
    (qt, k, v, nbr, nbr_mask, dist, diag_scores, diag_value,
     centers, wk1, bk1, wk2, bk2, wv1, bv1, wv2, bv2) = res
    B, N, HK = qt.shape
    K = nbr.shape[2]
    H = diag_scores.shape[2]
    kd = HK // H
    vd = v.shape[2] // H
    TI = _ti(N, bwd=True)
    grid = (B, N // TI)
    tile, per_b, full = _specs(N, TI, K, H, kd, vd)
    acc = lambda a: (
        jax.ShapeDtypeStruct(a.shape, jnp.float32),
        pl.BlockSpec(a.shape, lambda b, i: (0,) * a.ndim, memory_space=pltpu.VMEM),
    )
    outs = [
        (jax.ShapeDtypeStruct((B * N, H * kd), qt.dtype), tile(H * kd)),  # dqt
        (jax.ShapeDtypeStruct((B * N, H * kd), jnp.float32), per_b(H * kd)),  # dk
        (jax.ShapeDtypeStruct((B * N, H * vd), jnp.float32), per_b(H * vd)),  # dv
        (jax.ShapeDtypeStruct((B * N, H), diag_scores.dtype), tile(H)),
        (jax.ShapeDtypeStruct((B * N, H * vd), diag_value.dtype), tile(H * vd)),
        acc(wk1), acc(bk1), acc(wk2), acc(bk2),
        acc(wv1), acc(bv1), acc(wv2), acc(bv2),
    ]
    kern = functools.partial(_attn_bwd_kernel, K, H, kd, vd, coeff, False)
    sk, tk = _head_mats(H, kd)
    sv, tv = _head_mats(H, vd)
    segk, tilk = jnp.asarray(sk), jnp.asarray(tk)
    segv, tilv = jnp.asarray(sv), jnp.asarray(tv)
    (dqt, dk, dv, dds, ddv, dwk1, dbk1, dwk2, dbk2,
     dwv1, dbv1, dwv2, dbv2) = pl.pallas_call(
        kern,
        out_shape=tuple(o[0] for o in outs),
        grid=grid,
        in_specs=[
            tile(H * kd), per_b(H * kd), per_b(H * vd),
            tile(K), tile(K), tile(K), tile(H), tile(H * vd),
            full(centers), full(wk1), full(bk1), full(wk2), full(bk2),
            full(wv1), full(bv1), full(wv2), full(bv2),
            full(segk), full(tilk), full(segv), full(tilv), tile(H * vd),
        ],
        out_specs=tuple(o[1] for o in outs),
        interpret=interpret,
        compiler_params=_VMEM,
    )(
        _flat(qt), _flat(k), _flat(v), _flat(nbr),
        _flat(nbr_mask.astype(jnp.int32)), _flat(dist),
        _flat(diag_scores), _flat(diag_value),
        centers, wk1, bk1, wk2, bk2, wv1, bv1, wv2, bv2,
        segk, tilk, segv, tilv, _flat(g),
    )
    c = lambda a, p: a.astype(p.dtype)
    sh = lambda a, proto: a.reshape(proto.shape)
    return (
        sh(dqt, qt), sh(c(dk, k), k), sh(c(dv, v), v), None, None, None,
        sh(dds, diag_scores), sh(ddv, diag_value),
        None, c(dwk1, wk1), c(dbk1, bk1), c(dwk2, wk2), c(dbk2, bk2),
        c(dwv1, wv1), c(dbv1, bv1), c(dwv2, wv2), c(dbv2, bv2),
    )


neighbor_attn_fused.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Hybrid form: XLA row-gathers OUTSIDE the kernel, pair math + softmax inside.
#
# The fused kernel's one-hot gathers execute O(B*N*K*N*(Hkd+Hvd)) matmul FLOPs
# — ~55% of its executed work at the flagship shapes (DESIGN.md round 3).
# Here the forward gathers k_nb/v_nb with jnp.take_along_axis (a row gather
# the TPU serves from HBM at DMA bandwidth, ~900 MB/layer), the kernel keeps
# every [TI, K, *] pair intermediate in VMEM, and only the backward dk/dv
# SCATTER (which has no DMA equivalent) stays a one-hot-transpose matmul.
# ---------------------------------------------------------------------------


def _gather_rows(t: jax.Array, nbr: jax.Array) -> jax.Array:
    """[B, N, F] gathered by [B, N, K] graph-local indices -> [B, N, K, F]."""
    B, N, F = t.shape
    K = nbr.shape[2]
    idx = nbr.reshape(B, N * K)
    out = jnp.take_along_axis(t, idx[..., None], axis=1)
    return out.reshape(B, N, K, F)


def _hybrid_pallas_fwd(qt, k_nb, v_nb, nbr_mask, dist, diag_scores, diag_value,
                       centers, wk1, bk1, wk2, bk2, wv1, bv1, wv2, bv2,
                       coeff, interpret, N):
    B = qt.shape[0]
    K = k_nb.shape[2]
    H = diag_scores.shape[2]
    kd = qt.shape[2] // H
    vd = v_nb.shape[3] // H
    TI = _ti(N)
    nt = N // TI
    grid = (B, nt)
    tile, per_b, full = _specs(N, TI, K, H, kd, vd)
    tile3 = lambda w: pl.BlockSpec(
        (TI, K, w), lambda b, i: (b * nt + i, 0, 0), memory_space=pltpu.VMEM
    )
    kern = functools.partial(_attn_fwd_kernel, K, H, kd, vd, coeff, True)
    sk, tk = _head_mats(H, kd)
    sv, tv = _head_mats(H, vd)
    segk, tilk = jnp.asarray(sk), jnp.asarray(tk)
    segv, tilv = jnp.asarray(sv), jnp.asarray(tv)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B * N, H * vd), qt.dtype),
        grid=grid,
        in_specs=[
            tile(H * kd), tile3(H * kd), tile3(H * vd),
            tile(K), tile(K), tile(H), tile(H * vd),
            full(centers), full(wk1), full(bk1), full(wk2), full(bk2),
            full(wv1), full(bv1), full(wv2), full(bv2),
            full(segk), full(tilk), full(segv), full(tilv),
        ],
        out_specs=tile(H * vd),
        interpret=interpret,
        compiler_params=_VMEM,
    )(
        _flat(qt), k_nb.reshape(B * N, K, -1), v_nb.reshape(B * N, K, -1),
        _flat(nbr_mask.astype(jnp.int32)), _flat(dist),
        _flat(diag_scores), _flat(diag_value),
        centers, wk1, bk1, wk2, bk2, wv1, bv1, wv2, bv2,
        segk, tilk, segv, tilv,
    )
    return out.reshape(B, N, H * vd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(17, 18))
def neighbor_attn_hybrid(
    qt, k, v, nbr, nbr_mask, dist, diag_scores, diag_value,
    centers, wk1, bk1, wk2, bk2, wv1, bv1, wv2, bv2,
    coeff, interpret=False,
):
    """Same contract as neighbor_attn_fused; gathers ride XLA DMA instead of
    one-hot MXU matmuls (forward AND the backward recompute)."""
    k_nb = _gather_rows(k, nbr)
    v_nb = _gather_rows(v, nbr)
    return _hybrid_pallas_fwd(
        qt, k_nb, v_nb, nbr_mask, dist, diag_scores, diag_value,
        centers, wk1, bk1, wk2, bk2, wv1, bv1, wv2, bv2,
        coeff, interpret, k.shape[1],
    )


def _fwd_h(qt, k, v, nbr, nbr_mask, dist, diag_scores, diag_value,
           centers, wk1, bk1, wk2, bk2, wv1, bv1, wv2, bv2, coeff, interpret):
    out = neighbor_attn_hybrid(
        qt, k, v, nbr, nbr_mask, dist, diag_scores, diag_value,
        centers, wk1, bk1, wk2, bk2, wv1, bv1, wv2, bv2, coeff, interpret,
    )
    return out, (qt, k, v, nbr, nbr_mask, dist, diag_scores, diag_value,
                 centers, wk1, bk1, wk2, bk2, wv1, bv1, wv2, bv2)


def _bwd_h(coeff, interpret, res, g):
    (qt, k, v, nbr, nbr_mask, dist, diag_scores, diag_value,
     centers, wk1, bk1, wk2, bk2, wv1, bv1, wv2, bv2) = res
    B, N, HK = qt.shape
    K = nbr.shape[2]
    H = diag_scores.shape[2]
    kd = HK // H
    vd = v.shape[2] // H
    # re-gather (cheap DMA) instead of keeping the [B, N, K, *] pair tensors
    # resident between fwd and bwd (~450 MB/layer at flagship shapes)
    k_nb = _gather_rows(k, nbr).reshape(B * N, K, -1)
    v_nb = _gather_rows(v, nbr).reshape(B * N, K, -1)
    TI = _ti(N, bwd=True)
    nt = N // TI
    grid = (B, nt)
    tile, per_b, full = _specs(N, TI, K, H, kd, vd)
    tile3 = lambda w: pl.BlockSpec(
        (TI, K, w), lambda b, i: (b * nt + i, 0, 0), memory_space=pltpu.VMEM
    )
    acc = lambda a: (
        jax.ShapeDtypeStruct(a.shape, jnp.float32),
        pl.BlockSpec(a.shape, lambda b, i: (0,) * a.ndim, memory_space=pltpu.VMEM),
    )
    outs = [
        (jax.ShapeDtypeStruct((B * N, H * kd), qt.dtype), tile(H * kd)),  # dqt
        (jax.ShapeDtypeStruct((B * N, H * kd), jnp.float32), per_b(H * kd)),  # dk
        (jax.ShapeDtypeStruct((B * N, H * vd), jnp.float32), per_b(H * vd)),  # dv
        (jax.ShapeDtypeStruct((B * N, H), diag_scores.dtype), tile(H)),
        (jax.ShapeDtypeStruct((B * N, H * vd), diag_value.dtype), tile(H * vd)),
        acc(wk1), acc(bk1), acc(wk2), acc(bk2),
        acc(wv1), acc(bv1), acc(wv2), acc(bv2),
    ]
    kern = functools.partial(_attn_bwd_kernel, K, H, kd, vd, coeff, True)
    sk, tk = _head_mats(H, kd)
    sv, tv = _head_mats(H, vd)
    segk, tilk = jnp.asarray(sk), jnp.asarray(tk)
    segv, tilv = jnp.asarray(sv), jnp.asarray(tv)
    (dqt, dk, dv, dds, ddv, dwk1, dbk1, dwk2, dbk2,
     dwv1, dbv1, dwv2, dbv2) = pl.pallas_call(
        kern,
        out_shape=tuple(o[0] for o in outs),
        grid=grid,
        in_specs=[
            tile(H * kd), tile3(H * kd), tile3(H * vd),
            tile(K), tile(K), tile(K), tile(H), tile(H * vd),
            full(centers), full(wk1), full(bk1), full(wk2), full(bk2),
            full(wv1), full(bv1), full(wv2), full(bv2),
            full(segk), full(tilk), full(segv), full(tilv), tile(H * vd),
        ],
        out_specs=tuple(o[1] for o in outs),
        interpret=interpret,
        compiler_params=_VMEM,
    )(
        _flat(qt), k_nb, v_nb, _flat(nbr),
        _flat(nbr_mask.astype(jnp.int32)), _flat(dist),
        _flat(diag_scores), _flat(diag_value),
        centers, wk1, bk1, wk2, bk2, wv1, bv1, wv2, bv2,
        segk, tilk, segv, tilv, _flat(g),
    )
    c = lambda a, p: a.astype(p.dtype)
    sh = lambda a, proto: a.reshape(proto.shape)
    return (
        sh(dqt, qt), sh(c(dk, k), k), sh(c(dv, v), v), None, None, None,
        sh(dds, diag_scores), sh(ddv, diag_value),
        None, c(dwk1, wk1), c(dbk1, bk1), c(dwk2, wk2), c(dbk2, bk2),
        c(dwv1, wv1), c(dbv1, bv1), c(dwv2, wv2), c(dbv2, bv2),
    )


neighbor_attn_hybrid.defvjp(_fwd_h, _bwd_h)
