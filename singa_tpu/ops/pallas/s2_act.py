"""Fused S2 pointwise activation as a Pallas TPU kernel.

The S2 activation (to-grid -> SiLU -> from-grid; reference
EF_layers.py:1736-1754) is the embedding's bandwidth hog when done with XLA
einsums: the grid tensor [N, G, C] (G = 70..210 points) round-trips HBM
twice per call. This kernel tiles nodes x channels, keeps the grid tensor in
VMEM, and only streams x in / y out — an ~(2G/I)x traffic reduction.

Forward and backward are both single fused kernels (custom VJP; the backward
recomputes the cheap to-grid product in VMEM).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sigmoid(x):
    # tanh-form sigmoid: measurably faster VPU lowering than logistic in
    # Mosaic at these grid shapes (see so3_ffn.py — 20 ms/step on the FFN)
    return 0.5 * (jnp.tanh(0.5 * x) + 1.0)


def _silu(x):
    return x * _sigmoid(x)


def _silu_grad(x):
    s = _sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


def _to_g(x, mat):
    """[TN, I, TC] x [G, I] -> [TN, TC, G]: ONE MXU matmul with
    M = TN*TC (large), K = I, N = G. Inputs stay in their storage dtype
    (bf16 in training — f32 matmuls run at 1/4 the MXU rate on v5e and made
    the first kernel version slower than XLA); f32 accumulation."""
    return jax.lax.dot_general(
        x, mat.astype(x.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _from_g(a, mat, dtype):
    """[TN, TC, G] x [G, I] -> [TN, I, TC] (deep K = G contraction; one
    in-VMEM transpose at the end)."""
    out = jax.lax.dot_general(
        a, mat.astype(a.dtype), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TN, TC, I]
    return out.transpose(0, 2, 1).astype(dtype)


def _fwd_kernel(x_ref, tg_ref, fg_ref, out_ref):
    x = x_ref[:]  # [TN, I, TC]
    act = _silu(_to_g(x, tg_ref[:])).astype(x.dtype)
    out_ref[:] = _from_g(act, fg_ref[:], out_ref.dtype)


def _bwd_kernel(x_ref, g_ref, tg_ref, fg_ref, out_ref):
    x = x_ref[:]
    g = g_ref[:]
    grid = _to_g(x, tg_ref[:])
    gup = _to_g(g, fg_ref[:])
    h = (_silu_grad(grid) * gup).astype(x.dtype)
    out_ref[:] = _from_g(h, tg_ref[:], out_ref.dtype)


def _tile_sizes(n: int, c: int, g: int, i: int):
    tc = 128 if c % 128 == 0 else c
    # keep the VMEM grid tensor under ~4MB: tn * g * tc * 4B. Ragged final
    # blocks are fine (pl.cdiv grid; padding rows give silu(0) == 0 exactly) —
    # the round-1 divisibility fallback could degenerate to tn == n, putting a
    # ~280 MB block in VMEM, which stalled the Mosaic compile indefinitely.
    budget = 4 * 1024 * 1024 // max(1, g * tc * 4)
    tn = max(8, min(128, (budget // 8) * 8))
    return min(tn, n), tc


def _call(kernel, out_dtype, x, *args, to_grid, from_grid, interpret):
    n, i, c = x.shape
    g = to_grid.shape[0]
    tn, tc = _tile_sizes(n, c, g, i)
    grid_dims = (pl.cdiv(n, tn), pl.cdiv(c, tc))

    tensor_specs = [
        pl.BlockSpec((tn, i, tc), lambda a, b: (a, 0, b), memory_space=pltpu.VMEM)
        for _ in range(1 + len(args))
    ]
    mat_specs = [
        pl.BlockSpec((g, i), lambda a, b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((g, i), lambda a, b: (0, 0), memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, i, c), out_dtype),
        grid=grid_dims,
        in_specs=tensor_specs + mat_specs,
        out_specs=pl.BlockSpec((tn, i, tc), lambda a, b: (a, 0, b), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, *args, to_grid, from_grid)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def s2_silu_pallas(x, to_grid, from_grid, interpret=False):
    """Fused from_grid @ silu(to_grid @ x); x [N, I, C], mats [G, I]."""
    return _call(
        _fwd_kernel, x.dtype, x, to_grid=to_grid, from_grid=from_grid,
        interpret=interpret,
    )


def _fwd(x, to_grid, from_grid, interpret):
    y = s2_silu_pallas(x, to_grid, from_grid, interpret)
    return y, (x, to_grid, from_grid)


def _bwd(interpret, res, g):
    x, to_grid, from_grid = res
    dx = _call(
        _bwd_kernel, x.dtype, x, g, to_grid=to_grid, from_grid=from_grid,
        interpret=interpret,
    )
    return dx, None, None


s2_silu_pallas.defvjp(_fwd, _bwd)


def _row0_mask(shape):
    # Mosaic has no scatter; select row 0 with an iota mask instead of .at[]
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1) == 0


def _sep_fwd_kernel(x_ref, s_ref, tg_ref, fg_ref, out_ref):
    x = x_ref[:]  # [TN, I, TC]
    act = _silu(_to_g(x, tg_ref[:])).astype(x.dtype)
    out = _from_g(act, fg_ref[:], jnp.float32)
    # separable path: the l=0 output row comes from the explicit scalar gate
    gate = _silu(s_ref[:].astype(jnp.float32))[:, None, :]
    out = jnp.where(_row0_mask(out.shape), gate, out)
    out_ref[:] = out.astype(out_ref.dtype)


def _sep_bwd_kernel(x_ref, s_ref, g_ref, tg_ref, fg_ref, dx_ref, ds_ref):
    x = x_ref[:]
    g = g_ref[:].astype(jnp.float32)
    # row 0 of the cotangent belongs to the scalar gate, not the S2 branch
    ds_ref[:] = (_silu_grad(s_ref[:].astype(jnp.float32)) * g[:, 0, :]).astype(
        ds_ref.dtype
    )
    g = jnp.where(_row0_mask(g.shape), 0.0, g).astype(x.dtype)
    grid = _to_g(x, tg_ref[:])
    gup = _to_g(g, fg_ref[:])
    h = (_silu_grad(grid) * gup).astype(x.dtype)
    dx_ref[:] = _from_g(h, tg_ref[:], dx_ref.dtype)


def _sep_call(x, s, *extra, to_grid, from_grid, interpret, bwd):
    n, i, c = x.shape
    g = to_grid.shape[0]
    tn, tc = _tile_sizes(n, c, g, i)
    grid_dims = (pl.cdiv(n, tn), pl.cdiv(c, tc))
    t3 = lambda: pl.BlockSpec((tn, i, tc), lambda a, b: (a, 0, b), memory_space=pltpu.VMEM)
    t2 = lambda: pl.BlockSpec((tn, tc), lambda a, b: (a, b), memory_space=pltpu.VMEM)
    mats = [
        pl.BlockSpec((g, i), lambda a, b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((g, i), lambda a, b: (0, 0), memory_space=pltpu.VMEM),
    ]
    if bwd:
        return pl.pallas_call(
            _sep_bwd_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((n, i, c), x.dtype),
                jax.ShapeDtypeStruct((n, c), s.dtype),
            ),
            grid=grid_dims,
            in_specs=[t3(), t2(), t3()] + mats,
            out_specs=(t3(), t2()),
            interpret=interpret,
        )(x, s, *extra, to_grid, from_grid)
    return pl.pallas_call(
        _sep_fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((n, i, c), x.dtype),
        grid=grid_dims,
        in_specs=[t3(), t2()] + mats,
        out_specs=t3(),
        interpret=interpret,
    )(x, s, to_grid, from_grid)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _s2_silu_sep_p(x, s, to_grid, from_grid, interpret=False):
    return _sep_call(
        x, s, to_grid=to_grid, from_grid=from_grid, interpret=interpret, bwd=False
    )


def _sep_fwd(x, s, to_grid, from_grid, interpret):
    y = _s2_silu_sep_p(x, s, to_grid, from_grid, interpret)
    return y, (x, s, to_grid, from_grid)


def _sep_bwd(interpret, res, g):
    x, s, to_grid, from_grid = res
    dx, ds = _sep_call(
        x, s, g, to_grid=to_grid, from_grid=from_grid, interpret=interpret, bwd=True
    )
    return dx, ds, None, None


_s2_silu_sep_p.defvjp(_sep_fwd, _sep_bwd)


def _prep(x, to_grid, from_grid):
    n, i, c = x.shape
    pad_c = (-c) % 128
    if pad_c:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_c)))
    tg = jnp.asarray(to_grid, jnp.float32).reshape(-1, i)
    fg = jnp.asarray(from_grid, jnp.float32).reshape(-1, i)
    return x, tg, fg, pad_c, c


def s2_silu_sep(
    x: jax.Array,
    scalars: jax.Array,
    to_grid: np.ndarray,
    from_grid: np.ndarray,
) -> jax.Array:
    """Fused separable S2 activation: rows 1.. from the sphere-grid SiLU of
    ``x``, row 0 from ``silu(scalars)`` — the whole [N, G, C] grid tensor and
    the [N, I, C] slice/concat pair stay in VMEM (EF_layers.py:1757-1773)."""
    interpret = jax.default_backend() != "tpu"
    x, tg, fg, pad_c, c = _prep(x, to_grid, from_grid)
    s = jnp.pad(scalars, ((0, 0), (0, pad_c))) if pad_c else scalars
    out = _s2_silu_sep_p(x, s, tg, fg, interpret)
    if pad_c:
        out = out[:, :, :c]
    return out


def s2_silu(x: jax.Array, to_grid: np.ndarray, from_grid: np.ndarray) -> jax.Array:
    """Dispatch wrapper: Pallas on TPU, interpret elsewhere; pads channels to
    a lane multiple (SiLU(0)=0, so zero-padding is exact)."""
    interpret = jax.default_backend() != "tpu"
    n, i, c = x.shape
    # always align channels to full lanes (Mosaic handles sub-128 lane dims
    # poorly; SiLU(0)=0 makes zero padding exact)
    pad_c = (-c) % 128
    if pad_c:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_c)))
    tg = jnp.asarray(to_grid, jnp.float32)
    fg = jnp.asarray(from_grid, jnp.float32)
    # flatten (lat, long, I) mats to (G, I)
    tg = tg.reshape(-1, tg.shape[-1])
    fg = fg.reshape(-1, fg.shape[-1])
    out = s2_silu_pallas(x, tg, fg, interpret)
    if pad_c:
        out = out[:, :, :c]
    return out
