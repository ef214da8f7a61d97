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


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _silu_grad(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


def _fwd_kernel(x_ref, tg_ref, fg_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)  # [TN, I, TC]
    grid = jnp.einsum(
        "gi,nic->ngc", tg_ref[:], x, preferred_element_type=jnp.float32
    )
    act = _silu(grid)
    out = jnp.einsum(
        "gi,ngc->nic", fg_ref[:], act, preferred_element_type=jnp.float32
    )
    out_ref[:] = out.astype(out_ref.dtype)


def _bwd_kernel(x_ref, g_ref, tg_ref, fg_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    grid = jnp.einsum("gi,nic->ngc", tg_ref[:], x, preferred_element_type=jnp.float32)
    gup = jnp.einsum("gi,nic->ngc", fg_ref[:], g, preferred_element_type=jnp.float32)
    h = _silu_grad(grid) * gup
    dx = jnp.einsum("gi,ngc->nic", tg_ref[:], h, preferred_element_type=jnp.float32)
    out_ref[:] = dx.astype(out_ref.dtype)


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
