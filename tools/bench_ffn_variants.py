"""In-kernel bisection of the fused SO3-FFN forward: stage-toggled variants.

Replicates ops/pallas/so3_ffn.py's forward kernel with individual stages
disabled (keeping the value chain alive so Mosaic cannot DCE the rest),
to attribute the 12 ms fwd at flagship shapes to lin/grid/silu/layout.

Usage: python tools/bench_ffn_variants.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from singa_tpu.ops.pallas.so3_ffn import (
    _blk_mm, _mm, _pad_layout, _row0, _silu, _to_g, _from_g,
)

N, C, H = 14336, 16, 512
LMAX = 6
TN = 128
CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def bench(name, fn, *args, iters=20, flops=None):
    fn = jax.jit(fn)
    compiled = fn.lower(*args).compile()
    out = compiled(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = compiled(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.time() - t0) / iters
    eff = (flops or 0) / dt / 197e12
    print(f"{name:44s} {dt*1e3:9.2f} ms  mfu {eff:5.1%}", flush=True)
    return dt


def make_kernel(mode, n_chunks, tgp, fgp):
    blocks, P = _pad_layout(LMAX)
    G = tgp.shape[0]
    HC = H // n_chunks

    def kernel(x_ref, w1_ref, b1_ref, wg_ref, bg_ref, w2_ref, b2_ref,
               tg_ref, fg_ref, y_ref):
        x = x_ref[:]
        dt = x.dtype
        TNl = x.shape[0]
        Co = w2_ref.shape[2]
        g0 = _mm(x[:, 0, :], wg_ref[:].astype(dt)) + bg_ref[:]
        y_parts = [jnp.zeros((TNl, blk, Co), jnp.float32) for (_, _, _, blk) in blocks]
        for hc in range(n_chunks):
            sl = slice(hc * HC, (hc + 1) * HC)
            if mode == "nolin1":
                h = jnp.broadcast_to(x[:, :, :1], (TNl, P, HC)) * 0.01
                h = h + g0[:, None, sl] * 1e-6  # keep g0 live
            else:
                h = jnp.concatenate(
                    [
                        _blk_mm(x[:, ds : ds + blk, :], w1_ref[l, :, sl].astype(dt))
                        for l, (_, _, ds, blk) in enumerate(blocks)
                    ],
                    axis=1,
                )
                h = jnp.where(_row0(h.shape), h + b1_ref[sl][None, None, :], h)
            if mode == "nogrid":
                mid = h.astype(jnp.float32)  # skip both grid matmuls + silu
            elif mode == "nosilu":
                grid = _to_g(h.astype(dt), tg_ref[:])
                act = (grid * 0.5).astype(dt)  # linear stand-in for silu
                mid = _from_g(act, fg_ref[:])
            elif mode == "siluonly":
                # grid-shaped silu without the matmuls: broadcast h into the
                # grid shape, silu, reduce back (keeps VPU volume identical)
                grid = jnp.broadcast_to(
                    h[:, :1, :].transpose(0, 2, 1), (TNl, HC, G)
                ).astype(jnp.float32)
                act = _silu(grid).astype(dt)
                mid = jnp.broadcast_to(
                    jnp.sum(act, axis=2)[:, None, :] * 1e-6, (TNl, P, HC)
                ).astype(jnp.float32) + h.astype(jnp.float32)
            else:  # full
                grid = _to_g(h.astype(dt), tg_ref[:])
                act = _silu(grid).astype(dt)
                mid = _from_g(act, fg_ref[:])
            gate = _silu(g0[:, sl])[:, None, :]
            mid = jnp.where(_row0(mid.shape), gate, mid).astype(dt)
            for l, (_, _, ds, blk) in enumerate(blocks):
                y_parts[l] = y_parts[l] + _blk_mm(
                    mid[:, ds : ds + blk, :], w2_ref[l, sl, :].astype(dt)
                )
        y = jnp.concatenate(y_parts, axis=1)
        y = jnp.where(_row0(y.shape), y + b2_ref[:][None, None, :], y)
        y_ref[:] = y.astype(y_ref.dtype)

    return kernel


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    from singa_tpu.equivariant.layers import _grid_mats_for
    from singa_tpu.ops.pallas.so3_ffn import pad_grid_mat

    tg, fg = _grid_mats_for(LMAX, LMAX, False)
    tg2 = np.ascontiguousarray(tg.reshape(-1, tg.shape[-1]))
    fg2 = np.ascontiguousarray(fg.reshape(-1, fg.shape[-1]))
    tgp = jnp.asarray(pad_grid_mat(tg2, LMAX))
    fgp = jnp.asarray(pad_grid_mat(fg2, LMAX))
    G = tgp.shape[0]
    blocks, P = _pad_layout(LMAX)
    L = LMAX + 1
    print(f"device {jax.devices()[0].platform} N={N} P={P} H={H} G={G}")

    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.1)
    dt = jnp.bfloat16
    x = r(N, P, C).astype(dt)
    w1 = r(L, C, H)
    b1 = r(H)
    wg = r(C, H)
    bg = r(H)
    w2 = r(L, H, C)
    b2 = r(C)
    args = (x, w1, b1, wg, bg, w2, b2, tgp, fgp)

    full = lambda a: pl.BlockSpec(a.shape, lambda m: (0,) * a.ndim, memory_space=pltpu.VMEM)
    for mode in ("full", "nosilu", "nogrid", "nolin1", "siluonly"):
        for n_chunks in ([4] if mode != "full" else [4, 2, 1]):
            kern = make_kernel(mode, n_chunks, tgp, fgp)

            def f(*a, kern=kern):
                return jnp.sum(
                    pl.pallas_call(
                        kern,
                        out_shape=jax.ShapeDtypeStruct((N, P, C), dt),
                        grid=(N // TN,),
                        in_specs=[pl.BlockSpec((TN, P, C), lambda m: (m, 0, 0), memory_space=pltpu.VMEM)]
                        + [full(w) for w in a[1:]],
                        out_specs=pl.BlockSpec((TN, P, C), lambda m: (m, 0, 0), memory_space=pltpu.VMEM),
                        compiler_params=CP,
                    )(*a).astype(jnp.float32) ** 2
                )

            try:
                bench(f"{mode} chunks={n_chunks}", f, *args)
            except Exception as e:
                print(f"{mode} chunks={n_chunks}: FAIL {str(e).splitlines()[0][:80]}")


if __name__ == "__main__":
    main()
