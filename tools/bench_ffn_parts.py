"""Per-stage probes for the fused SO3-FFN kernel: which op burns the time?

Each candidate stage of the FFN runs alone as a Pallas kernel over the same
tile/chunk structure as ops/pallas/so3_ffn.py, so stage times can be compared
directly against the full kernel's 12 ms fwd at flagship shapes.

Usage: python tools/bench_ffn_parts.py
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

N, P, C, H, G = 14336, 80, 16, 512, 210
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
    print(f"{name:42s} {dt*1e3:9.2f} ms  mfu {eff:5.1%}", flush=True)
    return dt


def run(name, kernel, x, out_shape, extra=(), flops=None, tn=TN):
    full = lambda a: pl.BlockSpec(a.shape, lambda m: (0,) * a.ndim, memory_space=pltpu.VMEM)

    def f(x, *extra):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
            grid=(N // tn,),
            in_specs=[pl.BlockSpec((tn,) + x.shape[1:], lambda m: (m,) + (0,) * (x.ndim - 1), memory_space=pltpu.VMEM)]
            + [full(a) for a in extra],
            out_specs=pl.BlockSpec((tn,) + out_shape[1:], lambda m: (m,) + (0,) * (len(out_shape) - 1), memory_space=pltpu.VMEM),
            compiler_params=CP,
        )(x, *extra)

    return bench(name, f, x, *extra, flops=flops)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.1)
    dt = jnp.bfloat16
    # big operands are generated ON DEVICE: multi-GB host->device uploads
    # crawl through the axon tunnel
    key = jax.random.PRNGKey(0)
    dev = lambda *s: jax.random.normal(key, s, dt) * 0.1
    h_full = dev(N, P, H)                   # post-lin1 tensor, P-sublane layout
    ht_full = dev(N, H, P)                  # transposed layout
    g_full = dev(N, H, G)                   # grid tensor
    tg = r(G, P)
    fg = r(G, P)
    n_chunks = H // 128
    HC = H // n_chunks
    f_grid = 2 * N * H * P * G  # one direction, padded rows

    # 1. to_grid as dot_general [TN,P,HC] x [G,P] (current kernel form)
    def k1(h_ref, tg_ref, o_ref):
        parts = []
        for hc in range(n_chunks):
            h = h_ref[:, :, hc * HC : (hc + 1) * HC]
            g = jax.lax.dot_general(
                h, tg_ref[:].astype(h.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [TN, HC, G]
            parts.append(jnp.sum(g, axis=2).astype(o_ref.dtype))
        o_ref[:] = jnp.concatenate(parts, axis=1)

    run("to_grid dot_general [TN,P,HC]x[G,P]", k1, h_full, (N, H), (tg,), flops=f_grid)

    # 2. to_grid as merged matmul [TN*HC, P] x [P, G]
    def k2(ht_ref, tgt_ref, o_ref):
        parts = []
        for hc in range(n_chunks):
            ht = ht_ref[:, hc * HC : (hc + 1) * HC, :].reshape(TN * HC, P)
            y = jax.lax.dot_general(
                ht, tgt_ref[:].astype(ht.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            parts.append(jnp.sum(y.reshape(TN, HC, G), axis=2).astype(o_ref.dtype))
        o_ref[:] = jnp.concatenate(parts, axis=1)

    run("to_grid merged [TN*HC,P]x[P,G]", k2, ht_full, (N, H), (tg.T.copy(),), flops=f_grid)

    # 3. silu only on the grid tensor
    def k3(g_ref, o_ref):
        g = g_ref[:]
        a = g * jax.nn.sigmoid(g.astype(jnp.float32)).astype(g.dtype)
        o_ref[:] = jnp.sum(a.astype(jnp.float32), axis=2).astype(o_ref.dtype)

    run("silu on [TN,H,G]", k3, g_full, (N, H))

    # 4. from_grid merged: [TN*HC, G] x [G, P]
    def k4(g_ref, fg_ref, o_ref):
        parts = []
        for hc in range(n_chunks):
            a = g_ref[:, hc * HC : (hc + 1) * HC, :].reshape(TN * HC, G)
            y = jax.lax.dot_general(
                a, fg_ref[:].astype(a.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            parts.append(y.reshape(TN, HC, P).astype(o_ref.dtype))
        o_ref[:] = jnp.concatenate(parts, axis=1)

    run("from_grid merged [TN*HC,G]x[G,P]", k4, g_full, (N, H, P), (fg.T.copy(),), flops=f_grid)

    # 5. transpose [TN,P,H] -> [TN,H,P]
    def k5(h_ref, o_ref):
        o_ref[:] = h_ref[:].transpose(0, 2, 1)

    run("transpose [TN,P,H]->[TN,H,P]", k5, h_full, (N, H, P))

    # 6. fused: merged to_grid + silu + merged from_grid (no transposes)
    def k6(ht_ref, tgt_ref, fg_ref, o_ref):
        parts = []
        for hc in range(n_chunks):
            ht = ht_ref[:, hc * HC : (hc + 1) * HC, :].reshape(TN * HC, P)
            g = jax.lax.dot_general(
                ht, tgt_ref[:].astype(ht.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            a = (g * jax.nn.sigmoid(g)).astype(ht.dtype)
            y = jax.lax.dot_general(
                a, fg_ref[:].astype(a.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            parts.append(y.reshape(TN, HC, P).astype(o_ref.dtype))
        o_ref[:] = jnp.concatenate(parts, axis=1)

    run("merged to_grid+silu+from_grid", k6, ht_full, (N, H, P), (tg.T.copy(), fg.T.copy()), flops=2 * f_grid)


if __name__ == "__main__":
    main()
