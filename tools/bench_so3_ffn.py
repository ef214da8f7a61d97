"""Micro-bench: fused SO3-FFN Pallas kernel at flagship shapes.

Times forward and fwd+bwd of the SO3Linear -> separable-S2 -> SO3Linear
node block on the attached device, with gradients reduced to a scalar
INSIDE jit (returning raw gradient arrays pulls 100+ MB over the axon
tunnel and unused grads get dead-code-eliminated — both mislead).

Usage: python tools/bench_so3_ffn.py [N]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


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
    print(f"{name:34s} {dt*1e3:9.2f} ms  mfu {eff:5.1%}", flush=True)
    return dt


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    N = int(pos[0]) if pos else 32 * 448
    from singa_tpu.config import Config
    from singa_tpu.dtypes import set_compute_dtype
    from singa_tpu.equivariant.layers import _grid_mats_for
    from singa_tpu.ops.pallas.so3_ffn import pad_grid_mat, so3_ffn_fused

    cfg = Config()
    set_compute_dtype("bfloat16")
    ecfg = cfg.embedding
    lmax = ecfg.lmax
    C = ecfg.sphere_channels
    H = ecfg.ffn_hidden_channels
    L = lmax + 1
    I = (lmax + 1) ** 2

    tg, fg = _grid_mats_for(lmax, lmax, False)
    tg2 = np.ascontiguousarray(tg.reshape(-1, tg.shape[-1]))
    fg2 = np.ascontiguousarray(fg.reshape(-1, fg.shape[-1]))
    G = tg2.shape[0]
    print(f"device {jax.devices()[0].platform}  N={N} I={I} C={C} H={H} G={G}")

    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.1)
    dt = jnp.bfloat16
    x = r(N, I, C).astype(dt)
    w1 = r(L, C, H)
    b1 = r(H)
    wg = r(C, H)
    bg = r(H)
    w2 = r(L, H, C)
    b2 = r(C)
    tgp = jnp.asarray(pad_grid_mat(tg2, lmax))
    fgp = jnp.asarray(pad_grid_mat(fg2, lmax))
    interp = jax.default_backend() != "tpu"

    # analytic useful MACs (unpadded coefficient rows)
    mac_lin = N * I * C * H * 2  # lin1 + lin2
    mac_grid = N * G * I * H * 2  # to_grid + from_grid
    f_fwd = 2 * (mac_lin + mac_grid)
    print(f"analytic fwd: lin {2*mac_lin/1e9:.1f} grid {2*mac_grid/1e9:.1f} GFLOP")

    def fwd(x, w1, b1, wg, bg, w2, b2):
        return so3_ffn_fused(x, w1, b1, wg, bg, w2, b2, tgp, fgp, lmax, interp)

    def loss(*a):
        return jnp.sum(fwd(*a).astype(jnp.float32) ** 2)

    def gradsum(*a):
        gs = jax.grad(loss, argnums=tuple(range(7)))(*a)
        return sum(jnp.sum(g.astype(jnp.float32)) for g in gs)

    args = (x, w1, b1, wg, bg, w2, b2)
    bench("ffn fused fwd", loss, *args, flops=f_fwd)
    bench("ffn fused fwd+bwd scalar", gradsum, *args, flops=3 * f_fwd)


if __name__ == "__main__":
    main()
