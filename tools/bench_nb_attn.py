"""Micro-benchmark: the fused neighbor-attention kernel at flagship shapes.

The encoder self-attention kernel is the single largest step item at the
round-4 gate operating point (87.7 ms/step of 288 at batch 32: fwd 25.7,
bwd 62.0). This tool times fwd and fwd+bwd in isolation so tile sweeps
(SINGA_TPU_ATTN_TI / _TI_BWD) iterate in ~a minute instead of a full
train-step compile.

Run alone (never concurrently with another TPU process):
  SINGA_TPU_ATTN_TI=128 SINGA_TPU_ATTN_TI_BWD=64 python tools/bench_nb_attn.py
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from singa_tpu.ops.pallas.neighbor_attn import neighbor_attn_fused  # noqa: E402


def main():
    B, N, K, H, kd, vd, De = 32, 448, 96, 4, 32, 64, 64
    if len(sys.argv) > 1:
        B = int(sys.argv[1])
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32), dt)
    qt = f(B, N, H * kd)
    k = f(B, N, H * kd)
    v = f(B, N, H * vd)
    nbr = jnp.asarray(rng.integers(0, N, size=(B, N, K)).astype(np.int32))
    nbr_mask = jnp.asarray(rng.random((B, N, K)) < 0.7)
    dist = jnp.asarray(rng.uniform(1.0, 15.0, size=(B, N, K)).astype(np.float32))
    ds = f(B, N, H)
    dv = f(B, N, H * vd)
    centers = jnp.linspace(0.0, 15.0, De)
    wk1 = f(De, De); bk1 = f(De); wk2 = f(De, kd); bk2 = f(kd)
    wv1 = f(De, De); bv1 = f(De); wv2 = f(De, vd); bv2 = f(vd)
    coeff = -0.5 / (15.0 / (De - 1)) ** 2

    args = (qt, k, v, nbr, nbr_mask, dist, ds, dv,
            centers, wk1, bk1, wk2, bk2, wv1, bv1, wv2, bv2)

    fwd = jax.jit(lambda *a: neighbor_attn_fused(*a, coeff))

    def loss(*a):
        return jnp.sum(neighbor_attn_fused(*a, coeff).astype(jnp.float32))

    gr = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 9)))

    def timeit(fn, name, iters=30):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.sum(leaf).astype(jnp.float32))
        dt_ms = (time.time() - t0) / iters * 1e3
        print(f"{name:14s} {dt_ms:8.2f} ms  (TI={os.environ.get('SINGA_TPU_ATTN_TI','64')} "
              f"TI_BWD={os.environ.get('SINGA_TPU_ATTN_TI_BWD','32')})")
        return dt_ms

    t_f = timeit(fwd, "fwd")
    t_fb = timeit(gr, "fwd+bwd")
    gather_tf = 2 * B * N * K * N * H * (kd + vd) / 1e12
    print(f"per-layer one-hot gather floor: {gather_tf:.2f} TF fwd "
          f"({gather_tf/0.197:.1f} ms at peak); fwd eff "
          f"{2*gather_tf/0.197/t_f*100:.0f}%  fwd+bwd eff "
          f"{6*gather_tf/0.197/t_fb*100:.0f}% (6 gather-units)")


if __name__ == "__main__":
    main()
