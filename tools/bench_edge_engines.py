"""Micro-benchmark: one-hot-matmul edge engine vs gather/dense-K reduction.

Shapes mirror the flagship training step (batch 32, merged intra pass:
n_c=448 nodes, E=992 edges, F=49x16 features). Measures, on the real chip:

  1. gather_src: one-hot einsum  vs  jnp.take row-gather
  2. scatter_dst: one-hot einsum vs  edge_of-table gather + sum-over-K
  3. per-dst softmax both ways

Run alone (never concurrently with another TPU process).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    # force a value fetch: block_until_ready under-reports on this backend
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out).astype(jnp.float32))
    dt = (time.time() - t0) / iters
    print(f"{name:42s} {dt*1e3:9.3f} ms", file=sys.stderr)
    return dt


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=448, help="nodes per graph (flagship intra pass: 448; SURVEY 5.7 buckets: 768/1536)")
    ap.add_argument("--edges", type=int, default=0, help="edges per graph (default ~2.2x nodes, the covalent-graph ratio)")
    ap.add_argument("--batch", type=int, default=32)
    a = ap.parse_args()
    B, N, K = a.batch, a.nodes, 8
    E = a.edges or int(2.215 * N)
    print(f"B={B} N={N} E={E} K={K}", file=sys.stderr)
    F = 49 * 16
    rng = np.random.default_rng(0)
    src = rng.integers(0, N, size=(B, E)).astype(np.int32)
    dst_np = np.zeros((B, E), np.int32)
    # bounded in-degree <= K
    for b in range(B):
        d = np.repeat(np.arange(N), K)[:E]
        rng.shuffle(d)
        dst_np[b] = d
    mask = np.ones((B, E), bool)

    # --- engine A: one-hot matmuls ---
    # The one-hot is GENERATED IN-FUSION from an iota-compare, exactly as
    # ops/neighbors.py does — a pre-materialized [B, E, N] one-hot read
    # from HBM benchmarks a different (memory-bound) program and measured
    # 47.7 ms where the in-fusion form costs ~1 ms (round-5 correction;
    # the round-4 numbers cited in ops/neighbors.py came from this file's
    # earlier materialized form).
    src_j = jnp.asarray(src)  # [B, E] int32
    dst_j = jnp.asarray(dst_np)

    x = jnp.asarray(rng.normal(size=(B * N, F)).astype(np.float32)).astype(jnp.bfloat16)
    m = jnp.asarray(rng.normal(size=(B * E, F)).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def oh_gather(x):
        xf = x.reshape(B, N, F)
        oh = (src_j[..., None] == jnp.arange(N, dtype=src_j.dtype)).astype(x.dtype)
        return jnp.einsum("ben,bnf->bef", oh, xf).reshape(B * E, F)

    @jax.jit
    def oh_scatter(m):
        mf = m.reshape(B, E, F)
        oh = (dst_j[..., None] == jnp.arange(N, dtype=dst_j.dtype)).astype(m.dtype)
        return jnp.einsum(
            "ben,bef->bnf", oh, mf,
            preferred_element_type=jnp.float32,
        ).astype(m.dtype).reshape(B * N, F)

    # --- engine B: flat row gather + edge_of table ---
    base = (np.arange(B, dtype=np.int32) * N)[:, None]
    src_flat = jnp.asarray((src + base).reshape(-1))
    dst_flat = jnp.asarray((dst_np + base).reshape(-1))
    # edge_of[b, n, k] -> flat edge id, sentinel B*E
    edge_of = np.full((B, N, K), B * E, np.int32)
    fill = np.zeros((B, N), np.int32)
    for b in range(B):
        for e in range(E):
            d = dst_np[b, e]
            edge_of[b, d, fill[b, d]] = b * E + e
            fill[b, d] += 1
    edge_of = jnp.asarray(edge_of.reshape(B * N, K))

    @jax.jit
    def tk_gather(x):
        return jnp.take(x, src_flat, axis=0)

    @jax.jit
    def tk_scatter(m):
        mp = jnp.concatenate([m, jnp.zeros((1, F), m.dtype)], axis=0)
        g = jnp.take(mp, edge_of.reshape(-1), axis=0).reshape(B * N, K, F)
        return jnp.sum(g.astype(jnp.float32), axis=1).astype(m.dtype)

    @jax.jit
    def tk_scatter_segsum(m):
        return jax.ops.segment_sum(m, dst_flat, num_segments=B * N)

    # softmax variants
    H = 7
    lg = jnp.asarray(rng.normal(size=(B * E, H)).astype(np.float32))
    maskj = jnp.asarray(mask)

    @jax.jit
    def oh_softmax(lg):
        l2 = lg.reshape(B, E, H)
        gmax = jnp.max(jnp.where(maskj[..., None], l2, -1e30), axis=1, keepdims=True)
        e = jnp.exp(l2 - gmax) * maskj[..., None]
        oh = (dst_j[..., None] == jnp.arange(N, dtype=dst_j.dtype)).astype(e.dtype)
        denom = jnp.einsum("ben,beh->bnh", oh, e)
        denom_e = jnp.einsum("ben,bnh->beh", oh, denom)
        return (e / jnp.maximum(denom_e, 1e-16)).reshape(B * E, H)

    @jax.jit
    def tk_softmax(lg):
        lp = jnp.concatenate([lg, jnp.full((1, H), -1e30, lg.dtype)], axis=0)
        g = jnp.take(lp, edge_of.reshape(-1), axis=0).reshape(B * N, K, H)
        mx = jnp.max(g, axis=1)
        dn = jnp.sum(jnp.exp(g - mx[:, None]), axis=1)
        mx_e = jnp.take(mx, dst_flat, axis=0)
        dn_e = jnp.take(dn, dst_flat, axis=0)
        return jnp.exp(lg - mx_e) / jnp.maximum(dn_e, 1e-16)

    # correctness cross-check
    a = np.asarray(oh_gather(x), np.float32)
    b_ = np.asarray(tk_gather(x), np.float32)
    assert np.allclose(a, b_), "gather mismatch"
    a = np.asarray(oh_scatter(m), np.float32)
    b_ = np.asarray(tk_scatter(m), np.float32)
    assert np.allclose(a, b_, atol=1e-2), f"scatter mismatch {np.abs(a-b_).max()}"
    # numpy reference softmax per destination
    lgn = np.asarray(lg)
    ref = np.zeros_like(lgn)
    dflat = np.asarray(dst_flat)
    for d in np.unique(dflat):
        rows = dflat == d
        z = lgn[rows] - lgn[rows].max(0)
        ref[rows] = np.exp(z) / np.exp(z).sum(0)
    sa = np.asarray(oh_softmax(lg))
    sb = np.asarray(tk_softmax(lg))
    print(
        f"softmax err vs numpy: one-hot {np.abs(sa-ref).max():.2e} "
        f"table {np.abs(sb-ref).max():.2e}",
        file=sys.stderr,
    )
    assert np.abs(sb - ref).max() < 1e-5
    print("parity OK", file=sys.stderr)

    timeit(oh_gather, x, name="gather  one-hot einsum")
    timeit(tk_gather, x, name="gather  jnp.take rows")
    timeit(oh_scatter, m, name="scatter one-hot einsum")
    timeit(tk_scatter, m, name="scatter edge_of table + sum")
    timeit(tk_scatter_segsum, m, name="scatter segment_sum (unsorted)")
    timeit(oh_softmax, lg, name="softmax one-hot (per-graph max)")
    timeit(tk_softmax, lg, name="softmax table (per-dst max)")


if __name__ == "__main__":
    main()
