"""Micro-bench: fused SO2 edge-attention kernel vs the composed XLA chain.

Times forward and fwd+bwd of the rotate -> SO2conv1 -> separable-S2 ->
SO2conv2 edge-message chain at flagship shapes on the attached device.

Usage: python tools/bench_so2_attn.py [E]
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
    E = int(pos[0]) if pos else 32 * (832 + 160)
    from singa_tpu.config import Config
    from singa_tpu.dtypes import set_compute_dtype
    from singa_tpu.equivariant import so3
    from singa_tpu.equivariant.layers import separable_s2_activation
    from singa_tpu.ops.pallas.so2_attn import _grids, so2_attn_fused

    cfg = Config()
    set_compute_dtype("bfloat16")
    ecfg = cfg.embedding
    lmax, mmax = ecfg.lmax, ecfg.mmax
    C = 2 * ecfg.sphere_channels
    H = ecfg.attn_hidden_channels
    F2 = ecfg.num_heads * ecfg.attn_value_channels
    alpha_ch = ecfg.num_heads * ecfg.attn_alpha_channels
    extra_ch = alpha_ch + H
    mapping = so3.CoefficientMapping(lmax, mmax)
    n_trunc = mapping.n_trunc
    n0 = mapping.m_size[0]
    secs = [n0] + [2 * s for s in mapping.m_size[1:]]
    print(f"device {jax.devices()[0].platform}  E={E} C={C} H={H} F2={F2}")

    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.1)
    dt = jnp.bfloat16
    x = r(E, (lmax + 1) ** 2, C).astype(dt)
    rad = (r(E, n_trunc, C) + 1.0).astype(dt)
    phi = jnp.asarray(rng.uniform(-np.pi, np.pi, E).astype(np.float32))
    beta = jnp.asarray(rng.uniform(0, np.pi, E).astype(np.float32))
    w1s = [
        r(rows * C, rows * H + (extra_ch if i == 0 else 0))
        for i, rows in enumerate(secs)
    ]
    b1 = r(n0 * H + extra_ch)
    w2s = [r(rows * H, rows * F2) for rows in secs]
    b2 = r(n0 * F2)
    tgj, fgj = (jnp.asarray(g) for g in _grids(lmax, mmax))
    interp = jax.default_backend() != "tpu"

    # analytic useful MACs (unpadded)
    mac1 = E * sum(
        rows * C * (rows * H + (extra_ch if i == 0 else 0))
        for i, rows in enumerate(secs)
    )
    mac2 = E * sum(rows * H * rows * F2 for rows in secs)
    G = tgj.shape[0]
    mac_grid = E * G * n_trunc * H * 2
    mac_rot = E * ((lmax + 1) ** 2) ** 2 * C * 2  # 4 half-size const matmuls x2 stages
    f_fwd = 2 * (mac1 + mac2 + mac_grid + mac_rot)
    print(
        f"analytic fwd: conv1 {2*mac1/1e9:.1f} conv2 {2*mac2/1e9:.1f} "
        f"grid {2*mac_grid/1e9:.1f} rot {2*mac_rot/1e9:.1f} GFLOP"
    )

    def fused(x, rad, w1s, b1, w2s, b2):
        return so2_attn_fused(
            x, rad, phi, beta, w1s, b1, w2s, b2, tgj, fgj,
            lmax, mmax, H, F2, alpha_ch, interp,
        )

    def ref(x, rad, w1s, b1, w2s, b2):
        mp = so3.rotate(
            so3.EdgeFrame(phi=phi, beta=beta), x, lmax, mmax, m_primary=True
        )
        flat = (mp * rad).reshape(E, n_trunc * C)
        off = 0
        ys = []
        for i, rows in enumerate(secs):
            y = flat[:, off : off + rows * C].astype(dt) @ w1s[i].astype(dt)
            if i == 0:
                y = y + b1
            ys.append(y)
            off += rows * C
        extra = ys[0][:, n0 * H :]
        h = jnp.concatenate(
            [ys[0][:, : n0 * H].reshape(E, n0, H)]
            + [y.reshape(E, rows, H) for y, rows in zip(ys[1:], secs[1:])],
            axis=1,
        ).astype(dt)
        gating = extra[:, alpha_ch:].astype(dt)
        mid = separable_s2_activation(gating, h, lmax, mmax, m_primary=True)
        mid_flat = mid.reshape(E, n_trunc * H)
        zs = []
        off = 0
        for i, rows in enumerate(secs):
            z = mid_flat[:, off : off + rows * H].astype(dt) @ w2s[i].astype(dt)
            if i == 0:
                z = z + b2
            zs.append(z)
            off += rows * H
        return tuple(zs) + (extra,)

    args = (x, rad, w1s, b1, w2s, b2)

    def loss(fn):
        def f(*a):
            return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in fn(*a))

        return f

    # ---- chain bisection: where does the XLA backward burn time? ----
    if "--bisect" in sys.argv:
        def rot_only(x, rad, w1s, b1, w2s, b2):
            mp = so3.rotate(
                so3.EdgeFrame(phi=phi, beta=beta), x, lmax, mmax, m_primary=True
            )
            return (mp * rad,)

        def thru_conv1(x, rad, w1s, b1, w2s, b2):
            mp = so3.rotate(
                so3.EdgeFrame(phi=phi, beta=beta), x, lmax, mmax, m_primary=True
            )
            flat = (mp * rad).reshape(E, n_trunc * C)
            off = 0
            ys = []
            for i, rows in enumerate(secs):
                y = flat[:, off : off + rows * C].astype(dt) @ w1s[i].astype(dt)
                if i == 0:
                    y = y + b1
                ys.append(y)
                off += rows * C
            return tuple(ys)

        def thru_s2(x, rad, w1s, b1, w2s, b2):
            ys = thru_conv1(x, rad, w1s, b1, w2s, b2)
            extra = ys[0][:, n0 * H :]
            h = jnp.concatenate(
                [ys[0][:, : n0 * H].reshape(E, n0, H)]
                + [y.reshape(E, rows, H) for y, rows in zip(ys[1:], secs[1:])],
                axis=1,
            ).astype(dt)
            gating = extra[:, alpha_ch:].astype(dt)
            mid = separable_s2_activation(gating, h, lmax, mmax, m_primary=True)
            return (mid, extra)

        for nm, f in [("rot", rot_only), ("conv1", thru_conv1), ("s2", thru_s2)]:
            bench(f"xla {nm} fwd", loss(f), *args)
            bench(
                f"xla {nm} fwd+bwd",
                lambda *a, f=f: jax.grad(loss(f), argnums=(0, 1))(*a),
                *args,
            )

    bench("fused fwd", loss(fused), *args, flops=f_fwd)
    bench("xla   fwd", loss(ref), *args, flops=f_fwd)
    def gradsum(fn):
        # reduce grads to one scalar INSIDE jit so the harness's value fetch
        # doesn't pull ~150 MB of gradient over the axon tunnel
        def f(*a):
            gx, gr = jax.grad(loss(fn), argnums=(0, 1))(*a)
            return jnp.sum(gx.astype(jnp.float32)) + jnp.sum(gr.astype(jnp.float32))

        return f

    bench(
        "fused fwd+bwd",
        lambda *a: jax.grad(loss(fused), argnums=(0, 1))(*a),
        *args,
        flops=3 * f_fwd,
    )
    bench(
        "xla   fwd+bwd",
        lambda *a: jax.grad(loss(ref), argnums=(0, 1))(*a),
        *args,
        flops=3 * f_fwd,
    )
    bench("fused fwd+bwd scalar", gradsum(fused), *args, flops=3 * f_fwd)
    bench("xla   fwd+bwd scalar", gradsum(ref), *args, flops=3 * f_fwd)


if __name__ == "__main__":
    main()
