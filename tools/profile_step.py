"""Per-op timing of the training step at flagship shapes, on real hardware.

Times each hot sub-computation (fwd+bwd where meaningful) in ONE process with
AOT-compiled calls and forced value fetches, so numbers are comparable and the
tunnel's eager-compile overhead never pollutes them. This is the
profile-based attribution backing DESIGN.md's perf log.

Usage: python tools/profile_step.py [batch_size] [section ...]
  sections: step embed cpromg micro   (default: all)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(name, fn, *args, iters=10, flops=None):
    fn = jax.jit(fn)
    compiled = fn.lower(*args).compile()
    cost = compiled.cost_analysis()
    xla_flops = float(cost.get("flops", 0.0)) if cost else 0.0
    out = compiled(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = compiled(*args)
    # force a value fetch (block_until_ready alone under-reports on axon)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.time() - t0) / iters
    f = flops if flops is not None else xla_flops
    eff = f / dt / 197e12 if f else 0.0
    print(
        f"{name:42s} {dt*1e3:9.2f} ms  {f/1e12:7.3f} TF  mfu {eff:5.1%}",
        flush=True,
    )
    return dt


def grad_of(loss_fn):
    """value_and_grad with the gradients kept LIVE via a scalar reduction.

    Returning only the value (or fetching big gradient arrays) both mislead:
    unused grads are dead-code-eliminated by XLA (the bwd never runs), while
    fetching full gradients pulls 100+ MB over the axon tunnel (~250 ms of
    pure transfer, discovered round 3). Reduce grads to one scalar inside jit.
    """

    def f(*args):
        v, g = jax.value_and_grad(loss_fn)(*args)
        gs = sum(jnp.sum(leaf.astype(jnp.float32) ** 2) for leaf in jax.tree_util.tree_leaves(g))
        return v + 0.0 * gs

    return lambda *a: (f(*a),)


def main():
    batch_size = 32
    args = sys.argv[1:]
    if args and args[0].isdigit():
        batch_size = int(args.pop(0))
    sections = set(args) or {"step", "embed", "cpromg", "micro"}

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from singa_tpu.config import Config
    from singa_tpu.data.batch import synthetic_batch
    from singa_tpu.dtypes import set_compute_dtype
    from singa_tpu.models.singa import SINGA, cross_entropy_loss

    cfg = Config()
    set_compute_dtype(cfg.train.compute_dtype)
    batch = synthetic_batch(
        0, batch_size=batch_size, shapes=cfg.shapes, tgt_len=cfg.model.decoder.tgt_len
    )
    print(f"devices: {jax.devices()}  batch {batch_size}", flush=True)

    ecfg = cfg.embedding
    B = batch_size
    n_c = cfg.shapes.num_protein_nodes + cfg.shapes.num_ligand_nodes
    E_intra = B * (cfg.shapes.num_pp_edges + cfg.shapes.num_ll_edges)
    key = jax.random.PRNGKey(0)

    if "step" in sections or "embed" in sections or "cpromg" in sections:
        model = SINGA(cfg)
        params = jax.jit(model.init)(key, batch)

    if "step" in sections:
        def loss(p, b):
            return cross_entropy_loss(model.apply(p, b), b.tokens.target)

        bench("full fwd", lambda p, b: loss(p, b), params, batch)
        bench(
            "full fwd+bwd",
            lambda p, b: grad_of(lambda q: loss(q, b))(p)[0],
            params,
            batch,
        )

    if "embed" in sections:
        from singa_tpu.equivariant.embedding import EquivariantEmbedding

        emb = EquivariantEmbedding(ecfg)
        eparams = {"params": params["params"]["embedding"]}

        def eloss(p, b):
            out = emb.apply(p, b)
            return jnp.sum(out.protein.astype(jnp.float32) ** 2) + jnp.sum(
                out.ligand.astype(jnp.float32) ** 2
            )

        bench("embedding fwd", eloss, eparams, batch)
        bench(
            "embedding fwd+bwd",
            lambda p, b: grad_of(lambda q: eloss(q, b))(p)[0],
            eparams,
            batch,
        )

    if "cpromg" in sections:
        from singa_tpu.models.cpromg import CProMGTransformer
        from singa_tpu.config import PAD_TOKEN

        tr = CProMGTransformer(cfg.model, pad_token=PAD_TOKEN)
        feat = jax.random.normal(
            key, (B, cfg.shapes.num_protein_nodes, 784), jnp.bfloat16
        )
        lfeat = jax.random.normal(
            key, (B, cfg.shapes.num_ligand_nodes, 784), jnp.bfloat16
        )
        prop = jnp.ones((B, 3), jnp.float32)
        targs = (
            feat, batch.protein.pos, batch.protein.mask, batch.protein.lap_pe,
            batch.tokens.input,
            lfeat, batch.ligand.pos, batch.ligand.mask, batch.ligand.lap_pe,
            prop,
        )
        tparams = jax.jit(tr.init)(key, *targs)

        def tloss(p):
            return jnp.sum(tr.apply(p, *targs).astype(jnp.float32) ** 2)

        bench("cpromg fwd", tloss, tparams)
        bench("cpromg fwd+bwd", lambda p: grad_of(tloss)(p)[0], tparams)

    if "micro" in sections:
        from singa_tpu.equivariant import so3
        from singa_tpu.equivariant.grid import get_grid
        from singa_tpu.equivariant.layers import SO2Conv
        from singa_tpu.ops.neighbors import EdgeEngine, build_dst_table

        E = E_intra
        C = ecfg.sphere_channels
        H = ecfg.attn_hidden_channels
        lmax, mmax = ecfg.lmax, ecfg.mmax
        n_full = so3.num_coeffs(lmax)
        n_tr = so3.num_coeffs_trunc(lmax, mmax)
        dt = jnp.bfloat16

        # SO2 conv 1 (2C -> H with radial + extra) and 2 (H -> 112)
        x1 = jax.random.normal(key, (E, n_tr, 2 * C), dt)
        xe = jax.random.normal(key, (E, 3 * ecfg.edge_channels), dt)
        conv1 = SO2Conv(
            features=H, lmax=lmax, mmax=mmax,
            edge_channels=(ecfg.edge_channels, ecfg.edge_channels),
            extra_m0_features=ecfg.num_heads * ecfg.attn_alpha_channels + H,
        )
        p1 = conv1.init(key, x1, xe)
        mac1 = E * (224 * 1248 + 384 * 1536 + 320 * 1280)

        def c1loss(p):
            o, e = conv1.apply(p, x1, xe)
            return jnp.sum(o.astype(jnp.float32) ** 2) + jnp.sum(
                e.astype(jnp.float32) ** 2
            )

        bench("so2conv1 fwd", c1loss, p1, flops=2 * mac1)
        bench("so2conv1 fwd+bwd", lambda p: grad_of(c1loss)(p)[0], p1, flops=6 * mac1)

        x2 = jax.random.normal(key, (E, n_tr, H), dt)
        conv2 = SO2Conv(features=112, lmax=lmax, mmax=mmax)
        p2 = conv2.init(key, x2)
        mac2 = E * (896 * 784 + 1536 * 1344 + 1280 * 1120)

        def c2loss(p):
            return jnp.sum(conv2.apply(p, x2).astype(jnp.float32) ** 2)

        bench("so2conv2 fwd", c2loss, p2, flops=2 * mac2)
        bench("so2conv2 fwd+bwd", lambda p: grad_of(c2loss)(p)[0], p2, flops=6 * mac2)

        # S2 activations: attention-resolution on edges, full-res on nodes (FFN)
        ga = get_grid(lmax, mmax)
        gm = jnp.asarray(ga.to_grid_mat, dt)
        xg = jax.random.normal(key, (E, n_tr, H), dt)
        G_a = ga.to_grid_mat.shape[0] * ga.to_grid_mat.shape[1]
        f_attn = 2 * E * G_a * n_tr * H * 2

        def s2a(x):
            return jnp.sum(ga.from_grid(jax.nn.silu(ga.to_grid(x))).astype(jnp.float32) ** 2)

        bench("s2 act (attn res) fwd", s2a, xg, flops=f_attn)
        bench(
            "s2 act (attn res) fwd+bwd",
            lambda x: jax.value_and_grad(s2a)(x)[0], xg, flops=3 * f_attn,
        )

        gf = get_grid(lmax, lmax)
        N_nodes = B * n_c
        xf = jax.random.normal(key, (N_nodes, n_full, ecfg.ffn_hidden_channels), dt)
        G_f = gf.to_grid_mat.shape[0] * gf.to_grid_mat.shape[1]
        f_ffn = 2 * N_nodes * G_f * n_full * ecfg.ffn_hidden_channels * 2

        def s2f(x):
            return jnp.sum(gf.from_grid(jax.nn.silu(gf.to_grid(x))).astype(jnp.float32) ** 2)

        bench("s2 act (ffn res) fwd", s2f, xf, flops=f_ffn)
        bench(
            "s2 act (ffn res) fwd+bwd",
            lambda x: jax.value_and_grad(s2f)(x)[0], xf, flops=3 * f_ffn,
        )

        # rotations
        vec = jax.random.normal(key, (E, 3), jnp.float32)
        wig = so3.edge_wigner(vec, lmax, mmax)
        xr = jax.random.normal(key, (E, n_full, 2 * C), dt)

        def rot(x):
            return jnp.sum(so3.rotate(wig, x, lmax, mmax).astype(jnp.float32) ** 2)

        bench("rotate fwd", rot, xr)
        xri = jax.random.normal(key, (E, n_tr, C), dt)

        def roti(x):
            return jnp.sum(so3.rotate_inv(wig, x, lmax, mmax).astype(jnp.float32) ** 2)

        bench("rotate_inv fwd", roti, xri)
        bench("edge_wigner fwd", lambda v: jax.tree_util.tree_map(jnp.sum, so3.edge_wigner(v, lmax, mmax)), vec)

        # gather / scatter / softmax at intra shapes
        Epg = cfg.shapes.num_pp_edges + cfg.shapes.num_ll_edges
        rng = np.random.default_rng(0)
        idx = rng.integers(0, n_c, (B, Epg, 2), dtype=np.int32)
        msk = np.ones((B, Epg), bool)
        tbl, kept, _ = build_dst_table(
            idx[..., 1], msk, n_c, cfg.shapes.max_in_degree_intra
        )
        eng = EdgeEngine.create(
            jnp.asarray(idx), jnp.asarray(kept), jnp.asarray(tbl), n_c, n_c
        )
        xn = jax.random.normal(key, (B * n_c, n_full, C), dt)
        xe2 = jax.random.normal(key, (E, n_full, C), dt)
        lg = jax.random.normal(key, (E, ecfg.num_heads), jnp.float32)

        bench("gather_src fwd", lambda x: jnp.sum(eng.gather_src(x).astype(jnp.float32)), xn)
        bench("scatter_dst fwd", lambda x: jnp.sum(eng.scatter_dst(x).astype(jnp.float32)), xe2)
        bench(
            "scatter_dst fwd+bwd",
            lambda x: jax.value_and_grad(
                lambda y: jnp.sum(eng.scatter_dst(y).astype(jnp.float32) ** 2)
            )(x)[0],
            xe2,
        )
        bench("softmax_dst fwd", lambda l: jnp.sum(eng.softmax_dst(l)), lg)


if __name__ == "__main__":
    main()
