"""Benchmark: SINGA training throughput (graphs/sec/chip) on real hardware.

Prints ONE JSON line:
  {"metric": "train_graphs_per_sec_per_chip", "value": N, "unit": "graphs/s",
   "vs_baseline": N / 5000, "mfu": ..., "step_ms": ..., "tflops": ...}
(North-star target: >= 5000 graphs/sec/chip, /root/repo/BASELINE.json.)

Usage: python bench.py [batch_size] [--profile DIR] [--data DIR / --synthetic]
  --profile writes a jax.profiler trace for the timed steps to DIR.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp
import numpy as np
import optax

# peak bf16 matmul throughput of the attached chip (TPU v5 lite ~197 TFLOP/s)
PEAK_FLOPS = 197e12


def main():
    # persistent compile cache: repeat runs skip the ~3 min XLA compiles
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    from singa_tpu.config import Config
    from singa_tpu.data.batch import synthetic_batch
    from singa_tpu.dtypes import set_compute_dtype
    from singa_tpu.models.singa import SINGA, cross_entropy_loss
    from singa_tpu.train.optim import make_optimizer

    # positional args = tokens that are neither --flags nor a --flag's value
    _VALUED_FLAGS = {
        "--profile", "--lmax", "--ffn", "--enc-remat", "--remat", "--accum",
        "--data",
    }
    args = []
    skip = False
    for a in sys.argv[1:]:
        if skip:
            skip = False
            continue
        if a.startswith("--"):
            skip = a in _VALUED_FLAGS
            continue
        args.append(a)
    batch_size = int(args[0]) if args else 32
    profile_dir = None
    if "--profile" in sys.argv:
        profile_dir = sys.argv[sys.argv.index("--profile") + 1]

    cfg = Config()
    if "--lmax" in sys.argv:
        # the reference's headline training recipe (BASELINE configs[3]) is
        # lmax=4; bench it with `python bench.py 64 --lmax 4`
        import dataclasses

        lmax = int(sys.argv[sys.argv.index("--lmax") + 1])
        cfg = dataclasses.replace(
            cfg,
            embedding=dataclasses.replace(cfg.embedding, lmax=lmax),
            model=dataclasses.replace(
                cfg.model,
                featurizer_feat_dim=(lmax + 1) ** 2 * cfg.embedding.sphere_channels,
            ),
        )
    if "--ffn" in sys.argv:
        # FFN activation recipe A/B: s2 (default) | gate | grid
        import dataclasses

        act = sys.argv[sys.argv.index("--ffn") + 1]
        cfg = dataclasses.replace(
            cfg, embedding=dataclasses.replace(cfg.embedding, ffn_activation=act)
        )
    if "--enc-remat" in sys.argv:
        import dataclasses

        er = sys.argv[sys.argv.index("--enc-remat") + 1]
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model, encoder=dataclasses.replace(cfg.model.encoder, remat=er)
            ),
        )
    if "--remat" in sys.argv:
        # A/B the embedding remat policy: off|full|dots|s2|s2x
        import dataclasses

        pol = sys.argv[sys.argv.index("--remat") + 1]
        emb = (
            dataclasses.replace(cfg.embedding, remat=False)
            if pol == "off"
            else dataclasses.replace(cfg.embedding, remat_policy=pol)
        )
        cfg = dataclasses.replace(cfg, embedding=emb)
    elif batch_size <= 32 or cfg.embedding.lmax <= 4:
        # measured round 3: with the fused FFN kernel the batch-32 backward
        # fits WITHOUT embedding remat (the wide FFN tensors never hit HBM)
        # and runs ~2.5% faster; round 5: the lmax-4 recipe at batch 64
        # also fits remat-free with the gate kernel and runs 7.8% faster
        # (137.8 vs 127.9 graphs/s). Remat stays on for lmax-6 batch>32.
        import dataclasses

        cfg = dataclasses.replace(
            cfg, embedding=dataclasses.replace(cfg.embedding, remat=False)
        )
    set_compute_dtype(cfg.train.compute_dtype)
    # batches run MONOLITHICALLY by default: the round-2 OOM rationale (the
    # dense encoder's [B, N, N, De] pair tensors) is stale since the
    # neighbor-form encoders + fused kernels landed — batch 64 fits on the
    # 16 GB chip. `--accum 32` restores microbatch accumulation (identical
    # optimizer update, bounded memory) for larger batches.
    micro = batch_size
    if "--accum" in sys.argv:
        micro = min(batch_size, int(sys.argv[sys.argv.index("--accum") + 1]))
    n_micro = batch_size // micro
    assert batch_size % micro == 0
    # The official bench exercises the REAL input pipeline (npz load +
    # collate + Prefetcher + device_put) whenever a corpus is available
    # (VERDICT r4 #9): `--data <dir>` names one explicitly, otherwise
    # data/corpus next to this script is used when present. `--synthetic`
    # forces the resident-synthetic-batch variant. The timed loop below
    # pulls a fresh batch from the prefetch queue every step, so any
    # host-pipeline stall shows up in graphs/s.
    data_stream = None
    root = None
    if "--data" in sys.argv:
        root = sys.argv[sys.argv.index("--data") + 1]
    elif "--synthetic" not in sys.argv:
        default_root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "corpus")
        if os.path.isdir(os.path.join(default_root, "train")):
            root = default_root
    if root is not None:
        from singa_tpu.data.dataset import NpzDataset
        from singa_tpu.data.pipeline import Prefetcher

        train_dir = os.path.join(root, "train")
        if not os.path.isdir(train_dir):
            train_dir = root
        ds = NpzDataset(train_dir, batch_size)
        # The AOT-compiled step below supports exactly one padding bucket per
        # run: every file must share one shape signature. A mixed-bucket dir
        # (tools/make_dataset.py --bucket output) would otherwise die in
        # np.stack / at the compiled() call with an opaque shape error.
        sigs = {}
        for path in ds.files:
            with np.load(path) as z:
                sigs.setdefault((z["protein.x"].shape[0], z["pp.index"].shape[0]), path)
        if len(sigs) > 1:
            raise SystemExit(
                f"bench.py --data: {train_dir} holds {len(sigs)} padding buckets "
                f"{sorted(sigs)}; the AOT-compiled bench step supports one bucket "
                "per run — point --data at a single-bucket directory (e.g. one "
                "bucket subdir), or use --synthetic. Mixed-bucket training goes "
                "through singa_tpu.train.loop (BucketedNpzDataset)."
            )
        data_stream = iter(Prefetcher(ds, depth=2, device_put_fn=jax.device_put))
        batch = next(data_stream)
    else:
        batch = synthetic_batch(
            0, batch_size=batch_size, shapes=cfg.shapes, tgt_len=cfg.model.decoder.tgt_len
        )
    model = SINGA(cfg)
    optimizer = make_optimizer(cfg.train.optimizer)

    print(f"devices: {jax.devices()}", file=sys.stderr)
    t0 = time.time()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
    print(f"init {time.time()-t0:.1f}s params {n_params/1e6:.2f}M", file=sys.stderr)
    opt_state = optimizer.init(params)

    # donate params/opt_state: without donation XLA keeps the old and new
    # parameter trees live across the update (extra HBM + copy traffic);
    # train/loop.py:154 already donates — keep the bench step identical
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch):
        def loss_fn(p, mb):
            return cross_entropy_loss(model.apply(p, mb), mb.tokens.target)

        if n_micro == 1:
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        else:
            mbs = jax.tree_util.tree_map(
                lambda a: a.reshape((n_micro, micro) + a.shape[1:]), batch
            )

            def body(carry, mb):
                acc_loss, acc_g = carry
                l, g = jax.value_and_grad(loss_fn)(params, mb)
                acc_g = jax.tree_util.tree_map(jnp.add, acc_g, g)
                return (acc_loss + l, acc_g), None

            init = (
                jnp.zeros((), jnp.float32),
                jax.tree_util.tree_map(jnp.zeros_like, params),
            )
            (loss, grads), _ = jax.lax.scan(body, init, mbs)
            loss = loss / n_micro
            grads = jax.tree_util.tree_map(lambda g: g / n_micro, grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    t0 = time.time()
    lowered = train_step.lower(params, opt_state, batch)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    xla_flops = float(cost.get("flops", 0.0)) if cost else 0.0
    # XLA's cost analysis cannot see inside custom calls; add per-kernel
    # analytic FLOPs for the Pallas kernels. Two ledgers (round-3 honest-MFU
    # rework): `useful` counts UNPADDED algorithmic work with per-kernel
    # fwd/bwd factors; `impl` additionally counts the padding and the one-hot
    # gather matmuls the implementation actually executes, so
    # useful-vs-impl shows where structural overhead lives.
    e = cfg.embedding
    lm = e.lmax
    I_c = (lm + 1) ** 2  # true coefficient rows (49 @ lmax 6)
    P = sum(((2 * l + 1 + 7) // 8) * 8 for l in range(lm + 1))  # L-padded rows
    G = 2 * (lm + 1) * (2 * lm + 3)  # full-res S2 grid (14x15 @ lmax 6)
    H = e.ffn_hidden_channels
    C = e.sphere_channels
    # Shape terms come from the LOADED batch, not cfg.shapes: with --data the
    # npz shards define the padding bucket (e.g. a 576-protein-node bucket
    # would silently misreport MFU if cfg defaults were used here).
    bNp = int(batch.protein.x.shape[1])
    bNl = int(batch.ligand.x.shape[1])
    bEpp = int(batch.pp.index.shape[1])
    bEll = int(batch.ll.index.shape[1])
    bElp = int(batch.lp.index.shape[1])
    bEpl = int(batch.pl.index.shape[1])
    n_nodes = batch_size * (bNp + bNl)
    n_edges = batch_size * (bEpp + bEll)
    calls = 2 * e.num_layers  # passes x blocks
    # fused FFN (ops/pallas/so3_ffn.py): fwd kernel + bwd kernel (bwd
    # recomputes the forward in VMEM then runs the two transposed passes: 3x)
    ffn_fwd_u = 2 * 2 * n_nodes * I_c * G * H + 2 * 2 * n_nodes * I_c * C * H
    ffn_fwd_p = 2 * 2 * n_nodes * P * G * H + 2 * 2 * n_nodes * P * C * H
    ffn_u = calls * 4 * ffn_fwd_u
    ffn_p = calls * 4 * ffn_fwd_p
    if getattr(e, "ffn_activation", "s2") != "s2":
        # gate/grid FFN variants run in plain XLA einsums — their FLOPs are
        # already in xla_flops (and all useful); nothing hides in custom calls
        ffn_u = ffn_p = 0.0
    # s2 activation kernel on the edge chain (attention resolution, rows are
    # already unpadded): bwd recomputes to-grid then two transposed passes
    from singa_tpu.equivariant.so3 import num_coeffs_trunc

    n_tr = num_coeffs_trunc(lm, e.mmax)
    G_a = 2 * (lm + 1) * (2 * e.mmax + 1)
    s2_fwd = 2 * 2 * n_edges * n_tr * G_a * e.attn_hidden_channels
    s2_u = calls * 4 * s2_fwd
    # CProMG fused neighbor attention (ops/pallas/neighbor_attn.py): useful =
    # edge MLPs + scores/aggregation; impl adds the one-hot gather/scatter
    # matmuls (the dominant term: 2 gathers fwd, recompute + 2 scatters bwd)
    enc = cfg.model.encoder
    B, Np = batch_size, bNp
    K_nb = 2 * enc.knn
    De = enc.edge_channels
    kd = enc.key_channels // enc.num_heads
    vd = enc.hidden_channels // enc.num_heads
    Hh = enc.num_heads
    nb_mlp = 2 * B * Np * K_nb * (De * De + De * kd + De * De + De * vd)
    nb_sc = 2 * B * Np * K_nb * Hh * (kd + vd)
    nb_gather = 2 * B * Np * K_nb * Np * Hh * (kd + vd)
    nb_u = enc.num_interactions * 3 * (nb_mlp + nb_sc)
    if os.environ.get("SINGA_TPU_HYBRID_ATTN", "0") not in ("0", ""):
        # hybrid kernel: fwd gathers and the bwd re-gather ride XLA DMA
        # (bandwidth, not FLOPs); the only one-hot matmuls left are the bwd
        # dk/dv scatters — one nb_gather unit combined (dk kd-part + dv
        # vd-part contract over the same [TI*K, Np] one-hot transpose)
        nb_p = enc.num_interactions * (3 * (nb_mlp + nb_sc) + nb_gather)
    else:
        nb_p = enc.num_interactions * (3 * (nb_mlp + nb_sc) + 5 * nb_gather)
    # one-hot edge-engine matmuls (ops/neighbors.py, round 3): XLA counts
    # them (they are einsums), but they are structural data movement, not
    # algorithmic work — subtract from the useful ledger, keep in impl.
    # Per pass: 3 F=784 gathers/scatters per block (2 gathers + 1 scatter)
    # + 1 edge-degree scatter, each one fwd + one transpose matmul.
    # Hand-derived site count (advisor round-3 low finding): it deliberately
    # OMITS the small-F one-hot sites — the softmax denominator pair (H=4
    # lanes), position/z-embedding gathers (F<=64), and the edge-degree
    # radial gathers — together <2% of eo_flops at flagship shapes, so the
    # useful ledger is biased *high* (conservative: real useful-MFU can only
    # be slightly better than reported). Cross-checked once against the
    # tools/parse_profile.py einsum totals at the round-3 operating point.
    eo_flops = 0.0
    if not os.environ.get("SINGA_TPU_EDGE_TABLE"):
        n_c = bNp + bNl
        e_intra = bEpp + bEll
        e_inter = bElp + bEpl
        sites = 2 * (3 * e.num_layers + 1)  # fwd+bwd per site
        for e_cnt in (e_intra, e_inter):
            eo_flops += sites * 2 * batch_size * e_cnt * n_c * I_c * C
    useful_flops = xla_flops - eo_flops + ffn_u + s2_u + nb_u
    impl_flops = xla_flops + ffn_p + s2_u + nb_p
    step_flops = useful_flops
    params, opt_state, loss = compiled(params, opt_state, batch)
    jax.block_until_ready(loss)
    print(
        f"compile+first step {time.time()-t0:.1f}s loss={float(loss):.3f} "
        f"flops/step={step_flops/1e12:.2f} TF",
        file=sys.stderr,
    )

    iters = 20
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    t0 = time.time()
    for _ in range(iters):
        if data_stream is not None:
            batch = next(data_stream)
        params, opt_state, loss = compiled(params, opt_state, batch)
    final_loss = float(loss)  # value fetch forces completion
    dt = time.time() - t0
    if profile_dir:
        jax.profiler.stop_trace()
        print(f"profile trace written to {profile_dir}", file=sys.stderr)
    gps = batch_size * iters / dt
    step_ms = dt / iters * 1e3
    mfu = step_flops / (dt / iters) / PEAK_FLOPS if step_flops else 0.0
    mfu_impl = impl_flops / (dt / iters) / PEAK_FLOPS if impl_flops else 0.0
    print(
        f"{iters} steps in {dt:.2f}s -> {gps:.1f} graphs/s "
        f"({step_ms:.1f} ms/step, mfu {mfu:.3f}, loss {final_loss:.3f})",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "train_graphs_per_sec_per_chip",
                "value": round(gps, 2),
                "unit": "graphs/s",
                "vs_baseline": round(gps / 5000.0, 4),
                "mfu": round(mfu, 4),
                "mfu_impl": round(mfu_impl, 4),
                "step_ms": round(step_ms, 2),
                "tflops_per_step": round(step_flops / 1e12, 3),
                "tflops_per_step_impl": round(impl_flops / 1e12, 3),
                "batch_size": batch_size,
                "lmax": cfg.embedding.lmax,
                "input_pipeline": "prefetcher" if data_stream is not None else "synthetic",
            }
        )
    )


if __name__ == "__main__":
    main()
