"""Benchmark: SINGA training throughput (graphs/sec/chip) on real hardware.

Prints ONE JSON line:
  {"metric": "train_graphs_per_sec_per_chip", "value": N, "unit": "graphs/s",
   "vs_baseline": N / 5000, "mfu": ..., "step_ms": ..., "tflops": ...}
(North-star target: >= 5000 graphs/sec/chip, /root/repo/BASELINE.json.)

Usage: python bench.py [batch_size] [--profile DIR]
  --profile writes a jax.profiler trace for the timed steps to DIR.
"""
from __future__ import annotations

import json
import sys
import time

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

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch_size = int(args[0]) if args else 32
    profile_dir = None
    if "--profile" in sys.argv:
        profile_dir = sys.argv[sys.argv.index("--profile") + 1]

    cfg = Config()
    set_compute_dtype(cfg.train.compute_dtype)
    # batch sizes beyond 32 run as accumulated microbatches of 32: the dense
    # encoder's [B, N, N, De] pair tensors put the monolithic batch-64 step
    # ~2 GB over this chip's HBM; gradient accumulation yields the identical
    # optimizer update (equal-size microbatch mean) at bounded memory.
    micro = min(batch_size, 32)
    n_micro = batch_size // micro
    assert batch_size % micro == 0
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

    @jax.jit
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
    step_flops = float(cost.get("flops", 0.0)) if cost else 0.0
    # XLA's cost analysis cannot see inside custom calls; add the analytic
    # FLOPs of the Pallas kernels (dominated by the fused FFN's grid
    # transforms in the L-padded layout) so `mfu` reflects real work.
    e = cfg.embedding
    n_nodes = batch_size * (cfg.shapes.num_protein_nodes + cfg.shapes.num_ligand_nodes)
    P, G, H = 80, 210, e.ffn_hidden_channels
    ffn_fwd = 2 * 2 * n_nodes * P * G * H + 4 * n_nodes * 49 * 16 * H
    n_edges = batch_size * (
        cfg.shapes.num_pp_edges + cfg.shapes.num_ll_edges
        + cfg.shapes.num_lp_edges + cfg.shapes.num_pl_edges
    )
    s2_fwd = 2 * 2 * n_edges * 29 * 70 * e.attn_hidden_channels
    calls = 2 * e.num_layers  # passes x blocks
    # n_nodes/n_edges already cover the full batch (microbatching splits the
    # same total work across scan iterations)
    pallas_flops = calls * (ffn_fwd + s2_fwd) * 3.5  # fwd + ~2.5x bwd
    step_flops += pallas_flops
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
        params, opt_state, loss = compiled(params, opt_state, batch)
    final_loss = float(loss)  # value fetch forces completion
    dt = time.time() - t0
    if profile_dir:
        jax.profiler.stop_trace()
        print(f"profile trace written to {profile_dir}", file=sys.stderr)
    gps = batch_size * iters / dt
    step_ms = dt / iters * 1e3
    mfu = step_flops / (dt / iters) / PEAK_FLOPS if step_flops else 0.0
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
                "step_ms": round(step_ms, 2),
                "tflops_per_step": round(step_flops / 1e12, 3),
                "batch_size": batch_size,
            }
        )
    )


if __name__ == "__main__":
    main()
