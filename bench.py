"""Benchmark: SINGA training throughput (graphs/sec/chip) on real hardware.

Prints ONE JSON line:
  {"metric": "train_graphs_per_sec_per_chip", "value": N, "unit": "graphs/s",
   "vs_baseline": N / 5000}
(North-star target: >= 5000 graphs/sec/chip, /root/repo/BASELINE.json.)
"""
from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np
import optax


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

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cfg = Config()
    set_compute_dtype(cfg.train.compute_dtype)
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
        def loss_fn(p):
            return cross_entropy_loss(model.apply(p, batch), batch.tokens.target)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    t0 = time.time()
    params, opt_state, loss = train_step(params, opt_state, batch)
    jax.block_until_ready(loss)
    print(f"compile+first step {time.time()-t0:.1f}s loss={float(loss):.3f}", file=sys.stderr)

    iters = 10
    t0 = time.time()
    for _ in range(iters):
        params, opt_state, loss = train_step(params, opt_state, batch)
    final_loss = float(loss)  # value fetch forces completion
    dt = time.time() - t0
    gps = batch_size * iters / dt
    print(f"{iters} steps in {dt:.2f}s -> {gps:.1f} graphs/s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "train_graphs_per_sec_per_chip",
                "value": round(gps, 2),
                "unit": "graphs/s",
                "vs_baseline": round(gps / 5000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
