"""The training loop: jitted sharded train step, validation, plateau LR,
early stopping, checkpointing, metrics.

Re-design of /root/reference/train.py. Fixed reference quirks (SURVEY.md §7):
iterator re-creation per step (train.py:116), unreachable checkpointing
(train.py:244), early stopping that never stops (train.py:240-242), double
``set_start_method`` (train.py:62,75). New capability: data-parallel mesh
execution, preemption-safe save, resume.

CLI: python -m singa_tpu.train.loop --synthetic --max-iters 50
"""
from __future__ import annotations

import argparse
import json
import os
import signal
import time
from typing import Optional

# persistent compile cache: XLA CPU compiles of flagship shapes take tens of
# minutes on the 1-core build box; TPU first-compile is ~3 min
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from singa_tpu.config import Config, load_config
from singa_tpu.dtypes import set_compute_dtype
from singa_tpu.data.batch import ComplexBatch
from singa_tpu.data.dataset import BucketedNpzDataset, SyntheticDataset
from singa_tpu.models.singa import SINGA, cross_entropy_loss
from singa_tpu.parallel.mesh import make_mesh, param_sharding, replicate, shard_batch
from singa_tpu.train.checkpointing import CheckpointManager, save_config
from singa_tpu.train.optim import (
    EarlyStopping,
    PlateauState,
    get_learning_rate,
    make_optimizer,
    set_learning_rate,
)


class MetricsWriter:
    """JSONL metrics + optional TensorBoard (torch's writer is host-side)."""

    def __init__(self, logdir: str, tensorboard: bool = False):
        os.makedirs(logdir, exist_ok=True)
        self._f = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(logdir)
            except Exception:
                self._tb = None

    def write(self, step: int, **scalars):
        rec = {"step": step, "time": time.time(), **scalars}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, v, step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class Trainer:
    def __init__(
        self,
        config: Config,
        logdir: str = "runs/default",
        use_mesh: bool = True,
        devices=None,
    ):
        self.config = config
        self.logdir = logdir
        set_compute_dtype(config.train.compute_dtype)
        self.model = SINGA(config)
        self.optimizer = make_optimizer(config.train.optimizer)
        self.mesh = make_mesh(config.parallel, devices) if use_mesh else None
        self.metrics = MetricsWriter(logdir)
        self.ckpt = CheckpointManager(os.path.join(logdir, "checkpoints"))
        save_config(logdir, config)

        self.sched = PlateauState.create(
            config.train.scheduler, config.train.optimizer.lr
        )
        self.stopper = EarlyStopping(
            patience=config.train.early_stop_patience,
            delta=config.train.early_stop_delta,
        )
        self.step = 0
        self.params = None
        self.opt_state = None
        self._build_steps()
        self._preempted = False
        signal.signal(signal.SIGTERM, self._on_sigterm)

    # ------------- jitted steps -------------

    def _build_steps(self):
        model, optimizer = self.model, self.optimizer

        def loss_fn(params, batch: ComplexBatch):
            logits = model.apply(params, batch)
            return cross_entropy_loss(logits, batch.tokens.target)

        micro = self.config.train.microbatch

        def grads_of(params, batch):
            b = batch.batch_size
            if not micro or micro >= b:
                return jax.value_and_grad(loss_fn)(params, batch)
            # gradient accumulation: equal-size microbatches give the exact
            # same optimizer update at bounded memory (batch 64 doesn't fit
            # monolithically on one 16 GB chip; see bench.py)
            assert b % micro == 0, (b, micro)
            k = b // micro
            mbs = jax.tree_util.tree_map(
                lambda a: a.reshape((k, micro) + a.shape[1:]), batch
            )

            def body(carry, mb):
                acc_l, acc_g = carry
                l, g = jax.value_and_grad(loss_fn)(params, mb)
                return (acc_l + l, jax.tree_util.tree_map(jnp.add, acc_g, g)), None

            init = (
                jnp.zeros((), jnp.float32),
                jax.tree_util.tree_map(jnp.zeros_like, params),
            )
            (l, g), _ = jax.lax.scan(body, init, mbs)
            return l / k, jax.tree_util.tree_map(lambda x: x / k, g)

        def train_step(params, opt_state, batch):
            loss, grads = grads_of(params, batch)
            gnorm = optax.global_norm(grads)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, gnorm

        def eval_step(params, batch):
            return loss_fn(params, batch)

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self._eval_step = jax.jit(eval_step)

    # ------------- state init / resume -------------

    def init_state(self, example_batch: ComplexBatch, seed: int | None = None):
        seed = self.config.train.seed if seed is None else seed
        self.params = jax.jit(self.model.init)(
            jax.random.PRNGKey(seed), example_batch
        )
        self.opt_state = self.optimizer.init(self.params)
        if self.mesh is not None:
            p_shard = param_sharding(self.params, self.mesh)
            self.params = jax.device_put(self.params, p_shard)
            self.opt_state = replicate(self.opt_state, self.mesh)
        restored = self.ckpt.restore(self.params, self.opt_state)
        if restored is not None:
            self.step, self.params, self.opt_state, aux = restored
            self.sched = PlateauState.from_dict(
                self.config.train.scheduler, aux.get("scheduler", self.sched.to_dict())
            )
            self.stopper = EarlyStopping.from_dict(
                aux.get("early_stop", self.stopper.to_dict())
            )
        return self.step

    def num_params(self) -> int:
        return int(
            sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(self.params))
        )

    # ------------- loop -------------

    def _on_sigterm(self, *_):
        self._preempted = True

    def _put(self, batch: ComplexBatch) -> ComplexBatch:
        if self.mesh is not None:
            return shard_batch(batch, self.mesh)
        return batch

    def save(self, reason: str = "step"):
        aux = {
            "scheduler": self.sched.to_dict(),
            "early_stop": self.stopper.to_dict(),
            "reason": reason,
        }
        self.ckpt.save(self.step, self.params, self.opt_state, aux)

    def validate(self, dataset) -> float:
        losses = [
            float(self._eval_step(self.params, self._put(b)))
            for b in dataset.epoch()
        ]
        return float(np.mean(losses)) if losses else float("nan")

    def fit(
        self,
        train_data,
        val_data=None,
        test_data=None,
        max_iters: Optional[int] = None,
        log_every: int = 10,
        profile_at: Optional[int] = None,
        profile_steps: int = 5,
    ):
        """``profile_at=N`` records a jax.profiler trace of ``profile_steps``
        training steps starting at step N into ``logdir/profile``
        (SURVEY.md §5.1: the reference has no tracing at all)."""
        cfg = self.config.train
        max_iters = max_iters or cfg.max_iters
        it = iter(train_data)
        if self.params is None:
            self.init_state(next(iter(train_data)))

        t_last = time.time()
        start_step = self.step
        profiling = False
        while self.step < max_iters:
            self.step += 1
            if profile_at is not None and self.step == profile_at:
                jax.profiler.start_trace(os.path.join(self.logdir, "profile"))
                profiling = True
            if profiling and self.step == profile_at + profile_steps:
                jax.block_until_ready(self.params)
                jax.profiler.stop_trace()
                profiling = False
            # warmup handling
            lr = self.sched.warmup_lr(self.step)
            self.opt_state = set_learning_rate(self.opt_state, lr)

            batch = self._put(next(it))
            self.params, self.opt_state, loss, gnorm = self._train_step(
                self.params, self.opt_state, batch
            )

            if self.step % log_every == 0 or self.step == start_step + 1:
                loss_val = float(loss)  # forces completion of all queued steps
                dt = time.time() - t_last
                n = log_every if self.step > start_step + 1 else 1
                gps = batch.batch_size * n / max(dt, 1e-9)
                self.metrics.write(
                    self.step,
                    **{
                        "train/loss": loss_val,
                        "train/grad": float(gnorm),
                        "train/lr": get_learning_rate(self.opt_state),
                        "train/graphs_per_sec": gps,
                    },
                )
                t_last = time.time()

            if val_data is not None and (
                self.step % cfg.val_freq == 0 or self.step == max_iters
            ):
                val_loss = self.validate(val_data)
                if self.config.train.scheduler.type in ("plateau", "warmup_plateau"):
                    self.sched = self.sched.step_metric(val_loss)
                else:
                    self.sched = self.sched.step_schedule(self.step)
                improved = self.stopper.update(val_loss)
                self.metrics.write(
                    self.step, **{"val/loss": val_loss, "val/improved": int(improved)}
                )
                if self.step % cfg.ckpt_every == 0 and self.step > cfg.ckpt_after:
                    self.save()
                if test_data is not None:
                    test_loss = self.validate(test_data)
                    self.metrics.write(self.step, **{"val/loss2": test_loss})
                if self.stopper.should_stop:
                    self.metrics.write(self.step, **{"train/early_stop": 1})
                    break

            if self._preempted:
                self.save(reason="preempted")
                self.ckpt.wait()
                break

        if profiling:
            jax.block_until_ready(self.params)
            jax.profiler.stop_trace()
        self.save(reason="final")
        self.ckpt.wait()
        return float(loss)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default=None)
    ap.add_argument("--logdir", type=str, default="runs/train")
    ap.add_argument("--data", type=str, default=None, help=".npz shard directory")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--max-iters", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument(
        "--timestamped", action="store_true",
        help="append a timestamp to --logdir (reference get_new_log_dir, misc.py:168)",
    )
    ap.add_argument(
        "--profile-at", type=int, default=None,
        help="record a jax.profiler trace of 5 steps starting at this step",
    )
    args = ap.parse_args(argv)
    if args.timestamped:
        args.logdir = f"{args.logdir}_{time.strftime('%Y_%m_%d__%H_%M_%S')}"

    cfg = load_config(args.config) if args.config else Config()
    bs = args.batch_size or cfg.train.batch_size

    if args.synthetic or not args.data:
        train_data = SyntheticDataset(bs, cfg.shapes, cfg.model.decoder.tgt_len, seed=0)
        val_data = SyntheticDataset(bs, cfg.shapes, cfg.model.decoder.tgt_len, seed=100, num_distinct=2)
    else:
        from singa_tpu.data.pipeline import Prefetcher

        # bucketed: mixed pocket-size shards batch homogeneously per bucket,
        # one jit-cached executable per bucket shape (graph-size scaling,
        # SURVEY §5.7)
        train_data = BucketedNpzDataset(os.path.join(args.data, "train"), bs)
        val_dir = os.path.join(args.data, "val")
        # mini-datasets (e.g. the bundled reference complexes) carry no val
        # split; validate on train (an explicit overfit anchor)
        val_data = BucketedNpzDataset(
            val_dir if os.path.isdir(val_dir) else os.path.join(args.data, "train"),
            bs,
            shuffle=False,
        )
        # background host-side loading/stacking overlapped with device steps
        # (the reference's DataLoader(num_workers) role, train.py:13)
        train_data = Prefetcher(train_data, depth=2, device_put_fn=jax.device_put)

    trainer = Trainer(cfg, logdir=args.logdir)
    trainer.init_state(next(iter(train_data)))
    print(f"params: {trainer.num_params()/1e6:.2f}M  devices: {jax.devices()}")
    loss = trainer.fit(
        train_data, val_data, max_iters=args.max_iters, profile_at=args.profile_at
    )
    print(f"final loss: {loss:.4f}")


if __name__ == "__main__":
    main()
