"""Optimizer and LR-schedule machinery.

Ports the reference's Adam + ReduceLROnPlateau / warmup / exponential-min
schedules (/root/reference/utils/misc.py:43-125,226-272) onto optax.
The plateau controller is an explicit, checkpointable host-side state object
stepped at validation time, driving the ``learning_rate`` hyperparameter of
an ``optax.inject_hyperparams`` optimizer.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax.numpy as jnp
import optax

from singa_tpu.config import OptimizerConfig, SchedulerConfig


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    """Adam with torch-matching betas (reference train.yml:204-209)."""
    steps = []
    if cfg.max_grad_norm and cfg.max_grad_norm != float("inf"):
        steps.append(optax.clip_by_global_norm(cfg.max_grad_norm))

    @optax.inject_hyperparams
    def _adam(learning_rate):
        if cfg.weight_decay:
            return optax.adamw(
                learning_rate, b1=cfg.beta1, b2=cfg.beta2, weight_decay=cfg.weight_decay
            )
        return optax.adam(learning_rate, b1=cfg.beta1, b2=cfg.beta2)

    steps.append(_adam(cfg.lr))
    return optax.chain(*steps)


def get_learning_rate(opt_state) -> float:
    """Current LR out of the inject_hyperparams state."""
    return float(_inner(opt_state).hyperparams["learning_rate"])


def set_learning_rate(opt_state, lr: float):
    _inner(opt_state).hyperparams["learning_rate"] = jnp.asarray(
        lr, dtype=_inner(opt_state).hyperparams["learning_rate"].dtype
    )
    return opt_state


def _inner(opt_state):
    # optax.chain wraps states in a tuple; the injected one has .hyperparams
    if hasattr(opt_state, "hyperparams"):
        return opt_state
    for s in opt_state:
        if hasattr(s, "hyperparams"):
            return s
    raise ValueError("no inject_hyperparams state found")


@dataclass
class PlateauState:
    """ReduceLROnPlateau (reference misc.py:238-272 'plateau' type +
    torch semantics: factor, patience, min_lr) with optional linear warmup
    ('warmup_plateau', misc.py:43-103)."""

    cfg: SchedulerConfig
    best: float = float("inf")
    bad_epochs: int = 0
    lr: float = 0.0
    base_lr: float = 0.0

    @classmethod
    def create(cls, cfg: SchedulerConfig, base_lr: float) -> "PlateauState":
        return cls(cfg=cfg, lr=base_lr, base_lr=base_lr)

    def warmup_lr(self, step: int) -> float:
        """LR for a given step during warmup (1-indexed steps)."""
        if self.cfg.warmup_iters and step <= self.cfg.warmup_iters:
            return self.base_lr * step / self.cfg.warmup_iters
        return self.lr

    def step_schedule(self, step: int) -> "PlateauState":
        """Non-plateau schedules stepped per validation: 'expmin' decays
        exponentially toward min_lr (reference ExponentialLR_with_minLr,
        misc.py:107-125); 'plateau' is handled by step_metric."""
        if self.cfg.type not in ("expmin", "expmin_milestone"):
            return self
        new = dataclasses.replace(self)
        new.lr = max(self.lr * self.cfg.factor, self.cfg.min_lr)
        return new

    def step_metric(self, metric: float) -> "PlateauState":
        """Validation-time update; returns the new state (self is immutable-ish)."""
        new = dataclasses.replace(self)
        if metric < self.best - 1e-12:
            new.best = metric
            new.bad_epochs = 0
        else:
            new.bad_epochs = self.bad_epochs + 1
            if new.bad_epochs > self.cfg.patience:
                new.lr = max(self.lr * self.cfg.factor, self.cfg.min_lr)
                new.bad_epochs = 0
        return new

    def to_dict(self) -> dict:
        return {
            "best": self.best,
            "bad_epochs": self.bad_epochs,
            "lr": self.lr,
            "base_lr": self.base_lr,
        }

    @classmethod
    def from_dict(cls, cfg: SchedulerConfig, d: dict) -> "PlateauState":
        return cls(cfg=cfg, **d)


@dataclass
class EarlyStopping:
    """Min-mode early stopping with delta (reference utils/Stopping.py:3-42),
    and unlike the reference's loop (train.py:240-242) we actually stop."""

    patience: int = 20
    delta: float = 5e-5
    best: float = float("inf")
    counter: int = 0
    should_stop: bool = False

    def update(self, metric: float) -> bool:
        """Returns True if this metric is an improvement."""
        if metric < self.best - self.delta:
            self.best = metric
            self.counter = 0
            return True
        self.counter += 1
        if self.counter >= self.patience:
            self.should_stop = True
        return False

    def to_dict(self) -> dict:
        return {
            "patience": self.patience,
            "delta": self.delta,
            "best": self.best,
            "counter": self.counter,
            "should_stop": self.should_stop,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "EarlyStopping":
        return cls(**d)
