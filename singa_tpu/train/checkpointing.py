"""Orbax checkpointing with save/restore symmetry.

The reference can only *save* (gated behind an unreachable ``it > 250000``,
/root/reference/train.py:244-252) and only ``gen.py`` ever restores. Here
save and restore are symmetric in the trainer, async, step-based, and carry
optimizer/scheduler/early-stop state; preemption-safe (save on SIGTERM is
wired in the loop).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import orbax.checkpoint as ocp
import yaml

from singa_tpu.config import Config


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True
            ),
        )

    def save(
        self,
        step: int,
        params: Any,
        opt_state: Any,
        aux: Optional[dict] = None,
    ) -> None:
        payload = {"params": params, "opt_state": opt_state}
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(payload),
                aux=ocp.args.JsonSave(aux or {}),
            ),
        )

    def restore(self, params_like: Any, opt_state_like: Any, step: int | None = None):
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(
                    {"params": params_like, "opt_state": opt_state_like}
                ),
                aux=ocp.args.JsonRestore(),
            ),
        )
        return step, restored["state"]["params"], restored["state"]["opt_state"], restored["aux"]

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def save_config(directory: str, cfg: Config) -> None:
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, "config.yml"), "w") as f:
        yaml.safe_dump(dataclasses.asdict(cfg), f, sort_keys=False)
