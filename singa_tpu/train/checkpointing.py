"""Orbax checkpointing with save/restore symmetry.

The reference can only *save* (gated behind an unreachable ``it > 250000``,
/root/reference/train.py:244-252) and only ``gen.py`` ever restores. Here
save and restore are symmetric in the trainer, async, step-based, and carry
optimizer/scheduler/early-stop state; preemption-safe (save on SIGTERM is
wired in the loop).
"""
from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys
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
    """Snapshot the config AND the code provenance into the run dir.

    The reference copies its whole model/ source tree into every run dir
    (train.py:57-58) — good provenance, heavy artifact. We record the exact
    git commit (+dirty diffstat), package version and jax version instead:
    enough to reproduce the code state without megabytes per run."""
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, "config.yml"), "w") as f:
        yaml.safe_dump(dataclasses.asdict(cfg), f, sort_keys=False)
    with open(os.path.join(directory, "provenance.json"), "w") as f:
        json.dump(_provenance(), f, indent=1)


def _provenance() -> dict:
    import jax

    import singa_tpu

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    info: dict = {
        "singa_tpu_version": getattr(singa_tpu, "__version__", "unknown"),
        "jax_version": jax.__version__,
        "argv": sys.argv,
    }
    try:
        def _git(*args):
            return subprocess.run(
                ("git", "-C", repo) + args, capture_output=True, text=True, timeout=10
            ).stdout.strip()

        info["git_commit"] = _git("rev-parse", "HEAD")
        dirty = _git("diff", "--stat", "HEAD")
        info["git_dirty"] = dirty.splitlines()[-1] if dirty else ""
    except Exception as e:  # not a git checkout (installed package)
        info["git_commit"] = f"unavailable: {type(e).__name__}"
    return info
