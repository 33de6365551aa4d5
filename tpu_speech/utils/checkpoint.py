"""Checkpoint save/restore (orbax-backed) with latest-resume semantics.

Covers the reference's two checkpoint styles: per-epoch weight snapshots
(Grad-TTS/train.py:174-175) and resume-from-latest training state
(SPIRAL utils/exp_manager.py:279-357).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, ckpt_dir: str):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, step: int) -> str:
        return os.path.join(self.ckpt_dir, f"step_{step:010d}")

    def save(self, step: int, state: Any):
        path = self._path(step)
        self._ckptr.save(path, jax.device_get(state), force=True)
        self._ckptr.wait_until_finished()

    def all_steps(self):
        steps = []
        if not os.path.isdir(self.ckpt_dir):
            return steps
        for name in os.listdir(self.ckpt_dir):
            m = re.fullmatch(r"step_(\d+)", name)
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def restore(self, step: int, target: Any) -> Any:
        return self._ckptr.restore(self._path(step), target=jax.device_get(target))

    def restore_latest(self, target: Any) -> Optional[Any]:
        step = self.latest_step()
        if step is None:
            return None
        return self.restore(step, target)
