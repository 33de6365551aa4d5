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


# one async orbax checkpointer per directory: a second Checkpointer on the
# same dir (e.g. a resume in the same process) must see — and drain — the
# first one's in-flight write
_SHARED_CKPTRS: dict = {}


class Checkpointer:
    def __init__(self, ckpt_dir: str):
        import atexit

        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._ckptr = _SHARED_CKPTRS.get(self.ckpt_dir)
        if self._ckptr is None:
            self._ckptr = ocp.StandardCheckpointer()
            _SHARED_CKPTRS[self.ckpt_dir] = self._ckptr
            # non-blocking saves must not be dropped by process exit
            atexit.register(self._ckptr.wait_until_finished)

    def _path(self, step: int) -> str:
        return os.path.join(self.ckpt_dir, f"step_{step:010d}")

    def save(self, step: int, state: Any, blocking: bool = True):
        """blocking=False returns as soon as the host copy is snapshotted and
        overlaps the serialize/fsync with subsequent training (orbax async
        checkpointing; the write itself is atomic-rename). At most one write
        is in flight: the next save/restore drains the previous one first."""
        self._ckptr.wait_until_finished()
        path = self._path(step)
        self._ckptr.save(path, jax.device_get(state), force=True)
        if blocking:
            self._ckptr.wait_until_finished()

    def wait(self):
        """Drain any in-flight async save (call before process exit)."""
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
        self._ckptr.wait_until_finished()
        return self._ckptr.restore(self._path(step), target=jax.device_get(target))

    def restore_latest(self, target: Any) -> Optional[Any]:
        self._ckptr.wait_until_finished()  # an in-flight save may be latest
        step = self.latest_step()
        if step is None:
            return None
        return self.restore(step, target)
