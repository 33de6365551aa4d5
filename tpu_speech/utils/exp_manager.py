"""Experiment manager: versioned log dirs, environment capture, resume.

Equivalent of SPIRAL/nemo/utils/exp_manager.py:105-604: creates the
experiment directory (explicit or name/version), snapshots the git hash +
diff and the config, wires TensorBoard, and locates resume checkpoints.
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import time
from typing import Any, Optional


def _git(cmd, cwd):
    try:
        return subprocess.run(
            ["git"] + cmd, cwd=cwd, capture_output=True, text=True, timeout=10
        ).stdout.strip()
    except Exception:
        return ""


class ExpManager:
    def __init__(
        self,
        name: str = "exp",
        base_dir: str = "experiments",
        explicit_log_dir: Optional[str] = None,
        resume_if_exists: bool = True,
        tensorboard_dir: Optional[str] = None,
    ):
        if explicit_log_dir:
            self.log_dir = explicit_log_dir
        else:
            version = 0
            while os.path.exists(os.path.join(base_dir, name, f"run_{version}")):
                version += 1
            if resume_if_exists and version > 0:
                version -= 1
            self.log_dir = os.path.join(base_dir, name, f"run_{version}")
        os.makedirs(self.log_dir, exist_ok=True)
        self.ckpt_dir = os.path.join(self.log_dir, "ckpt")
        self._capture_environment()
        try:
            from tensorboardX import SummaryWriter

            # --tensorboard_dir (reference run_spiral.py:31) splits TB events
            # away from the run dir when set
            self.tb = SummaryWriter(tensorboard_dir or self.log_dir)
        except Exception:
            self.tb = None

    def _capture_environment(self):
        """Record git hash/diff + launch env (exp_manager.py:458-489)."""
        repo = os.getcwd()
        info = {
            "time": time.strftime("%Y-%m-%d %H:%M:%S"),
            "git_hash": _git(["rev-parse", "HEAD"], repo),
            "git_branch": _git(["rev-parse", "--abbrev-ref", "HEAD"], repo),
            "cwd": repo,
        }
        with open(os.path.join(self.log_dir, "env.json"), "w") as f:
            json.dump(info, f, indent=2)
        diff = _git(["diff", "HEAD"], repo)
        if diff:
            with open(os.path.join(self.log_dir, "git-diff.patch"), "w") as f:
                f.write(diff)

    def save_config(self, cfg: Any):
        def enc(o):
            if dataclasses.is_dataclass(o):
                return dataclasses.asdict(o)
            return str(o)

        with open(os.path.join(self.log_dir, "config.json"), "w") as f:
            json.dump(cfg, f, indent=2, default=enc)

    def log_scalar(self, tag: str, value: float, step: int):
        if self.tb is not None:
            self.tb.add_scalar(tag, value, step)

    def append_log(self, msg: str):
        with open(os.path.join(self.log_dir, "train.log"), "a") as f:
            f.write(msg if msg.endswith("\n") else msg + "\n")
