"""Checkpoint surgery: partial parameter loads and variable skipping.

The reference exposes ``--init_model_partial`` / ``--load_model_skip_var`` /
``--use_chkpt_hparams`` on its launcher (SPIRAL/run_spiral.py:45-47); the
load machinery they modulate is the state_dict merge of
``ModelPT.load_state_from_checkpoint`` (nemo/core/classes/modelPT.py:605-631,
``strict`` flag).  Here the same semantics act on flax parameter pytrees
addressed by '/'-joined key paths:

- ``partial=False`` (the reference's ``strict=True``): every target leaf must
  be found in the source with a matching shape, or the load fails loudly.
- ``partial=True``: leaves present in both trees with matching shapes are
  loaded; everything else keeps its freshly-initialized value, and the
  report says exactly what happened.
- ``skip``: substring patterns; any target path containing one is left at
  its current value even if the source provides it (the reference's
  ``load_model_skip_var``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Mapping, Sequence, Tuple

import jax.numpy as jnp


@dataclasses.dataclass
class SurgeryReport:
    loaded: List[str] = dataclasses.field(default_factory=list)
    skipped: List[str] = dataclasses.field(default_factory=list)
    missing: List[str] = dataclasses.field(default_factory=list)
    mismatched: List[str] = dataclasses.field(default_factory=list)
    unexpected: List[str] = dataclasses.field(default_factory=list)

    def summary(self) -> str:
        return (
            f"loaded {len(self.loaded)} vars"
            + (f", skipped {len(self.skipped)}" if self.skipped else "")
            + (f", kept-at-init {len(self.missing)}" if self.missing else "")
            + (f", shape-mismatch {len(self.mismatched)}"
               if self.mismatched else "")
            + (f", unexpected-in-ckpt {len(self.unexpected)}"
               if self.unexpected else "")
        )


def flatten_paths(tree: Any, prefix: str = "") -> dict:
    """Nested mapping -> {'a/b/c': leaf} (flax param addressing)."""
    out = {}
    if isinstance(tree, Mapping):
        for k in tree:
            out.update(flatten_paths(tree[k], f"{prefix}{k}/"))
        return out
    out[prefix[:-1]] = tree
    return out


def unflatten_paths(flat: Mapping[str, Any]) -> dict:
    out: dict = {}
    for path, leaf in flat.items():
        node = out
        keys = path.split("/")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = leaf
    return out


def merge_params(
    target: Any,
    source: Any,
    partial: bool = False,
    skip: Sequence[str] = (),
) -> Tuple[dict, SurgeryReport]:
    """Merge ``source`` leaves into ``target`` by path; see module doc."""
    tgt = flatten_paths(target)
    src = flatten_paths(source)
    patterns = tuple(p for p in skip if p)
    report = SurgeryReport()
    merged = {}
    for path, tval in tgt.items():
        if any(p in path for p in patterns):
            report.skipped.append(path)
            merged[path] = tval
            continue
        sval = src.get(path)
        if sval is None:
            report.missing.append(path)
            merged[path] = tval
            continue
        s_shape = tuple(getattr(sval, "shape", ()))
        t_shape = tuple(getattr(tval, "shape", ()))
        if s_shape != t_shape:
            report.mismatched.append(f"{path} ckpt{s_shape} != model{t_shape}")
            merged[path] = tval
            continue
        merged[path] = jnp.asarray(sval)
        report.loaded.append(path)
    report.unexpected = sorted(set(src) - set(tgt))
    if not partial and (report.missing or report.mismatched):
        raise ValueError(
            "strict checkpoint load failed (pass --init_model_partial=true "
            "to allow a partial load): "
            f"missing={report.missing[:8]} mismatched={report.mismatched[:8]}"
        )
    return unflatten_paths(merged), report


def parse_skip_vars(spec: str) -> Tuple[str, ...]:
    """The reference's --load_model_skip_var string -> substring patterns
    (comma-separated; empty entries dropped)."""
    return tuple(s.strip() for s in spec.split(",") if s.strip())
