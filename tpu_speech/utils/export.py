"""Model export: serialized StableHLO artifacts via jax.export.

TPU-native analog of the reference's ONNX/TorchScript ``Exportable`` mixin
(SPIRAL/nemo/core/classes/exportable.py): a jitted inference function is
lowered once and serialized as a portable StableHLO artifact that any JAX
runtime (or an XLA-based server) can load and execute without the Python
model definition.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
from jax import export as jexport


def export_fn(fn: Callable, example_args: Sequence[Any], path: str,
              platforms: Sequence[str] = ("tpu", "cpu")) -> None:
    """Lower ``jax.jit(fn)`` at the example arguments and serialize."""
    exported = jexport.export(
        jax.jit(fn), platforms=tuple(platforms)
    )(*example_args)
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_exported(path: str):
    """Deserialize an exported artifact; returns an object with ``.call``."""
    with open(path, "rb") as f:
        return jexport.deserialize(bytearray(f.read()))
