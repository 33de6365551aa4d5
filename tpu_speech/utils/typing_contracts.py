"""Runtime shape/dtype contracts (the reference's NeuralType analog).

NeMo declares typed input/output ports checked at call time
(SPIRAL/nemo/core/classes/common.py Typing/typecheck;
core/neural_types/*). The TPU-native analog: lightweight axis-spec
assertions that work on concrete arrays AND inside jit traces (shapes are
static under tracing), with named axes checked for consistency.

Spec syntax: a string per argument, e.g. "B T F" (named axes), "B T 80"
(literal sizes), "B * C" ('*' = any). Same name must match across arguments.
"""

from __future__ import annotations

import functools
import inspect
from typing import Dict, Optional


class TypecheckError(TypeError):
    pass


def _check(spec: str, shape, name: str, bindings: Dict[str, int]):
    dims = spec.split()
    if len(dims) != len(shape):
        raise TypecheckError(
            f"{name}: expected rank {len(dims)} ({spec!r}), got shape {tuple(shape)}"
        )
    for d, s in zip(dims, shape):
        if d == "*":
            continue
        if d.isdigit():
            if int(d) != s:
                raise TypecheckError(
                    f"{name}: axis {d} expected, got {s} (shape {tuple(shape)})"
                )
        else:
            if d in bindings and bindings[d] != s:
                raise TypecheckError(
                    f"{name}: axis '{d}'={s} conflicts with previous "
                    f"'{d}'={bindings[d]}"
                )
            bindings[d] = s


def typecheck(_fn=None, /, **specs: str):
    """Decorator asserting axis specs on named arguments.

    @typecheck(x="B T F", lengths="B")
    def forward(x, lengths): ...
    """

    def wrap(fn):
        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def inner(*args, **kwargs):
            bound = sig.bind(*args, **kwargs)
            bindings: Dict[str, int] = {}
            for arg_name, spec in specs.items():
                if arg_name not in bound.arguments:
                    continue
                val = bound.arguments[arg_name]
                if val is None:
                    continue
                shape = getattr(val, "shape", None)
                if shape is None:
                    raise TypecheckError(f"{arg_name}: not an array")
                _check(spec, shape, arg_name, bindings)
            return fn(*args, **kwargs)

        return inner

    if _fn is not None:
        raise TypeError("use @typecheck(arg='B T F') with keyword specs")
    return wrap
