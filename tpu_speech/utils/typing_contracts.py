"""Runtime shape/dtype contracts (the reference's NeuralType analog).

NeMo declares typed input/output ports checked at call time
(SPIRAL/nemo/core/classes/common.py Typing/typecheck;
core/neural_types/*). The TPU-native analog: lightweight axis-spec
assertions that work on concrete arrays AND inside jit traces (shapes and
dtypes are static under tracing), with named axes checked for consistency.

Spec syntax: a string per argument, e.g. "B T F" (named axes), "B T 80"
(literal sizes), "B * C" ('*' = any). Same name must match across arguments.

An optional trailing "@element" token tags the array's SEMANTIC element type
(the analog of NeMo's element-type lattice, core/neural_types/elements.py:
AudioSignal, MelSpectrogramType, LogprobsType, LabelsType, ...):

    @typecheck(y="B Ty F @mel", labels="B L @labels")

Element types form a small is-a lattice (ELEMENT_LATTICE) with a dtype-kind
constraint per type (floating/integer), checked at call time; use
``compare(a, b)`` for NeMo-style port-compatibility queries (SAME / LESS /
GREATER / INCOMPATIBLE, neural_types/comparison.py).
"""

from __future__ import annotations

import enum
import functools
import inspect
from typing import Dict, Optional

import numpy as np


class TypecheckError(TypeError):
    pass


# element -> (parent, required dtype kind or None)
# the lattice the repo's ports actually use — the reference's ~40-class
# hierarchy (elements.py) collapses onto these semantic groups
ELEMENT_LATTICE: Dict[str, tuple] = {
    "element": (None, None),
    "audio": ("element", "floating"),       # waveform samples
    # spectrograms are NOT subtypes of waveforms: in the reference,
    # SpectrogramType subclasses ChannelType, not AudioSignal
    # (neural_types/elements.py:180-204) — a mel port must not be
    # pluggable into a raw-audio port
    "spec": ("element", "floating"),        # generic spectrogram (SpectrogramType)
    "mel": ("spec", "floating"),            # MelSpectrogramType
    "mfcc": ("spec", "floating"),           # MFCCSpectrogramType
    "embedding": ("element", "floating"),   # AcousticEncodedRepresentation
    "logits": ("element", "floating"),      # LogitsType
    "logprobs": ("logits", "floating"),     # LogprobsType
    "loss": ("element", "floating"),        # LossType
    "tokens": ("element", "integer"),       # TokenIndex / phoneme ids
    "labels": ("tokens", "integer"),        # LabelsType (CTC targets)
    "lengths": ("element", "integer"),      # LengthsType
    "mask": ("element", None),              # MaskType (bool or 0/1 float)
}


class Compat(enum.Enum):
    """NeuralTypeComparisonResult analog (neural_types/comparison.py)."""

    SAME = 0
    LESS = 1       # a is a subtype of b: a can be plugged where b is expected
    GREATER = 2
    INCOMPATIBLE = 3


def _ancestors(name: str):
    while name is not None:
        yield name
        name = ELEMENT_LATTICE[name][0]


def compare(a: str, b: str) -> Compat:
    """Lattice comparison of two element-type names."""
    if a not in ELEMENT_LATTICE or b not in ELEMENT_LATTICE:
        raise TypecheckError(f"unknown element type in compare: {a!r}, {b!r}")
    if a == b:
        return Compat.SAME
    if b in _ancestors(a):
        return Compat.LESS
    if a in _ancestors(b):
        return Compat.GREATER
    return Compat.INCOMPATIBLE


def _check_element(element: str, val, name: str):
    if element not in ELEMENT_LATTICE:
        raise TypecheckError(
            f"{name}: unknown element type '@{element}' "
            f"(known: {sorted(ELEMENT_LATTICE)})"
        )
    kind = ELEMENT_LATTICE[element][1]
    dtype = getattr(val, "dtype", None)
    if kind is None or dtype is None:
        return
    dtype = np.dtype(dtype) if not hasattr(dtype, "kind") else dtype
    is_float = np.issubdtype(dtype, np.floating) or str(dtype) == "bfloat16"
    is_int = np.issubdtype(dtype, np.integer) or np.issubdtype(dtype, np.bool_)
    ok = is_float if kind == "floating" else is_int
    if not ok:
        raise TypecheckError(
            f"{name}: element '@{element}' requires a {kind} dtype, "
            f"got {dtype}"
        )


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
                tokens = spec.split()
                if tokens and tokens[-1].startswith("@"):
                    _check_element(tokens[-1][1:], val, arg_name)
                    spec = " ".join(tokens[:-1])
                _check(spec, shape, arg_name, bindings)
            return fn(*args, **kwargs)

        return inner

    if _fn is not None:
        raise TypeError("use @typecheck(arg='B T F') with keyword specs")
    return wrap
