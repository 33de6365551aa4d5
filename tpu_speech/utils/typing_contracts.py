"""Runtime shape/dtype contracts (the reference's NeuralType analog).

NeMo declares typed input/output ports checked at call time
(SPIRAL/nemo/core/classes/common.py Typing/typecheck;
core/neural_types/*). The TPU-native analog has two tiers:

1. ``@typecheck`` — lightweight axis-spec assertions that work on concrete
   arrays AND inside jit traces (shapes and dtypes are static under
   tracing), with named axes checked for consistency. This is the tier the
   model facades use on the hot path.

   Spec syntax: a string per argument, e.g. "B T F" (named axes), "B T 80"
   (literal sizes), "B * C" ('*' = any). Same name must match across
   arguments. An optional trailing "@element" token tags the array's
   SEMANTIC element type and enforces a dtype kind:

       @typecheck(y="B Ty F @mel", labels="B L @labels")

2. ``PortType``/``Element``/``Axis`` — the full port-compatibility algebra
   of the reference (core/neural_types/neural_type.py:72-108,
   elements.py:64-122, axes.py:30-101, comparison.py:20-32) for wiring-time
   queries: element subtyping with type parameters and fields, axis kinds
   with optional sizes/list-ness, and the complete comparison-result set
   (SAME / LESS / GREATER / DIM_INCOMPATIBLE / TRANSPOSE_SAME /
   CONTAINER_SIZE_MISMATCH / INCOMPATIBLE / SAME_TYPE_INCOMPATIBLE_PARAMS /
   UNCHECKED).

Design note (TPU-first): the reference encodes the element hierarchy as ~40
Python classes compared via ``issubclass`` (elements.py). Here the same
hierarchy is a DATA table (``ELEMENT_LATTICE``) — one row per reference
class, parent edges copied from the class bases — because a flat table is
trivially serializable into configs and adds zero import cost; the
comparison semantics are identical.
"""

from __future__ import annotations

import enum
import functools
import inspect
from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence, Tuple, Union

import numpy as np


class TypecheckError(TypeError):
    pass


# name -> (parent, required dtype kind or None)
#
# One row per reference element class; parent edges are EXACTLY the
# reference class bases (SPIRAL/nemo/core/neural_types/elements.py:125-320).
# The dtype-kind column is an extra runtime check the reference doesn't
# have (its elements are semantic markers only): floating/integer/None.
ELEMENT_LATTICE: Dict[str, tuple] = {
    "element": (None, None),           # ElementType (abstract root)
    "void": (None, None),              # VoidType — compatible with all
    # --- channel family (elements.py:136-205) ---
    "channel": ("element", None),      # ChannelType
    "embedded_text": ("channel", "floating"),   # EmbeddedTextType
    "encoded": ("channel", "floating"),         # EncodedRepresentation
    "embedding": ("encoded", "floating"),       # AcousticEncodedRepresentation
    # spectrograms are NOT subtypes of waveforms: SpectrogramType
    # subclasses ChannelType, not AudioSignal (elements.py:180-205)
    "spec": ("channel", "floating"),   # SpectrogramType
    "mel": ("spec", "floating"),       # MelSpectrogramType
    "mfcc": ("spec", "floating"),      # MFCCSpectrogramType
    # --- logits / labels (elements.py:146-161, 208-221) ---
    "logits": ("element", "floating"),     # LogitsType
    # LogprobsType subclasses ElementType, NOT LogitsType (elements.py:150)
    "logprobs": ("element", "floating"),   # LogprobsType
    "labels": ("element", "integer"),      # LabelsType (CTC targets)
    "hypothesis": ("labels", "integer"),   # HypothesisType
    "predictions": ("labels", None),       # PredictionsType
    "regression_values": ("predictions", "floating"),  # RegressionValuesType
    "categorical_values": ("predictions", "integer"),  # CategoricalValuesType
    "mask": ("predictions", None),         # MaskType (bool or 0/1 float)
    # --- scalars & indices (elements.py:164-165, 224-225, 268-285) ---
    "lengths": ("element", "integer"),     # LengthsType
    "loss": ("element", "floating"),       # LossType
    "audio": ("element", "floating"),      # AudioSignal (param: freq)
    "index": ("element", "integer"),       # Index
    "bool": ("element", None),             # BoolType
    "int": ("element", "integer"),         # IntType
    "float": ("element", "floating"),      # FloatType
    "tokens": ("int", "integer"),          # TokenIndex
    "length": ("int", "integer"),          # Length (of a list)
    # --- targets / images / strings (elements.py:228-265) ---
    "target": ("element", None),                   # Target
    "classification_target": ("target", "integer"),  # ClassificationTarget
    "image": ("element", None),                    # ImageValue
    "normalized_image": ("image", "floating"),     # NormalizedImageValue
    "image_feature": ("image", "floating"),        # ImageFeatureValue
    "string": ("element", None),                   # StringType
    "string_label": ("string", None),              # StringLabel
    # --- distributions / seq2seq (elements.py:288-320) ---
    "distribution_samples": ("element", "floating"),  # ProbabilityDistributionSamplesType
    "normal_samples": ("distribution_samples", "floating"),  # NormalDistributionSamplesType
    "alignment": ("element", "floating"),   # SequenceToSequenceAlignmentType
    "normal_mean": ("element", "floating"),     # NormalDistributionMeanType
    "normal_logvar": ("element", "floating"),   # NormalDistributionLogVarianceType
    "duration": ("element", None),          # TokenDurationType
    "log_duration": ("element", "floating"),  # TokenLogDurationType
    "log_det": ("element", "floating"),     # LogDeterminantType
}


class Compat(enum.Enum):
    """NeuralTypeComparisonResult analog — same names and values
    (reference comparison.py:20-32)."""

    SAME = 0
    LESS = 1       # a is a subtype of b: a can be plugged where b is expected
    GREATER = 2    # b is a
    DIM_INCOMPATIBLE = 3       # a resize connector might fix it
    TRANSPOSE_SAME = 4         # transpose / list<->tensor would make them same
    CONTAINER_SIZE_MISMATCH = 5
    INCOMPATIBLE = 6
    SAME_TYPE_INCOMPATIBLE_PARAMS = 7
    UNCHECKED = 8


def _ancestors(name: str):
    while name is not None:
        yield name
        name = ELEMENT_LATTICE[name][0]


@dataclass(frozen=True)
class Element:
    """An element type with optional type parameters and fields
    (reference elements.py:64-122: ``type_parameters`` must match by value
    with None-as-void; ``fields`` must match exactly)."""

    name: str
    params: Tuple[Tuple[str, object], ...] = ()
    fields: Optional[Tuple[str, ...]] = None

    @staticmethod
    def of(name: str, params: Optional[Dict[str, object]] = None,
           fields: Optional[Sequence[str]] = None) -> "Element":
        return Element(
            name,
            tuple(sorted((params or {}).items())),
            None if fields is None else tuple(fields),
        )


def audio_signal(freq: Optional[int] = None) -> Element:
    """AudioSignal(freq=...) analog (reference elements.py:180-193)."""
    return Element.of("audio", {"freq": freq})


def _as_element(e: Union[str, Element]) -> Element:
    return Element(e) if isinstance(e, str) else e


def compare_elements(a: Union[str, Element], b: Union[str, Element]) -> Compat:
    """Element comparison with parameter/field checks
    (reference elements.py:90-122)."""
    a, b = _as_element(a), _as_element(b)
    for n in (a.name, b.name):
        if n not in ELEMENT_LATTICE:
            raise TypecheckError(f"unknown element type in compare: {n!r}")
    # VoidType is compatible with everything (elements.py:125-132)
    if a.name == "void" or b.name == "void":
        return Compat.SAME
    if a.name != b.name:
        if b.name in _ancestors(a.name):
            return Compat.LESS
        if a.name in _ancestors(b.name):
            return Compat.GREATER
        return Compat.INCOMPATIBLE
    # same type: parameters must match (None treated as void, elements.py:107-117)
    pa, pb = dict(a.params), dict(b.params)
    if set(pa) != set(pb):
        return Compat.SAME_TYPE_INCOMPATIBLE_PARAMS
    for k, v in pa.items():
        if v is None or pb[k] is None:
            continue
        if v != pb[k]:
            return Compat.SAME_TYPE_INCOMPATIBLE_PARAMS
    # fields must match exactly (elements.py:118-122)
    if a.fields != b.fields:
        return Compat.INCOMPATIBLE
    return Compat.SAME


def compare(a: Union[str, Element], b: Union[str, Element]) -> Compat:
    """Lattice comparison of two element types (string names or Elements)."""
    return compare_elements(a, b)


class AxisKind(enum.Enum):
    """Axis semantics (reference axes.py:30-75). Dimension and Channel are
    the same kind; Any accepts anything."""

    Batch = 0
    Time = 1
    Dimension = 2
    Channel = 2
    Width = 3
    Height = 4
    Any = 5
    Sequence = 6
    FlowGroup = 7
    Singleton = 8

    @staticmethod
    def from_str(label: str) -> "AxisKind":
        _label = label.lower().strip()
        table = {
            "b": AxisKind.Batch, "n": AxisKind.Batch, "batch": AxisKind.Batch,
            "t": AxisKind.Time, "time": AxisKind.Time,
            "d": AxisKind.Dimension, "c": AxisKind.Dimension,
            "channel": AxisKind.Dimension,
            "w": AxisKind.Width, "width": AxisKind.Width,
            "h": AxisKind.Height, "height": AxisKind.Height,
            "s": AxisKind.Singleton, "singleton": AxisKind.Singleton,
            "flowgroup": AxisKind.FlowGroup,
            "any": AxisKind.Any,
        }
        if _label not in table:
            raise TypecheckError(f"can't create AxisKind from {label!r}")
        return table[_label]


@dataclass(frozen=True)
class Axis:
    """Axis kind + optional fixed size + list-ness (reference axes.py:78-101)."""

    kind: AxisKind
    size: Optional[int] = None
    is_list: bool = False

    def __post_init__(self):
        if self.size is not None and self.is_list:
            raise TypecheckError("an axis can't be a list and have a fixed size")


def _as_axis(a: Union[str, Axis]) -> Axis:
    return Axis(AxisKind.from_str(a)) if isinstance(a, str) else a


def _compare_axes(axes_a, axes_b) -> int:
    """0=same, 1=transpose-same, 2=dim-incompatible, 3=different
    (reference neural_type.py:151-199; the reference's ``Any`` handling
    resets the running flag — a bug we don't reproduce: here ``Any``
    matches the paired axis without erasing earlier mismatches)."""
    if axes_a is None and axes_b is None:
        return 0
    if (axes_a is None) != (axes_b is None):
        return 3
    if len(axes_a) != len(axes_b):
        return 3
    same = True
    kinds_a, kinds_b = {}, {}
    for a, b in zip(axes_a, axes_b):
        kinds_a[a.kind] = a.size
        kinds_b[b.kind] = b.size
        if a.kind == AxisKind.Any:
            continue
        if (a.kind != b.kind or a.is_list != b.is_list
                or (a.size != b.size and a.size is not None)):
            same = False
    if same:
        return 0
    if kinds_a.keys() == kinds_b.keys():
        for k, v in kinds_a.items():
            if kinds_b[k] != v:
                return 2
        return 1
    return 3


@dataclass(frozen=True)
class PortType:
    """The NeuralType analog: axes + element type + optional flag
    (reference neural_type.py:29-108)."""

    axes: Optional[Tuple[Axis, ...]]
    element: Element = field(default_factory=lambda: Element("void"))
    optional: bool = False

    @staticmethod
    def of(axes: Optional[Sequence[Union[str, Axis]]] = None,
           element: Union[str, Element] = "void",
           optional: bool = False) -> "PortType":
        return PortType(
            None if axes is None else tuple(_as_axis(a) for a in axes),
            _as_element(element),
            optional,
        )

    def compare(self, second: "PortType") -> Compat:
        """Full NeuralType.compare semantics (neural_type.py:72-108)."""
        # "big void": void element with no axes matches anything
        if self.element.name == "void" and self.axes is None:
            return Compat.SAME
        if self.axes is None:
            if second.axes is None:
                return compare_elements(self.element, second.element)
            return Compat.INCOMPATIBLE
        dims = _compare_axes(self.axes, second.axes)
        elem = compare_elements(self.element, second.element)
        if dims == 0:
            return elem
        if dims == 1:
            return (Compat.TRANSPOSE_SAME if elem is Compat.SAME
                    else Compat.INCOMPATIBLE)
        if dims == 2:
            return (Compat.DIM_INCOMPATIBLE if elem is Compat.SAME
                    else Compat.INCOMPATIBLE)
        return Compat.INCOMPATIBLE

    def compare_and_raise(self, port_name: str, second: "PortType"):
        """Raise unless second can feed this port: accepted results are
        SAME and GREATER (neural_type.py:110-119)."""
        result = self.compare(second)
        if result not in (Compat.SAME, Compat.GREATER):
            raise TypecheckError(
                f"port {port_name!r}: incompatible types "
                f"{self} vs {second} ({result.name})"
            )
        return result


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
