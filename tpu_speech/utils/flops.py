"""FLOPs / MFU accounting from XLA's compiled cost analysis.

The reference has no FLOPs accounting at all (its observability is wall-clock
RTF prints, Grad-TTS/inference.py:75-79); on TPU the compiler knows the exact
op-level FLOP count of every executable, so MFU — achieved model FLOP/s over
the chip's peak — is a first-class, mechanically reproducible metric here.

Conventions:
- `flops` comes from `jit(f).lower(*args).compile().cost_analysis()["flops"]`,
  i.e. the compiled HLO's algebraic FLOPs (fused elementwise work included,
  rematerialization double-counted as executed — this is *hardware* FLOPs,
  the honest numerator for utilization).
- MFU is reported against the chip's **bf16 matmul peak** regardless of the
  run's dtype. On v5e-class parts fp32 matmuls lower onto the same bf16 MXU
  (multi-pass), so a single denominator keeps fp32/bf16 runs comparable; the
  emitted record carries `peak_tflops` so any other convention can be
  recomputed.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax

# bf16 matmul peak per chip, TFLOP/s (public spec sheets; the scaling-book
# numbers). Keyed by substrings of jax's device_kind.
_PEAK_TFLOPS_BF16 = (
    ("v5 lite", 197.0),   # v5e (device_kind "TPU v5 lite")
    ("v5e", 197.0),
    ("v5p", 459.0),
    ("v6 lite", 918.0),   # Trillium
    ("v6e", 918.0),
    ("v4", 275.0),
    ("v3", 123.0),
    ("v2", 45.0),
)

# HBM bandwidth per chip, GB/s — for roofline attribution (bytes-bound vs
# FLOPs-bound phases).
_HBM_GBPS = (
    ("v5 lite", 819.0),
    ("v5e", 819.0),
    ("v5p", 2765.0),
    ("v6 lite", 1640.0),
    ("v6e", 1640.0),
    ("v4", 1228.0),
    ("v3", 900.0),
    ("v2", 700.0),
)


def _lookup(table, device_kind: str) -> Optional[float]:
    kind = device_kind.lower()
    for sub, val in table:
        if sub in kind:
            return val
    return None


def device_peak_tflops(device: Optional[jax.Device] = None) -> Optional[float]:
    """bf16 matmul peak of `device` in TFLOP/s, or None if unknown (CPU)."""
    device = device or jax.devices()[0]
    if device.platform != "tpu":
        return None
    return _lookup(_PEAK_TFLOPS_BF16, device.device_kind)


def device_hbm_gbps(device: Optional[jax.Device] = None) -> Optional[float]:
    device = device or jax.devices()[0]
    if device.platform != "tpu":
        return None
    return _lookup(_HBM_GBPS, device.device_kind)


def compiled_cost(fn, *args, **kwargs) -> Dict[str, float]:
    """FLOPs + HBM bytes of the compiled executable for `fn(*args)`.

    `fn` may be a jitted or plain callable; returns
    {"flops": float, "bytes": float} (0.0 where the backend reports nothing).
    """
    if not hasattr(fn, "lower"):
        fn = jax.jit(fn)
    compiled = fn.lower(*args, **kwargs).compile()
    ca: Any = compiled.cost_analysis()
    # cost_analysis historically returned [dict]; newer jax returns dict
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    ca = ca or {}
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    return {"flops": flops, "bytes": byts}


def mfu(flops_per_step: float, step_seconds: float,
        device: Optional[jax.Device] = None) -> Optional[float]:
    """Model FLOPs utilization in [0, 1] vs the device's bf16 peak."""
    peak = device_peak_tflops(device)
    if not peak or step_seconds <= 0 or flops_per_step <= 0:
        return None
    return flops_per_step / step_seconds / (peak * 1e12)
