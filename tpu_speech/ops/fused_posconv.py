"""Fused grouped 1-D convolution Pallas TPU kernel (wav2vec pos-conv).

Why this exists: the k=128 / groups=16 positional convolution
(models/spiral/wav2vec.py::PositionalConv, re-designed from
SPIRAL/nemo/collections/asr/parts/wav2vec.py:130-216) is ~13.5 ms of the
SPIRAL-base pretrain step. XLA's grouped conv runs it at ~17-26 TFLOP/s on
v5e across every lowering we measured (feature_group_count, batch_group,
vmap-over-groups, dense block-diagonal — scripts/bench_posconv.py): each
group's 32-48 channels underfill the 128-wide MXU lanes AND the contraction
per MXU pass is only Cg deep.

Design: per (batch-tile, group) program, im2col the K taps into a VMEM
scratch whose lane axis packs each tap at a 128-aligned offset
(XW[t, k*128 + ci] = xp[t + k, ci]; lanes ci >= Cg stay zero), and run ONE
deep matmul per K-chunk against the correspondingly padded weights
(wpad[k*128 + ci, co] = w[k, ci, co], zero rows elsewhere). The contraction
is then KC*128 deep — full MXU depth — at the cost of 128/Cg zero-lane
work, i.e. a ~74 TFLOP/s ceiling for Cg=48 instead of the ~20 the native
grouped lowering achieves. Zero rows in wpad also nullify whatever the
unwritten XW pad lanes hold, so only one scratch zeroing per program is
needed.

The custom VJP computes dx with the SAME kernel (a grouped conv with
k-flipped, ci/co-transposed weights and complementary padding) and defers
dw to XLA's native conv weight-grad (measured a small slice of the cost;
see the perf table in scripts/bench_posconv.py).

API: ``grouped_conv1d(x, w, groups, left_pad)`` with x (B, T, C),
w (K, Cg, C) in HIO grouped layout (feature_group_count semantics:
output channel o uses input channels of group o // Cg). Output (B, T, C):
out[b, t] = sum_k xp[b, t+k] . w[k], xp = pad(x, (left_pad, K - left_pad)).
left_pad = K//2 reproduces lax SAME-even + [:-1] trim; K-1 is causal
(wav2vec.py::PositionalConv pads).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["grouped_conv1d", "fused_posconv_supported"]

LANE = 128


def fused_posconv_supported(groups: int, c: int, k: int,
                            backend=None) -> bool:
    """OPT-IN (TPU_SPEECH_FUSED_POSCONV=1): measured end to end on v5e at
    the SPIRAL-base step, this kernel is ~3 ms/step SLOWER than XLA's
    native grouped conv (93.3 vs 90.1 ms fp32) — the full-lane-packed
    im2col (v2; v1's per-tap narrow writes were ~11 ms slower) still pays
    more in VMEM copies + G-major layout transposes than the deeper MXU
    contraction wins back. Kept as the documented record that the
    ~17-26 TF/s XLA grouped-conv ceiling (scripts/bench_posconv.py) was
    attacked and where the next attempt should differ (fold the layout
    change into neighbours; fuse the GELU; skip the XW scratch round-trip
    by accumulating per-tap dots of packed lane blocks)."""
    import os

    if not os.environ.get("TPU_SPEECH_FUSED_POSCONV"):
        return False
    if backend is None:
        backend = jax.default_backend()
    cg = c // groups
    return backend == "tpu" and cg <= LANE and c % groups == 0


def _fwd_kernel(xp_ref, w_ref, o_ref, xw, wpad, *, bt, t, k, cg, kc):
    """Packs `pack = LANE // cg` taps into every 128-lane block of the
    im2col scratch: v1 wrote one cg-wide tap per 128-lane block and was
    copy-bound at cg/128 lane utilization (measured SLOWER than XLA's
    grouped conv end to end). Each write is now a full-lane (t, 128) store
    assembled from `pack` shifted reads; the weight rows are laid out to
    match (row (kk//pack)*128 + (kk%pack)*cg + ci), with zero rows in the
    residual lanes killing whatever the pad lanes hold."""
    pack = LANE // cg
    used = pack * cg
    nc = k // kc
    blocks_per_chunk = kc // pack
    # weights: zero + fill row-block-wise (a whole-buffer zeros_like
    # materializes a buffer-sized temporary and blows the scoped VMEM
    # budget — observed 18 MB > 16 MB at the block0 shape)
    for kk in range(k):
        j, s = kk // pack, kk % pack
        wpad[j * LANE + s * cg: j * LANE + (s + 1) * cg, :] = w_ref[0, kk]
    if used < LANE:
        for j in range(k // pack):
            wpad[j * LANE + used:(j + 1) * LANE, :] = jnp.zeros(
                (LANE - used, cg), wpad.dtype
            )

    def body(b, carry):
        acc = jnp.zeros((t, cg), jnp.float32)
        for c_i in range(nc):
            for j in range(blocks_per_chunk):
                base = c_i * kc + j * pack
                parts = [
                    xp_ref[0, b, pl.ds(base + s, t), :] for s in range(pack)
                ]
                if used < LANE:
                    parts.append(jnp.zeros((t, LANE - used), xw.dtype))
                xw[:, j * LANE:(j + 1) * LANE] = jnp.concatenate(
                    parts, axis=1
                )
            acc = acc + jax.lax.dot_general(
                xw[:], wpad[pl.ds(c_i * blocks_per_chunk * LANE,
                                  blocks_per_chunk * LANE), :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        o_ref[0, b, :, :] = acc.astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, bt, body, 0)


def _pallas_fwd(xp4, wg, t: int, kc: int, b_tile: int, interpret: bool):
    """xp4 (G, B, T+K, Cg) pre-padded, group-major (Mosaic requires the
    last two block dims be 8/128-divisible OR the full array dims — a
    Cg-wide channel block of a (B, T, C) array is neither, so groups live
    in a leading axis); wg (G, K, Cg, Cg). Returns (G, B, T, Cg)."""
    g, b, tk, cg = xp4.shape
    k = wg.shape[1]
    grid = (b // b_tile, g)
    kern = functools.partial(
        _fwd_kernel, bt=b_tile, t=t, k=k, cg=cg, kc=kc
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, b_tile, tk, cg), lambda i, j: (j, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, cg, cg), lambda i, j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b_tile, t, cg), lambda i, j: (j, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, b, t, cg), xp4.dtype),
        scratch_shapes=[
            pltpu.VMEM((t, (kc // (LANE // cg)) * LANE), xp4.dtype),
            pltpu.VMEM(((k // (LANE // cg)) * LANE, cg), wg.dtype),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(xp4, wg)


def _round8(n: int) -> int:
    return ((n + 7) // 8) * 8


def _run(x, w, groups: int, left_pad: int, interpret: bool):
    b, t, c = x.shape
    k, cg, _ = w.shape
    assert c % groups == 0 and c // groups == cg, (c, groups, cg)
    tp = _round8(t)
    # pad: left_pad zeros left, K - left_pad (+ t padding) right
    xp = jnp.pad(x, ((0, 0), (left_pad, k - left_pad + (tp - t)), (0, 0)))
    # group-major layouts (see _pallas_fwd): (B, TK, C) -> (G, B, TK, Cg)
    xp4 = jnp.transpose(
        xp.reshape(b, tp + k, groups, cg), (2, 0, 1, 3)
    )
    # (K, Cg, C) HIO -> (G, K, Cg_in, Cg_out)
    wg = jnp.transpose(w.reshape(k, cg, groups, cg), (2, 0, 1, 3))
    # batch tile: largest divisor of B keeping the xp block under ~1.5 MB
    b_tile = b
    budget = int(1.5e6 // max(1, (tp + k) * cg * x.dtype.itemsize))
    for cand in range(min(b, max(budget, 1)), 0, -1):
        if b % cand == 0:
            b_tile = cand
            break
    pack = LANE // cg
    kc = 16 * pack  # taps per matmul chunk (xw stays ~16 lane-blocks wide)
    while k % kc:
        kc //= 2
    assert kc % pack == 0 and k % kc == 0, (k, kc, pack)
    out4 = _pallas_fwd(xp4, wg, tp, kc, b_tile, interpret)  # (G, B, Tp, Cg)
    out = jnp.transpose(out4, (1, 2, 0, 3)).reshape(b, tp, c)
    return out[:, :t, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def grouped_conv1d(x, w, groups: int, left_pad: int, interpret: bool = False):
    return _run(x, w, groups, left_pad, interpret)


def _fwd(x, w, groups, left_pad, interpret):
    return _run(x, w, groups, left_pad, interpret), (x, w)


def _bwd(groups, left_pad, interpret, res, dy):
    x, w = res
    k = w.shape[0]
    # dx: grouped conv of dy with k-flipped, ci/co-swapped weights and the
    # complementary padding (K-1-left_pad) — same kernel, new weights
    cg = w.shape[1]
    g = w.shape[2] // cg
    wt = jnp.transpose(
        w.reshape(k, cg, g, cg)[::-1], (0, 3, 2, 1)
    ).reshape(k, cg, g * cg)
    dx = _run(dy, wt, groups, k - 1 - left_pad, interpret)
    # dw: XLA's native conv weight-grad (a small slice of the cost)
    import jax.numpy as _jnp
    from jax import lax

    def conv_w(wv):
        pr = k - left_pad - 1
        return lax.conv_general_dilated(
            x, wv, (1,), [(left_pad, pr)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=groups,
        )

    _, pull = jax.vjp(conv_w, w)
    (dw,) = pull(dy.astype(x.dtype))
    return dx.astype(x.dtype), dw


grouped_conv1d.defvjp(_fwd, _bwd)
