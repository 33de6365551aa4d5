"""Fused multihead self-attention Pallas TPU kernel (with in-kernel dropout).

Why this exists: the SPIRAL transformer stack (models/spiral/wav2vec.py,
re-designed from SPIRAL/nemo/collections/asr/parts/multihead_attention.py:15-)
runs full O(T^2) attention with attention-prob dropout p=0.1 at training
time. Lowered through XLA, every layer materializes the (B, H, T, T) score
and prob tensors in HBM *and* draws (B, H, T, T) uint32 dropout bits — at
the SPIRAL-base pretrain operating point (B=24, T in {392..456} block1 /
{196..228} block2, 13 layers x teacher+student) a profiled ~11 ms/step of
RngBitGenerator plus the associated score/prob/mask HBM round-trips.
Round-3 re-measurement (post-merge step at 90.1 ms fp32): the fused path's
custom-calls cost 11.9 ms/step and an A/B with the kernel DISABLED
(TPU_SPEECH_DISABLE_FUSED_ATTN=1) runs 102.8 ms — the kernel is worth a
measured 12.7 ms/step. Round 4 added the merged-plane variant
(fused_qkv_self_attention): the kernel consumes the (B, T, 3E) merged
projection directly and emits a (B, T, 3E) gradient, deleting the
split/scale/reshape/transpose seam the round-3 trace charged ~7.6 ms/step
(step 93.2 -> 79.5 ms fp32). Current per-phase numbers live in the README
"SPIRAL step attribution" (from scripts/trace_spiral_step.py).

Design: sequence lengths here are short (T <= 768 after conv subsampling),
so one (batch, head) program holds the ENTIRE (T, T) score tile in VMEM —
no flash-style streaming softmax is needed. Kernel-side layout is
(B, H, T, D) so every block's trailing two dims equal the full (T, D)
plane (the Mosaic tiling requirement); the public API stays (B, T, H, D)
and the wrapper transposes (cost O(B*T*H*D), negligible vs the O(T^2)
traffic saved). Grid (B, H/hp) — each program loops an hp-head chunk sized
to the scoped-VMEM budget (_heads_per); per head:

    q,k,v (T, D) VMEM loads -> scores = q @ k^T (MXU, f32 accum)
    -> key-padding fill (-1e9, exact `where` semantics like the XLA path)
    -> row-softmax in f32 -> dropout via the per-core PRNG
       (pltpu.prng_random_bits, seeded by (step_seed, b, h) so the backward
       pass REGENERATES the identical mask instead of storing it)
    -> out = probs @ v (MXU).

The only HBM traffic is q/k/v in and out — probs, masks and dropout bits
never leave VMEM. The custom VJP recomputes the probs in the backward
kernel (cheaper than storing (B,H,T,T)) and emits dq/dk/dv in one program.

Numerics: matmuls keep the input dtype operands with f32 accumulation
(preferred_element_type); the softmax always runs in f32 (the XLA path
runs it in the activation dtype, so the fused path is never less accurate).
Callers keep their XLA path when `fused_attention_supported` is False
(T > MAX_T VMEM bound, or non-TPU backend). Note: dropout_p > 0 requires
the TPU PRNG primitives and is NOT available in interpret mode on CPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_self_attention",
    "fused_qkv_self_attention",
    "fused_attention_supported",
    "MAX_T",
]

# one (T, T) f32 tile x ~5 live in the bwd kernel + vectors must fit VMEM
MAX_T = 768


def fused_attention_supported(t: int, backend: Optional[str] = None) -> bool:
    import os

    if os.environ.get("TPU_SPEECH_DISABLE_FUSED_ATTN"):
        # perf A/B escape hatch (scripts/profile_spiral_step.py): forces the
        # plain XLA score/softmax/dropout path everywhere
        return False
    if backend is None:
        backend = jax.default_backend()
    return backend == "tpu" and t <= MAX_T


def _softmax_rows(s: jnp.ndarray) -> jnp.ndarray:
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _keep_mask(shape, dropout_p: float) -> jnp.ndarray:
    """Bernoulli(1-p) keep mask from the per-core PRNG (seeded by caller)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = jnp.uint32(min(int(dropout_p * 2.0**32), 2**32 - 1))
    return (bits >= threshold).astype(jnp.float32)


def _fwd_kernel(mask_ref, seed_ref, q_ref, k_ref, v_ref, o_ref, *,
                dropout_p: float, n_heads: int, heads_per: int):
    # Heads are chunked per program (grid (B, H/hp)): vs the original
    # per-(b,h) grid this moves hp-times bigger DMAs through 6x fewer
    # program instances — measured step-time NEUTRAL at SPIRAL-base
    # (92.0 vs 90-92 ms fp32 run-to-run band), kept for the lower program
    # count at larger batches and the VMEM-aware sizing
    pad = mask_ref[0, 0, :]  # (T,) 1.0 at padded keys

    def body(hh, carry):
        q = q_ref[0, hh, :, :]
        k = k_ref[0, hh, :, :]
        v = v_ref[0, hh, :, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = jnp.where(pad[None, :] > 0.0, -1e9, s)
        p = _softmax_rows(s)
        if dropout_p > 0.0:
            # same (b*H + h) stream ids as the per-(b,h)-program layout, so
            # forward and backward regenerate identical masks
            bh = (pl.program_id(0) * n_heads
                  + pl.program_id(1) * heads_per + hh)
            pltpu.prng_seed(seed_ref[0], bh)
            p = p * _keep_mask(p.shape, dropout_p) * (1.0 / (1.0 - dropout_p))
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, hh, :, :] = o.astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, heads_per, body, 0)


def _bwd_kernel(mask_ref, seed_ref, q_ref, k_ref, v_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, dropout_p: float, n_heads: int,
                heads_per: int):
    pad = mask_ref[0, 0, :]

    def body(hh, carry):
        q = q_ref[0, hh, :, :]
        k = k_ref[0, hh, :, :]
        v = v_ref[0, hh, :, :]
        do = do_ref[0, hh, :, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = jnp.where(pad[None, :] > 0.0, -1e9, s)
        p = _softmax_rows(s)  # pre-dropout probs (f32)
        if dropout_p > 0.0:
            # identical seeding + generation order as the forward -> same mask
            bh = (pl.program_id(0) * n_heads
                  + pl.program_id(1) * heads_per + hh)
            pltpu.prng_seed(seed_ref[0], bh)
            keep = _keep_mask(p.shape, dropout_p) * (1.0 / (1.0 - dropout_p))
            pd = p * keep
        else:
            keep = None
            pd = p
        # dv = dropout(p)^T @ do
        dv = jax.lax.dot_general(
            pd.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # d(dropout(p)) = do @ v^T ; back through dropout scaling
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if keep is not None:
            dp = dp * keep
        # softmax jvp: ds = p * (dp - sum_j dp*p)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = ds.astype(q.dtype)
        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_ref[0, hh, :, :] = dq.astype(dq_ref.dtype)
        dk_ref[0, hh, :, :] = dk.astype(dk_ref.dtype)
        dv_ref[0, hh, :, :] = dv.astype(dv_ref.dtype)
        return carry

    jax.lax.fori_loop(0, heads_per, body, 0)


def _heads_per(h, t, d, n_bufs):
    """Largest divisor of h whose blocks (+2x pipeline buffering) and (T,T)
    temporaries stay under ~12 MB of the 16 MB scoped VMEM."""
    budget = 12 * 2**20 - 3 * t * t * 4
    cap = max(1, budget // max(1, n_bufs * t * d * 4 * 2))
    hp = 1
    for cand in range(1, h + 1):
        if h % cand == 0 and cand <= cap:
            hp = cand
    return hp


def _specs(t, d, hp):
    # trailing block dims equal the full (T, D) / (1, T) planes, which is
    # always Mosaic-legal regardless of T/D alignment; each program loops
    # `hp` heads of one batch item (see _fwd_kernel)
    qkv = pl.BlockSpec((1, hp, t, d), lambda i, j: (i, j, 0, 0),
                       memory_space=pltpu.VMEM)
    mask = pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    return qkv, mask, seed


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_attn(q, k, v, maskf, seed, dropout_p, interpret):
    """q, k, v: (B, H, T, D); maskf: (B, 1, T); seed: (1,) int32 SMEM."""
    return _fused_attn_fwd(q, k, v, maskf, seed, dropout_p, interpret)[0]


def _fused_attn_fwd(q, k, v, maskf, seed, dropout_p, interpret):
    b, h, t, d = q.shape
    hp = _heads_per(h, t, d, n_bufs=4)  # q,k,v,o blocks
    qkv, mask, seed_spec = _specs(t, d, hp)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, dropout_p=dropout_p, n_heads=h,
                          heads_per=hp),
        grid=(b, h // hp),
        in_specs=[mask, seed_spec, qkv, qkv, qkv],
        out_specs=qkv,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(maskf, seed, q, k, v)
    return out, (q, k, v, maskf, seed)


def _fused_attn_bwd(dropout_p, interpret, res, do):
    q, k, v, maskf, seed = res
    b, h, t, d = q.shape
    hp = _heads_per(h, t, d, n_bufs=7)  # q,k,v,do,dq,dk,dv blocks
    qkv, mask, seed_spec = _specs(t, d, hp)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, dropout_p=dropout_p, n_heads=h,
                          heads_per=hp),
        grid=(b, h // hp),
        in_specs=[mask, seed_spec, qkv, qkv, qkv, qkv],
        out_specs=(qkv, qkv, qkv),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        interpret=interpret,
    )(maskf, seed, q, k, v, do)
    return dq, dk, dv, None, None


_fused_attn.defvjp(_fused_attn_fwd, _fused_attn_bwd)


def _qkv_fwd_kernel(mask_ref, seed_ref, qkv_ref, o_ref, *,
                    dropout_p: float, n_heads: int, d_head: int):
    """One program per batch item; the (T, 3E) qkv plane sits in VMEM and
    heads are STATIC column slices of it — no (B,T,H,D) layout ever exists,
    so the caller-side split/reshape/transpose copies disappear (measured
    ~7.6 ms/step of zero-FLOP formatting at SPIRAL-base, round-4 trace)."""
    pad = mask_ref[0, 0, :]
    e = n_heads * d_head
    for hh in range(n_heads):  # static unroll -> static lane offsets
        q = qkv_ref[0, :, hh * d_head:(hh + 1) * d_head]
        k = qkv_ref[0, :, e + hh * d_head:e + (hh + 1) * d_head]
        v = qkv_ref[0, :, 2 * e + hh * d_head:2 * e + (hh + 1) * d_head]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = jnp.where(pad[None, :] > 0.0, -1e9, s)
        p = _softmax_rows(s)
        if dropout_p > 0.0:
            # same (b*H + h) stream ids as the (B,T,H,D) kernel
            bh = pl.program_id(0) * n_heads + hh
            pltpu.prng_seed(seed_ref[0], bh)
            p = p * _keep_mask(p.shape, dropout_p) * (1.0 / (1.0 - dropout_p))
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, hh * d_head:(hh + 1) * d_head] = o.astype(o_ref.dtype)


def _qkv_bwd_kernel(mask_ref, seed_ref, qkv_ref, do_ref, dqkv_ref, *,
                    dropout_p: float, n_heads: int, d_head: int):
    pad = mask_ref[0, 0, :]
    e = n_heads * d_head
    for hh in range(n_heads):
        q = qkv_ref[0, :, hh * d_head:(hh + 1) * d_head]
        k = qkv_ref[0, :, e + hh * d_head:e + (hh + 1) * d_head]
        v = qkv_ref[0, :, 2 * e + hh * d_head:2 * e + (hh + 1) * d_head]
        do = do_ref[0, :, hh * d_head:(hh + 1) * d_head]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = jnp.where(pad[None, :] > 0.0, -1e9, s)
        p = _softmax_rows(s)
        if dropout_p > 0.0:
            bh = pl.program_id(0) * n_heads + hh
            pltpu.prng_seed(seed_ref[0], bh)
            keep = _keep_mask(p.shape, dropout_p) * (1.0 / (1.0 - dropout_p))
            pd = p * keep
        else:
            keep = None
            pd = p
        dv = jax.lax.dot_general(
            pd.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if keep is not None:
            dp = dp * keep
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = ds.astype(q.dtype)
        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dqkv_ref[0, :, hh * d_head:(hh + 1) * d_head] = (
            dq.astype(dqkv_ref.dtype))
        dqkv_ref[0, :, e + hh * d_head:e + (hh + 1) * d_head] = (
            dk.astype(dqkv_ref.dtype))
        dqkv_ref[0, :, 2 * e + hh * d_head:2 * e + (hh + 1) * d_head] = (
            dv.astype(dqkv_ref.dtype))


def _qkv_specs(t, e3):
    plane = pl.BlockSpec((1, t, e3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.BlockSpec((1, t, e3 // 3), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    mask = pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    return plane, out, mask, seed


def fused_qkv_supported(t: int, e: int, itemsize: int = 4,
                        backend: Optional[str] = None) -> bool:
    """True when the whole-plane (T,3E) kernel fits the scoped-VMEM budget
    (worst case: backward holds qkv + do + dqkv planes + ~4 (T,T) f32
    temporaries). Each pipelined BlockSpec is double-buffered by the Mosaic
    pipeline (same 2x _heads_per charges per block), so the plane term
    counts every operand twice — without it, shapes near the boundary
    (e.g. fp32 E=512, T=512) pass the check yet blow the 16 MB scoped
    VMEM at compile time on real TPU instead of falling back.

    Cap calibration (round 5, measured): the SPIRAL block-1 shape
    (T=392, E=512, fp32) charges 13.06 MB under the 2x rule and
    compiles+runs fwd+bwd on the chip (it carried the whole round-4
    78.7 ms/step artifact) — a 12 MB cap mis-rejected it, regressing the
    fp32 step to 90.9 ms via the per-head fallback. 15 MB admits every
    empirically-working shape while still rejecting the 18 MB
    T=512/E=512 fp32 crash case the 2x charge exists for."""
    if not fused_attention_supported(t, backend):
        return False
    planes = 2 * (3 * e + e + 3 * e) * t * itemsize  # 2x(qkv + do + dqkv)
    temps = 4 * t * t * 4
    return planes + temps < 15 * 2**20


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_qkv_attn(qkv, maskf, seed, n_heads, dropout_p, interpret):
    return _fused_qkv_attn_fwd(
        qkv, maskf, seed, n_heads, dropout_p, interpret)[0]


def _fused_qkv_attn_fwd(qkv, maskf, seed, n_heads, dropout_p, interpret):
    b, t, e3 = qkv.shape
    e = e3 // 3
    plane, out_spec, mask, seed_spec = _qkv_specs(t, e3)
    out = pl.pallas_call(
        functools.partial(_qkv_fwd_kernel, dropout_p=dropout_p,
                          n_heads=n_heads, d_head=e // n_heads),
        grid=(b,),
        in_specs=[mask, seed_spec, plane],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, e), qkv.dtype),
        interpret=interpret,
    )(maskf, seed, qkv)
    return out, (qkv, maskf, seed)


def _fused_qkv_attn_bwd(n_heads, dropout_p, interpret, res, do):
    qkv, maskf, seed = res
    b, t, e3 = qkv.shape
    e = e3 // 3
    plane, out_spec, mask, seed_spec = _qkv_specs(t, e3)
    dqkv = pl.pallas_call(
        functools.partial(_qkv_bwd_kernel, dropout_p=dropout_p,
                          n_heads=n_heads, d_head=e // n_heads),
        grid=(b,),
        in_specs=[mask, seed_spec, plane, out_spec],
        out_specs=plane,
        out_shape=jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
        interpret=interpret,
    )(maskf, seed, qkv, do)
    return dqkv, None, None


_fused_qkv_attn.defvjp(_fused_qkv_attn_fwd, _fused_qkv_attn_bwd)


def fused_qkv_self_attention(
    qkv: jnp.ndarray,
    n_heads: int,
    key_padding_mask: Optional[jnp.ndarray] = None,
    dropout_p: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Merged-projection variant: qkv (B, T, 3E) -> out (B, T, E).

    The q third must already carry the d_head**-0.5 scale (fold it into the
    q slice of the merged projection weight/bias — free at trace time).
    Heads are static column slices inside the kernel; the gradient comes
    back as one (B, T, 3E) plane, exactly the operand layout the merged
    projection's backward matmul wants. Semantics (masking, f32 softmax,
    per-(b,h) dropout streams) match fused_self_attention."""
    b, t, e3 = qkv.shape
    if not interpret and not fused_qkv_supported(
            t, e3 // 3, qkv.dtype.itemsize):
        raise ValueError(
            f"fused qkv attention unsupported here (T={t}, 3E={e3})"
        )
    if key_padding_mask is None:
        maskf = jnp.zeros((b, 1, t), dtype=jnp.float32)
    else:
        maskf = key_padding_mask.astype(jnp.float32).reshape(b, 1, t)
    if dropout_p > 0.0:
        if dropout_seed is None:
            raise ValueError("dropout_p > 0 requires dropout_seed")
        seed = jnp.asarray(dropout_seed, dtype=jnp.int32).reshape(1)
    else:
        seed = jnp.zeros((1,), dtype=jnp.int32)
    return _fused_qkv_attn(
        qkv, maskf, seed, n_heads, float(dropout_p), interpret)


def fused_self_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_padding_mask: Optional[jnp.ndarray] = None,
    dropout_p: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q @ k^T + pad-fill) [dropout] @ v, fused in VMEM.

    q, k, v: (B, T, H, D) — q pre-scaled by the caller (d_head**-0.5).
    key_padding_mask: (B, T) bool, True = padded key (reference convention,
        multihead_attention.py key_padding_mask) — filled with -1e9 exactly
        like the XLA path's jnp.where.
    dropout_p: static attention-prob dropout rate (0.0 disables the PRNG).
        Requires the TPU backend (no interpret-mode lowering for the
        Pallas PRNG primitives in this JAX version).
    dropout_seed: int32 scalar; required when dropout_p > 0. The (seed, b, h)
        triple seeds the per-core PRNG, so a given seed reproduces the same
        mask in forward and backward.
    Returns (B, T, H, D).
    """
    b, t, h, d = q.shape
    if not interpret and not fused_attention_supported(t):
        raise ValueError(
            f"fused attention unsupported here (T={t} > {MAX_T} or non-TPU "
            "backend); use the XLA path"
        )
    if key_padding_mask is None:
        maskf = jnp.zeros((b, 1, t), dtype=jnp.float32)
    else:
        maskf = key_padding_mask.astype(jnp.float32).reshape(b, 1, t)
    if dropout_p > 0.0:
        if dropout_seed is None:
            raise ValueError("dropout_p > 0 requires dropout_seed")
        seed = jnp.asarray(dropout_seed, dtype=jnp.int32).reshape(1)
    else:
        seed = jnp.zeros((1,), dtype=jnp.int32)
    # kernel layout (B, H, T, D); transposes are fused by XLA where possible
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    out = _fused_attn(qt, kt, vt, maskf, seed, float(dropout_p), interpret)
    return jnp.transpose(out, (0, 2, 1, 3))
