"""Micro-benchmark: stride-2 subsampling-conv formulations on the chip.

VERDICT r4 #8: the SPIRAL feature-encoder's three stride-2 k=5 convs
(spec2vec.py:27-125 shapes: 128->384, 384->512, 512->1536) are dense in
channels, so unlike the grouped positional conv they could in principle be
reformulated as full-lane MXU matmuls. This measures, at the production
SPIRAL-base pretrain shapes (B=24, 250k-sample crops -> 1568 spec frames,
student branch):

  conv    lax.conv_general_dilated NHC stride 2 (current, conv_layers.py:86)
  taps    per-tap matmul sum: y[t] = sum_k xp[2t+k] @ W[k] — five dense
          (B*Tout, Cin) x (Cin, Cout) matmuls over phase-sliced inputs
  im2col  patch concat (B, Tout, 5*Cin) then ONE deep matmul
          (5*Cin, Cout) — maximal contraction depth, one big MXU op

All three share the reference TF 'same' pad quirk (asymmetric (p-1, p) for
even in_ch at stride 2, convolution_layers.py:225-228) so outputs are
bit-comparable. fp32 and bf16, fwd and fwd+bwd chains.

Run: python scripts/bench_subconv.py          (on the axon chip)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_speech_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, ".")

from tpu_speech.models.spiral.conv_layers import tf_pad_1d  # noqa: E402

K, S = 5, 2
# (B, T_in, C_in, C_out): the three stride-2 convs of spiral_base_blocks()
SHAPES = (
    (24, 1568, 128, 384),
    (24, 784, 384, 512),
    (24, 392, 512, 1536),
)
CHAIN = 32
REPS = 5


def conv(x, w):
    pads = tf_pad_1d(K, S, x.shape[-1])
    return lax.conv_general_dilated(
        x, w, (S,), [pads], dimension_numbers=("NHC", "HIO", "NHC"),
    )


def _pad_to_phases(x):
    """TF-same pad, then (B, T_pad, C) with T_pad even and a static map
    xp[2t + k] for t in [0, Tout)."""
    b, t, c = x.shape
    pl, pr = tf_pad_1d(K, S, c)
    tout = (t + pl + pr - K) // S + 1  # == lax.conv's output length
    # each phase needs tout + K//2 rows (tap k reads phase k%2 at t + k//2)
    need = 2 * (tout + K // 2)
    xp = jnp.pad(x, ((0, 0), (pl, max(pr, need - t - pl)), (0, 0)))
    return xp, tout


def taps(x, w):
    xp, tout = _pad_to_phases(x)
    b, tp, c = xp.shape
    # phase decomposition: xp2[:, t, ph] == xp[:, 2t + ph] without strided
    # slicing — a pure reshape. Tap k at output t reads phase (k%2) index
    # t + k//2.
    half = tp // 2
    xp2 = xp[:, : half * 2].reshape(b, half, 2, c)
    y = None
    for k in range(K):
        ph, off = k % 2, k // 2
        xk = lax.slice_in_dim(xp2[:, :, ph], off, off + tout, axis=1)
        t = jnp.einsum("btc,cf->btf", xk, w[k])
        y = t if y is None else y + t
    return y


def im2col(x, w):
    xp, tout = _pad_to_phases(x)
    b, tp, c = xp.shape
    half = tp // 2
    xp2 = xp[:, : half * 2].reshape(b, half, 2, c)
    cols = []
    for k in range(K):
        ph, off = k % 2, k // 2
        cols.append(lax.slice_in_dim(xp2[:, :, ph], off, off + tout, axis=1))
    patches = jnp.concatenate(cols, axis=-1)            # (B, Tout, K*C)
    wf = w.reshape(K * c, -1)                           # (K*C, Cout)
    return jnp.einsum("btc,cf->btf", patches, wf)


def timed_chain(f, x, w):
    @jax.jit
    def run(x, w):
        def body(c, _):
            y = f(x + (c * 1e-30).astype(x.dtype), w)
            return y.astype(jnp.float32).mean(), None
        c, _ = lax.scan(body, jnp.float32(0.0), None, length=CHAIN)
        return c

    for _ in range(2):
        jax.device_get(run(x, w))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.device_get(run(x, w))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / CHAIN


def timed_chain_grad(f, x, w):
    g = jax.grad(
        lambda x, w: (f(x, w).astype(jnp.float32) ** 2).sum(), argnums=(0, 1))

    @jax.jit
    def run(x, w):
        def body(c, _):
            dx, dw = g(x + (c * 1e-30).astype(x.dtype), w)
            return dx.astype(jnp.float32).mean(), None
        c, _ = lax.scan(body, jnp.float32(0.0), None, length=CHAIN)
        return c

    for _ in range(2):
        jax.device_get(run(x, w))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.device_get(run(x, w))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / CHAIN


def main():
    rng = np.random.default_rng(0)
    fns = [("conv", conv), ("taps", taps), ("im2col", im2col)]
    for b, t, ci, co in SHAPES:
        x32 = jnp.asarray(rng.standard_normal((b, t, ci)).astype(np.float32))
        w32 = jnp.asarray(
            (rng.standard_normal((K, ci, co)) * 0.05).astype(np.float32))
        tout = (t + S - 1) // S
        flops = 2 * b * tout * K * ci * co
        ref = np.asarray(conv(x32, w32))
        print(f"\n== B{b} T{t} {ci}->{co} s2k5 (fwd {flops/1e9:.1f} GF) ==")
        for name, f in fns:
            got = np.asarray(f(x32, w32))
            err = float(np.max(np.abs(got - ref)))
            assert got.shape == ref.shape, (name, got.shape, ref.shape)
            for dt, tag in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
                x, w = x32.astype(dt), w32.astype(dt)
                tf_ = timed_chain(f, x, w)
                tg = timed_chain_grad(f, x, w)
                print(
                    f"{name:7s} {tag}  fwd {tf_*1e3:7.3f} ms"
                    f" ({flops/tf_/1e12:6.1f} TF/s)"
                    f"  fwd+bwd {tg*1e3:7.3f} ms"
                    f" ({3*flops/tg/1e12:6.1f} TF/s)"
                    f"  maxerr {err:.2e}"
                )


if __name__ == "__main__":
    main()
