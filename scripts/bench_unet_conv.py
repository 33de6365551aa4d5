"""Micro-benchmark: Grad-TTS U-Net 3x3 conv shapes vs chip rooflines.

VERDICT r4 weak #3: the Grad-TTS bf16 train step (28.1 ms, MFU 21.7%) has
no stated bound like the fp32 one (bf16x3-pass emulation roofline). This
measures, at the train operating point (B=16, out_size=172 crop, NHWC):

  - each U-Net level's 3x3 conv (reference GradLogPEstimator2d shapes,
    Grad-TTS/model/diffusion.py:174-216: dim=64, mults (1,2,4) ->
    (80,172,64), (40,86,128), (20,43,256)) in bf16 and fp32, fwd and
    fwd+bwd, with effective TF/s;
  - the chip's dense bf16/fp32 matmul peak (8k cube) as the roofline
    anchor;
  - the channel-padding A/B: the level-1 conv zero-padded to 128 channels
    (2x/4x FLOPs at full lane fill). If padded wall-time < unpadded
    wall-time, a lane-fill win exists; if >=, dim-64 stays.

Run: python scripts/bench_unet_conv.py          (on the axon chip)
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

from tpu_speech.nn.convops import conv2d  # noqa: E402

# (B, H, W, Cin, Cout) for one 3x3 pad-1 conv at each U-Net resolution
# (shape-preserving so the activation can be chained through the conv)
SHAPES = (
    (16, 80, 172, 64, 64),
    (16, 40, 86, 128, 128),
    (16, 20, 43, 256, 256),
    # channel-padding A/B twin for level 1 (same spatial, C padded to 128):
    # a lane-fill win exists iff this is FASTER in wall time than 64->64
    (16, 80, 172, 128, 128),
)
CHAIN = 1024  # the dev tunnel costs ~29 ms per dispatch+sync round trip;
# sub-ms ops need a long chain so that floor divides away (29/1024 = 0.03 ms)
MM_CHAIN = 64
REPS = 5


def timed(run, *args):
    for _ in range(2):
        jax.device_get(run(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.device_get(run(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / run.chain


def chain_fwd(f, chain=None):
    """Carry the ACTIVATION through CHAIN conv applications (shape-
    preserving convs only) so per-iteration harness overhead (carry
    elementwise + reduce) is paid once per timed run, not per conv."""
    @jax.jit
    def run(x, w):
        def body(y, _):
            y = f(y, w)
            return y * 1e-2, None  # keep magnitudes bounded
        y, _ = lax.scan(body, x, None, length=chain or CHAIN)
        return y.astype(jnp.float32).mean()
    run.chain = chain or CHAIN
    return run


def chain_grad(f, inner=8, outer=128):
    """inner convs inside the differentiated region (bounds the stored
    residuals to inner activations), outer grad computations chained by
    feeding dx back in — inner*outer total conv fwd+bwd per timed run."""
    def loss(x, w):
        def body(y, _):
            return f(y, w) * 1e-2, None
        y, _ = lax.scan(body, x, None, length=inner)
        return (y.astype(jnp.float32) ** 2).sum()

    g = jax.grad(loss, argnums=(0, 1))

    @jax.jit
    def run(x, w):
        def obody(carry, _):
            x, wacc = carry
            dx, dw = g(x, w)
            # carry dw too, or XLA dead-code-eliminates the weight-grad conv
            # (first version measured an impossible >peak "fwd+bwd" TF/s)
            return (dx * 1e2, wacc + dw), None
        (x, wacc), _ = lax.scan(
            obody, (x, jnp.zeros_like(w)), None, length=outer)
        return x.astype(jnp.float32).mean() + wacc.astype(jnp.float32).mean()
    run.chain = inner * outer
    return run


def bench_matmul_peak():
    n = 8192
    rng = np.random.default_rng(0)
    a32 = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    b32 = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    flops = 2 * n * n * n
    print("== dense matmul peak (8192^3) ==")
    for dt, tag in ((jnp.bfloat16, "bf16"), (jnp.float32, "fp32")):
        a, b = a32.astype(dt), b32.astype(dt)
        t = timed(chain_fwd(lambda x, w: x @ w, chain=MM_CHAIN), a, b)
        print(f"matmul {tag}: {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF/s")


def main():
    bench_matmul_peak()
    rng = np.random.default_rng(0)
    conv = lambda x, w: conv2d(x, w, padding=1)  # noqa: E731
    for b, h, wdt, ci, co in SHAPES:
        x32 = jnp.asarray(
            rng.standard_normal((b, h, wdt, ci)).astype(np.float32))
        w32 = jnp.asarray(
            (rng.standard_normal((3, 3, ci, co)) * 0.05).astype(np.float32))
        flops = 2 * b * h * wdt * 9 * ci * co
        print(f"\n== B{b} {h}x{wdt} {ci}->{co} 3x3 (fwd {flops/1e9:.1f} GF) ==")
        for dt, tag in ((jnp.bfloat16, "bf16"), (jnp.float32, "fp32")):
            x, w = x32.astype(dt), w32.astype(dt)
            tf_ = timed(chain_fwd(conv), x, w)
            tg = timed(chain_grad(conv), x, w)
            print(
                f"conv {tag}  fwd {tf_*1e3:7.3f} ms"
                f" ({flops/tf_/1e12:6.1f} TF/s)"
                f"  fwd+bwd {tg*1e3:7.3f} ms"
                f" ({3*flops/tg/1e12:6.1f} TF/s)"
            )


if __name__ == "__main__":
    main()
