"""Attribute the Grad-TTS e2e serving time on the real chip.

Times each stage of the serving graph separately (encoder+alignment, one
U-Net call, the 10-step SDE scan, HiFi-GAN vocode) under the same chained
dispatch methodology as bench.py, fp32 vs bf16-cast params, so the README
can state *where* the per-utterance milliseconds go and why bf16 does or
does not pay at serving. Run: python scripts/profile_serving.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_speech_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, ".")

from tpu_speech.models.grad_tts import GradTTS, synthesize  # noqa: E402
from tpu_speech.models.hifigan import Generator  # noqa: E402
from tpu_speech.text import intersperse, symbols, text_to_sequence  # noqa: E402

BUCKET = 384
CHAIN = 16
TEXT = (
    "The quick brown fox jumps over the lazy dog while the curious cat "
    "watches from a sunlit windowsill in the early morning."
)


def timed(fn, *args, n=10, warmup=3):
    for _ in range(warmup):
        out = jax.device_get(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = jax.device_get(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def cast_bf16(tree):
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, tree)


def main():
    model = GradTTS(n_vocab=len(symbols) + 1)
    seq = intersperse(text_to_sequence(TEXT, ["english_cleaners"]), len(symbols))
    x = jnp.asarray(np.array([seq], dtype=np.int32))
    xl = jnp.array([x.shape[1]], dtype=jnp.int32)
    params32 = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, x, xl, jnp.zeros((1, 64, 80)),
        jnp.array([64]), jax.random.PRNGKey(1), train=False)
    voc = Generator()
    voc32 = jax.jit(voc.init)(jax.random.PRNGKey(2), jnp.zeros((1, BUCKET, 80)))

    # the chain scans over PER-ITERATION token inputs (xs tiled to CHAIN):
    # with a loop-invariant x, XLA's while-loop-invariant code motion hoists
    # the text-encoder/alignment subgraph out of the scan and runs it once
    # per dispatch, deflating the per-utterance encoder figure by up to
    # CHAIN x. Scanned xs are dynamic per iteration, so nothing hoists.
    xs = jnp.tile(x[None], (CHAIN, 1, 1))
    xls = jnp.tile(xl[None], (CHAIN, 1))

    for name, params, vocp in (
        ("fp32", params32, voc32),
        ("bf16", cast_bf16(params32), cast_bf16(voc32)),
    ):
        # stage 1+2: text encoder + alignment + 10-step SDE (mel only)
        def mel_chain(p, xs, xls, rng, n_steps):
            def body(_, xkl):
                xi, xli, k = xkl
                _, dec, _, ylen = synthesize(
                    model, p, xi, xli, n_timesteps=n_steps,
                    y_max_length=BUCKET,
                    temperature=1.5, length_scale=0.91, rng=k)
                return 0.0, (dec, ylen)
            _, (decs, ylens) = jax.lax.scan(
                body, 0.0, (xs, xls, jax.random.split(rng, CHAIN)))
            return decs, ylens

        mel10 = jax.jit(lambda p, xs, xls, r: mel_chain(p, xs, xls, r, 10))
        mel1 = jax.jit(lambda p, xs, xls, r: mel_chain(p, xs, xls, r, 1))
        t10, (decs, _) = timed(mel10, params, xs, xls, jax.random.PRNGKey(0))
        t1, _ = timed(mel1, params, xs, xls, jax.random.PRNGKey(0))

        # cross-check: encoder+alignment timed alone on the same scanned
        # inputs — catches any residual motion in the subtracted estimate
        @jax.jit
        def enc_chain(p, xs, xls):
            def body(_, xkl):
                xi, xli = xkl
                mu_x, logw, x_mask = model.apply(
                    p, xi, xli, None, method=GradTTS.encode)
                return 0.0, mu_x.astype(jnp.float32).mean()
            _, outs = jax.lax.scan(body, 0.0, (xs, xls))
            return outs

        te, _ = timed(enc_chain, params, xs, xls)

        # stage 3: vocoder alone, chained on the produced mels
        @jax.jit
        def voc_chain(vp, decs):
            def body(_, dec):
                pcm = (jnp.clip(
                    voc.apply(vp, dec).astype(jnp.float32), -1, 1)
                    * 32767.0).astype(jnp.int16)
                return 0.0, pcm
            _, wavs = jax.lax.scan(body, 0.0, decs)
            return wavs

        tv, _ = timed(voc_chain, vocp, decs)
        per = 1e3 / CHAIN
        unet_call = (t10 - t1) * per / 9.0
        enc = t1 * per - unet_call  # encoder+align+1 unet -> subtract the call
        print(f"[{name}] per-utterance ms: mel10={t10*per:.2f} "
              f"(encoder+align~{enc:.2f} [standalone {te*per:.2f}], "
              f"unet/call~{unet_call:.2f} x10) "
              f"vocoder+pcm={tv*per:.2f} total~{t10*per + tv*per:.2f}")


if __name__ == "__main__":
    main()
