"""Benchmark: Grad-TTS 10-step reverse-SDE inference RTF on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the BASELINE.md north-star target RTF = 0.02 on TPU v5e
(reference measures RTF the same way: wall_time * sample_rate / (frames * hop),
Grad-TTS/inference.py:79). vs_baseline = target_rtf / measured_rtf, so > 1.0
means faster than the target.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpu_speech.models.grad_tts import GradTTS, synthesize  # noqa: E402
from tpu_speech.text import intersperse, symbols, text_to_sequence  # noqa: E402

SAMPLE_RATE = 22050
HOP = 256
BUCKET = 384  # mel-frame bucket (~4.5 s of speech)
N_STEPS = 10
TARGET_RTF = 0.02

TEXT = (
    "The quick brown fox jumps over the lazy dog while the curious cat "
    "watches from a sunlit windowsill in the early morning."
)


def main():
    model = GradTTS(n_vocab=len(symbols) + 1)
    seq = intersperse(text_to_sequence(TEXT, ["english_cleaners"]), len(symbols))
    x = jnp.asarray(np.array([seq], dtype=np.int32))
    xl = jnp.array([x.shape[1]], dtype=jnp.int32)

    y = jnp.zeros((1, 64, 80))
    yl = jnp.array([64])
    params = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, x, xl, y, yl,
        jax.random.PRNGKey(1), train=False,
    )

    @jax.jit
    def synth(p, x, xl, rng):
        return synthesize(
            model, p, x, xl, n_timesteps=N_STEPS, y_max_length=BUCKET,
            temperature=1.5, length_scale=0.91, rng=rng,
        )

    # warmup/compile
    _, dec, _, ylen = synth(params, x, xl, jax.random.PRNGKey(0))
    dec.block_until_ready()

    times = []
    for i in range(10):
        t0 = time.perf_counter()
        _, dec, _, ylen = synth(params, x, xl, jax.random.PRNGKey(i))
        dec.block_until_ready()
        times.append(time.perf_counter() - t0)

    t = float(np.median(times))
    n_frames = int(ylen[0])
    rtf = t * SAMPLE_RATE / (n_frames * HOP)
    print(
        json.dumps(
            {
                "metric": "gradtts_rtf_10step",
                "value": round(rtf, 6),
                "unit": "rtf",
                "vs_baseline": round(TARGET_RTF / rtf, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
