"""Op-level XLA trace of the Grad-TTS train step (top self-time HLO ops).

Round-3 verdict item 4: the Grad-TTS train step is the worst MFU in the
suite (47.0 ms fp32 / 12.4%) and was never attributed. Same method as
trace_spiral_step.py, at the reference recipe point (train.py:97-175,
params.py:45-53: batch 16, out_size = 2-s crop, Adam, per-module clip).

Usage: python scripts/trace_gradtts_step.py [--bf16] [--top 40]
"""

import argparse
import glob
import os
import sys
import tempfile
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_speech_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tpu_speech.models.grad_tts import GradTTS  # noqa: E402
from tpu_speech.text import symbols  # noqa: E402

SAMPLE_RATE = 22050
HOP = 256


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--chain", type=int, default=4)
    ap.add_argument("--logdir", default=None)
    args = ap.parse_args()

    import optax

    from tpu_speech.ops.masks import fix_len_compatibility
    from tpu_speech.train.gradtts import make_train_step
    from tpu_speech.train.state import TrainState

    batch_size = 16
    model = GradTTS(n_vocab=len(symbols) + 1)
    rng = np.random.default_rng(0)
    t_x, t_y = 72, 512
    out_size = int(fix_len_compatibility(2 * SAMPLE_RATE // HOP))
    batch = {
        "x": jnp.asarray(rng.integers(
            1, len(symbols), size=(batch_size, t_x)).astype(np.int32)),
        "x_lengths": jnp.full((batch_size,), t_x, dtype=jnp.int32),
        "y": jnp.asarray(rng.standard_normal(
            (batch_size, t_y, 80)).astype(np.float32)),
        "y_lengths": jnp.full((batch_size,), t_y, dtype=jnp.int32),
    }
    params = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, batch["x"][:1],
        batch["x_lengths"][:1], batch["y"][:1, :64], jnp.array([64]),
        jax.random.PRNGKey(1), train=False,
    )
    tx = optax.adam(1e-4)
    state = TrainState.create({"params": params["params"]}, tx)
    step = make_train_step(model, tx, out_size=out_size, bf16=args.bf16)

    @partial(jax.jit, donate_argnums=(0,))
    def run_chain(st, batch, key):
        def it(st, i):
            st, m = step(st, batch, jax.random.fold_in(key, i))
            return st, m["loss"]
        return jax.lax.scan(it, st, jnp.arange(args.chain))

    base_key = jax.random.key(0, impl="rbg")  # cli/train.py default
    state, losses = run_chain(state, batch, jax.random.fold_in(base_key, 0))
    jax.device_get(losses)

    logdir = args.logdir or tempfile.mkdtemp(prefix="gradtts_trace_")
    with jax.profiler.trace(logdir):
        state, losses = run_chain(
            state, batch, jax.random.fold_in(base_key, 1))
        jax.device_get(losses)

    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        raise SystemExit(f"no xplane captured under {logdir}")
    xplane = max(xplanes, key=os.path.getmtime)
    print(f"trace: {xplane}", flush=True)

    from trace_spiral_step import top_ops
    top_ops(xplane, args.top, args.chain)


if __name__ == "__main__":
    main()
