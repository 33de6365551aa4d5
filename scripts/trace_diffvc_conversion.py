"""Op-level XLA trace of the DiffVC 30-step `ml` conversion (serving path).

Same method as trace_spiral_step.py, at the bench operating point
(bench.py::bench_diffvc_conversion: 256 frames, production dims, chain 8).

Usage: python scripts/trace_diffvc_conversion.py [--top 30]
"""

import argparse
import glob
import os
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_speech_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--mode", default="ml", choices=["pf", "em", "ml", "dpm"])
    ap.add_argument("--steps", type=int, default=None,
                    help="default: 30 (6 for --mode=dpm)")
    ap.add_argument("--logdir", default=None)
    args = ap.parse_args()

    from tpu_speech.models.diffvc.vc import DiffVC, voice_convert

    model = DiffVC()
    rng = np.random.default_rng(0)
    frames = 256
    x = jnp.asarray(rng.standard_normal((1, frames, 80)).astype(np.float32))
    x_ref = jnp.asarray(
        rng.standard_normal((1, frames, 80)).astype(np.float32))
    xl = jnp.array([frames], dtype=jnp.int32)
    c = jnp.asarray(rng.standard_normal((1, 256)).astype(np.float32))
    params = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, xl, x_ref, c, jax.random.PRNGKey(1),
        train=True,
    )

    n_steps = args.steps or (6 if args.mode == "dpm" else 30)

    @jax.jit
    def convert_chain(p, x, xl, x_ref, c, rng):
        def body(_, k):
            _, y = voice_convert(
                model, p, x, xl, x_ref, xl, c, n_timesteps=n_steps,
                mode=args.mode, rng=k,
            )
            return 0.0, y
        _, ys = jax.lax.scan(body, 0.0, jax.random.split(rng, args.chain))
        return ys

    out = convert_chain(params, x, xl, x_ref, c, jax.random.PRNGKey(0))
    jax.device_get(out)

    logdir = args.logdir or tempfile.mkdtemp(prefix="diffvc_trace_")
    with jax.profiler.trace(logdir):
        out = convert_chain(params, x, xl, x_ref, c, jax.random.PRNGKey(1))
        jax.device_get(out)

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
