"""True-completion transfer sweep: time-to-device_get(sum(x)) forces the
data onto the device, immune to client-side is_ready optimism.

Phases: S0 fresh -> S0b after compile-only of the big step -> S2 after one
step execution -> S2-heal after 90 s idle.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_speech_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tpu_speech.models.spiral.st2vec import (  # noqa: E402
    ST2VecEncoder,
    spiral_base_config,
)
from tpu_speech.train.spiral import (  # noqa: E402
    host_augment_batch,
    init_spiral_state,
    make_pretrain_step,
)
from tpu_speech.train.spiral_runner import _spec_len  # noqa: E402

BATCH = 24
CROP = 250000
SIZES_MB = (1, 6, 24, 48)


def main():
    probes = {}
    datas = {}
    rng = np.random.default_rng(0)
    for mb in SIZES_MB:
        n = mb * 250000
        probes[mb] = jax.jit(lambda a: jnp.sum(a) * 1e-9)
        datas[mb] = rng.standard_normal((n,)).astype(np.float32)
        # compile each probe now, on tiny data of the SAME shape? shape must
        # match: compile on the real shape once here (fresh link, fast)
        float(probes[mb](jnp.zeros((n,), jnp.float32)))

    def sweep(tag):
        for mb in SIZES_MB:
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                d = jax.device_put(datas[mb])
                s = probes[mb](d)
                float(s)  # device_get: true completion
                ts.append(time.perf_counter() - t0)
                del d
            print(f"{tag}: {mb} MB put+sum+get med "
                  f"{np.median(ts)*1e3:.0f} ms", flush=True)

    sweep("S0 fresh")

    cfg = spiral_base_config()
    spec_len = _spec_len(CROP, cfg.sample_rate)
    model = ST2VecEncoder(cfg)
    tx = optax.adamw(3e-3, b1=0.9, b2=0.98, eps=1e-6, weight_decay=0.01)
    state = init_spiral_state(
        model, jax.random.PRNGKey(0), (BATCH, spec_len, cfg.num_features), tx)
    jax.block_until_ready(state.params)
    step = make_pretrain_step(model, cfg, tx)
    base_key = jax.random.key(0, impl="rbg")

    wavs = (rng.standard_normal((BATCH, CROP)) * 0.1).astype(np.float32)
    lens = np.full((BATCH,), CROP, dtype=np.int32)
    raw = host_augment_batch(
        cfg, wavs, lens, wavs.copy(), lens.copy(), spec_len,
        np.random.default_rng(0))
    staged = jax.device_put(jax.tree.map(jnp.asarray, raw))
    jax.block_until_ready(staged)

    # compile WITHOUT executing (AOT): does the executable load alone
    # degrade the link?
    t0 = time.perf_counter()
    compiled = jax.jit(step, donate_argnums=(0,)).lower(
        state, staged, base_key).compile()
    print(f"AOT compile (cache): {time.perf_counter()-t0:.1f} s", flush=True)
    sweep("S0b after compile-only")

    t0 = time.perf_counter()
    state, m = compiled(state, staged, base_key)
    jax.device_get(m["loss"])
    print(f"first execute: {time.perf_counter()-t0:.1f} s", flush=True)
    sweep("S2 after execute")

    print("sleeping 90 s ...", flush=True)
    time.sleep(90)
    sweep("S2-heal after idle")


if __name__ == "__main__":
    main()
