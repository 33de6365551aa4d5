"""Isolate WHAT makes big H2D transfers slow: resident state? executed
program? transfer size? leaf count?

Sequence (one process):
  0. fresh: size sweep of device_put readiness times
  1. after init_spiral_state (heavy params resident, nothing executed)
  2. after one step execution
  3. after deleting the state
Plus: one fused 48 MB leaf vs 2x24 MB vs 8x6 MB.
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


def wait_ready(arrs, poll=0.002, timeout=60.0):
    t0 = time.perf_counter()
    leaves = jax.tree.leaves(arrs)
    while True:
        if all(a.is_ready() for a in leaves):
            return time.perf_counter() - t0
        if time.perf_counter() - t0 > timeout:
            return float("inf")
        time.sleep(poll)


def sweep(tag):
    rng = np.random.default_rng(0)
    for mb in (1, 6, 24, 48):
        x = rng.standard_normal((mb * 250000,)).astype(np.float32)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            d = jax.device_put(x)
            issue = time.perf_counter() - t0
            ts.append(wait_ready(d))
            del d
        print(f"{tag}: {mb} MB put ready med "
              f"{np.median(ts)*1e3:.0f} ms (last issue {issue*1e3:.0f} ms)",
              flush=True)
    # leaf-count variants at 48 MB total
    for n in (2, 8):
        xs = [rng.standard_normal((48 * 250000 // n,)).astype(np.float32)
              for _ in range(n)]
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            ds = [jax.device_put(x) for x in xs]
            ts.append(wait_ready(ds))
            del ds
        print(f"{tag}: 48 MB in {n} leaves ready med "
              f"{np.median(ts)*1e3:.0f} ms", flush=True)


def main():
    jnp.ones((8,)).block_until_ready()
    sweep("S0 fresh")

    cfg = spiral_base_config()
    spec_len = _spec_len(CROP, cfg.sample_rate)
    model = ST2VecEncoder(cfg)
    tx = optax.adamw(3e-3, b1=0.9, b2=0.98, eps=1e-6, weight_decay=0.01)
    state = init_spiral_state(
        model, jax.random.PRNGKey(0), (BATCH, spec_len, cfg.num_features), tx)
    jax.block_until_ready(state.params)
    sweep("S1 state resident")

    rng = np.random.default_rng(0)
    wavs = (rng.standard_normal((BATCH, CROP)) * 0.1).astype(np.float32)
    lens = np.full((BATCH,), CROP, dtype=np.int32)
    raw = host_augment_batch(
        cfg, wavs, lens, wavs.copy(), lens.copy(), spec_len,
        np.random.default_rng(0))
    staged = jax.device_put(jax.tree.map(jnp.asarray, raw))
    jax.block_until_ready(staged)
    step = make_pretrain_step(model, cfg, tx)
    base_key = jax.random.key(0, impl="rbg")
    t0 = time.perf_counter()
    state, m = step(state, staged, base_key)
    jax.device_get(m["loss"])
    print(f"step warm: {time.perf_counter()-t0:.1f} s", flush=True)
    sweep("S2 after step ran")

    del state, m, staged
    sweep("S3 state deleted")


if __name__ == "__main__":
    main()
