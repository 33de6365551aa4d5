"""Experiment matrix for the transfer-under-load pathology.

Round-4 finding: on the tunneled dev chip, a ~48 MB device_put takes 34 ms
idle but 550-980 ms while steps are in flight — transfers serialize against
queued compute RPCs. This script measures candidate overlap schemes:

  A. transfer time vs number of in-flight steps (0/1/2/3)
  B. numpy args passed straight to the jitted step (dispatch-time staging)
  C. packed single-buffer transfer (2 leaves -> 1) under load
  D. steady-state loader-fed rate for each scheme

Uses the same shapes as bench_input_pipeline so the compiled step comes from
the persistent cache.
"""

import json
import os
import sys
import tempfile
import time
from collections import deque

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


def main():
    cfg = spiral_base_config()
    spec_len = _spec_len(CROP, cfg.sample_rate)
    rng = np.random.default_rng(0)
    wavs = (rng.standard_normal((BATCH, CROP)) * 0.1).astype(np.float32)
    lens = np.full((BATCH,), CROP, dtype=np.int32)
    host_rng = np.random.default_rng(0)

    def make_raw():
        return host_augment_batch(
            cfg, wavs, lens, wavs.copy(), lens.copy(), spec_len, host_rng)

    model = ST2VecEncoder(cfg)
    tx = optax.adamw(3e-3, b1=0.9, b2=0.98, eps=1e-6, weight_decay=0.01)
    state = init_spiral_state(
        model, jax.random.PRNGKey(0), (BATCH, spec_len, cfg.num_features), tx)
    step = make_pretrain_step(model, cfg, tx)
    base_key = jax.random.key(0, impl="rbg")

    staged = jax.device_put(jax.tree.map(jnp.asarray, make_raw()))
    jax.block_until_ready(staged)
    t0 = time.perf_counter()
    for i in range(3):
        state, m = step(state, staged, jax.random.fold_in(base_key, i))
    jax.device_get(m["loss"])
    print(f"warm (compile or cache): {time.perf_counter()-t0:.1f} s",
          flush=True)

    # steady-state step time, fully pre-staged
    t0 = time.perf_counter()
    n = 10
    pend = deque()
    for i in range(n):
        state, m = step(state, staged, jax.random.fold_in(base_key, 10 + i))
        pend.append(m["loss"])
        while len(pend) > 2:
            jax.device_get(pend.popleft())
    while pend:
        jax.device_get(pend.popleft())
    step_ms = (time.perf_counter() - t0) / n * 1e3
    print(f"prestaged step: {step_ms:.1f} ms", flush=True)

    # ---- A: transfer vs in-flight depth ----
    raw = make_raw()
    for depth in (0, 1, 2, 3):
        ts = []
        for rep in range(4):
            ms = []
            for i in range(depth):
                state, m = step(
                    state, staged, jax.random.fold_in(base_key, 200 + i))
                ms.append(m["loss"])
            t0 = time.perf_counter()
            out = jax.device_put(jax.tree.map(jnp.asarray, raw))
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
            for x in ms:
                jax.device_get(x)
        print(f"A: transfer with {depth} in-flight: "
              f"med {np.median(ts)*1e3:.1f} ms", flush=True)

    # ---- A2: issue-only (no block) with 2 in flight ----
    ts = []
    for rep in range(4):
        ms = []
        for i in range(2):
            state, m = step(
                state, staged, jax.random.fold_in(base_key, 300 + i))
            ms.append(m["loss"])
        t0 = time.perf_counter()
        out = jax.device_put(jax.tree.map(jnp.asarray, raw))
        ts.append(time.perf_counter() - t0)  # no block_until_ready
        jax.block_until_ready(out)
        for x in ms:
            jax.device_get(x)
    print(f"A2: device_put ISSUE-only with 2 in-flight: "
          f"med {np.median(ts)*1e3:.1f} ms", flush=True)

    # ---- A3: plain device_put of the raw numpy tree (no jnp.asarray) ----
    ts = []
    for rep in range(4):
        ms = []
        for i in range(2):
            state, m = step(
                state, staged, jax.random.fold_in(base_key, 400 + i))
            ms.append(m["loss"])
        t0 = time.perf_counter()
        out = jax.device_put(raw)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
        for x in ms:
            jax.device_get(x)
    print(f"A3: device_put(numpy tree) with 2 in-flight: "
          f"med {np.median(ts)*1e3:.1f} ms", flush=True)

    # ---- B: numpy args straight into the jitted step, steady state ----
    def run_arm(batch_iter, st, n_steps, label):
        pend = deque()
        t0 = time.perf_counter()
        i = -1
        for i, b in enumerate(batch_iter):
            st, m = step(st, b, jax.random.fold_in(base_key, 500 + i))
            pend.append(m["loss"])
            while len(pend) > 2:
                jax.device_get(pend.popleft())
        while pend:
            jax.device_get(pend.popleft())
        ms = (time.perf_counter() - t0) / (i + 1) * 1e3
        print(f"{label}: {ms:.1f} ms/step (eff {step_ms/ms:.3f})", flush=True)
        return st

    raws = [make_raw() for _ in range(6)]
    state = run_arm(iter(raws), state, 6, "B: numpy args at dispatch")

    # ---- C: producer thread device_put (the round-3 scheme) ----
    from tpu_speech.data.prefetch import threaded_prefetch

    def gen():
        for r in raws:
            yield jax.device_put(jax.tree.map(jnp.asarray, r))

    state = run_arm(threaded_prefetch(gen), state, 6,
                    "C: producer-thread device_put (r3 scheme)")

    # ---- D: producer thread passes numpy through the queue ----
    def gen2():
        for r in raws:
            yield r

    state = run_arm(threaded_prefetch(gen2), state, 6,
                    "D: producer numpy, dispatch-time staging")


if __name__ == "__main__":
    main()
