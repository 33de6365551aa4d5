"""Readiness-timeline probe for the transfer-under-load pathology.

Distinguishes 'the transfer is genuinely slow once training state is
resident' from 'the client-side wait (block_until_ready/device_get) is a
slow-polling artifact of the tunnel'. Uses jax.Array.is_ready() polling to
timestamp when the transferred buffers and the dependent step output
actually become ready.

Must keep the exact step/shape construction of profile_ip2.py so the
compiled step comes from the persistent cache.
"""

import os
import sys
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


def wait_ready(arrs, poll=0.002, timeout=30.0):
    """Poll is_ready() and return elapsed seconds until all ready."""
    t0 = time.perf_counter()
    leaves = jax.tree.leaves(arrs)
    while True:
        if all(a.is_ready() for a in leaves):
            return time.perf_counter() - t0
        if time.perf_counter() - t0 > timeout:
            return float("inf")
        time.sleep(poll)


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

    # E3: block_until_ready on already-ready array
    t0 = time.perf_counter()
    jax.block_until_ready(staged)
    print(f"E3 block on ready tree: {(time.perf_counter()-t0)*1e3:.1f} ms",
          flush=True)

    raw = make_raw()

    # E1: readiness timeline — put, then step consuming it, poll both
    for rep in range(3):
        t_start = time.perf_counter()
        out = jax.device_put(jax.tree.map(jnp.asarray, raw))
        t_issue = time.perf_counter() - t_start
        t_transfer = wait_ready(out)
        state, m = step(state, out, jax.random.fold_in(base_key, 600 + rep))
        t_step_ready = wait_ready(m["loss"])
        print(f"E1[{rep}] idle-queue: issue {t_issue*1e3:.0f} ms, "
              f"transfer-ready +{t_transfer*1e3:.0f} ms, "
              f"step-ready +{t_step_ready*1e3:.0f} ms", flush=True)

    # E2: tiny 1 KB transfer readiness after heavy state
    small = np.ones((256,), np.float32)
    for rep in range(3):
        t0 = time.perf_counter()
        s = jax.device_put(small)
        t_issue = time.perf_counter() - t0
        t_ready = wait_ready(s)
        print(f"E2[{rep}] tiny put: issue {t_issue*1e3:.1f} ms, "
              f"ready +{t_ready*1e3:.1f} ms", flush=True)

    # E4: transfer readiness WITH 2 steps in flight
    for rep in range(3):
        pend = []
        for i in range(2):
            state, m = step(
                state, staged, jax.random.fold_in(base_key, 700 + i))
            pend.append(m["loss"])
        t0 = time.perf_counter()
        out = jax.device_put(jax.tree.map(jnp.asarray, raw))
        t_issue = time.perf_counter() - t0
        t_ready = wait_ready(out)
        print(f"E4[{rep}] put with 2 in-flight: issue {t_issue*1e3:.0f} ms, "
              f"ready +{t_ready*1e3:.0f} ms", flush=True)
        for x in pend:
            jax.device_get(x)

    # E5: full pipelined arm with is_ready-based accounting: numpy staging
    # in producer thread, steps chained, readiness polled not blocked
    raws = [make_raw() for _ in range(8)]
    t0 = time.perf_counter()
    pend = deque()
    for i, r in enumerate(raws):
        out = jax.device_put(jax.tree.map(jnp.asarray, r))
        state, m = step(state, out, jax.random.fold_in(base_key, 800 + i))
        pend.append(m["loss"])
        while len(pend) > 2:
            wait_ready(pend.popleft())
    while pend:
        wait_ready(pend.popleft())
    ms = (time.perf_counter() - t0) / len(raws) * 1e3
    print(f"E5 pipelined put+step, poll-waits: {ms:.1f} ms/step", flush=True)

    # E6: same but reuse ONE staged batch (no transfers): the step-rate floor
    t0 = time.perf_counter()
    pend = deque()
    for i in range(8):
        state, m = step(state, staged, jax.random.fold_in(base_key, 900 + i))
        pend.append(m["loss"])
        while len(pend) > 2:
            wait_ready(pend.popleft())
    while pend:
        wait_ready(pend.popleft())
    ms = (time.perf_counter() - t0) / 8 * 1e3
    print(f"E6 prestaged, poll-waits: {ms:.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
