"""Stage-by-stage attribution of the SPIRAL input-pipeline producer cost.

Round-3 verdict: loader-fed step 1495 ms vs 88 ms pre-staged (efficiency
0.059) with the producer wall UNATTRIBUTED.  This script replays the exact
bench_input_pipeline producer path and times every stage independently:

  1. loader fetch        (wav read + crop + collate; native batcher if built)
  2. host_augment_batch  (numpy mask generation)
  3. transfer            (jnp.asarray / device_put per leaf and packed)
  4. transfer-under-load (same, while a train step is in flight)
  5. end-to-end arms     (pre-staged vs loader-fed, like the bench)

Run:  python scripts/profile_input_pipeline.py
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

from tpu_speech.data.loader import DataLoader  # noqa: E402
from tpu_speech.data.spiral import AudioDataset  # noqa: E402
from tpu_speech.data.wav import write_wav  # noqa: E402
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


def med(times):
    return float(np.median(times) * 1e3)


def main():
    root = os.path.join(tempfile.gettempdir(), "tpu_speech_bench_corpus")
    manifest = os.path.join(root, "manifest.json")
    n_utts = 64
    if not os.path.exists(manifest):
        os.makedirs(root, exist_ok=True)
        rng = np.random.default_rng(0)
        entries = []
        for i in range(n_utts):
            wav = (rng.standard_normal(CROP + 1600) * 0.1).astype(np.float32)
            path = os.path.join(root, f"utt{i:03d}.wav")
            write_wav(path, wav, 16000)
            entries.append(json.dumps({
                "audio_filepath": path,
                "duration": (CROP + 1600) / 16000.0,
                "text": "",
            }))
        with open(manifest, "w") as f:
            f.write("\n".join(entries) + "\n")

    cfg = spiral_base_config()
    spec_len = _spec_len(CROP, cfg.sample_rate)

    dataset = AudioDataset(manifest, cfg.sample_rate, CROP, 0.0, None,
                           return_both=True)
    batch_fn = None
    try:
        from tpu_speech.data.native_pipeline import NativePretrainBatcher
        batch_fn = NativePretrainBatcher.maybe_build(dataset, seed=0)
    except Exception as e:
        print("native batcher unavailable:", e)
    print("native batcher:", "YES" if batch_fn else "NO")

    loader = DataLoader(dataset, BATCH, None, shuffle=True,
                        num_workers=4, prefetch=4, batch_fn=batch_fn)
    host_rng = np.random.default_rng(0)

    # ---- stage 1: loader fetch (drain 8 batches, time each next()) ----
    it = iter(loader)
    raw0 = next(it)  # warm native lib / thread pool
    t_fetch = []
    raws = []
    while len(raws) < 8:
        t0 = time.perf_counter()
        try:
            r = next(it)
        except StopIteration:
            it = iter(loader)
            continue
        t_fetch.append(time.perf_counter() - t0)
        raws.append(r)
    # NOTE: prefetch hides fetch latency; also time a COLD single batch build
    t0 = time.perf_counter()
    cold = loader._make_batch(list(range(BATCH)))
    t_cold_fetch = time.perf_counter() - t0
    print(f"stage1 loader next() med: {med(t_fetch):.1f} ms "
          f"(prefetch-hidden), cold single-batch build: "
          f"{t_cold_fetch*1e3:.1f} ms")

    # ---- stage 2: host_augment_batch ----
    t_aug = []
    augs = []
    for r in raws:
        t0 = time.perf_counter()
        a = host_augment_batch(cfg, r["wavs"], r["wav_lens"], r["p_wavs"],
                               r["p_wav_lens"], spec_len, host_rng)
        t_aug.append(time.perf_counter() - t0)
        augs.append(a)
    print(f"stage2 host_augment_batch med: {med(t_aug):.1f} ms")

    # ---- stage 3: transfer, idle device ----
    leaf_bytes = {k: (np.asarray(v).nbytes if hasattr(v, 'nbytes') else 8)
                  for k, v in augs[0].items()}
    print("leaf bytes:", {k: f"{b/1e6:.1f}MB" for k, b in leaf_bytes.items()})

    def put_tree(a):
        out = jax.device_put(jax.tree.map(jnp.asarray, a))
        jax.block_until_ready(out)
        return out

    t_put = []
    for a in augs:
        t0 = time.perf_counter()
        put_tree(a)
        t_put.append(time.perf_counter() - t0)
    print(f"stage3 device_put tree (idle, block_until_ready) med: "
          f"{med(t_put):.1f} ms")

    # per-leaf timing on one batch
    a = augs[0]
    for k, v in a.items():
        t0 = time.perf_counter()
        x = jax.device_put(jnp.asarray(v))
        jax.block_until_ready(x)
        dt = time.perf_counter() - t0
        print(f"  leaf {k:12s} {leaf_bytes[k]/1e6:8.1f} MB  "
              f"{dt*1e3:8.1f} ms")

    # jnp.asarray only (what the bench does before the extra device_put)
    t_asarr = []
    for a2 in augs:
        t0 = time.perf_counter()
        out = jax.tree.map(jnp.asarray, a2)
        jax.block_until_ready(out)
        t_asarr.append(time.perf_counter() - t0)
    print(f"stage3b jnp.asarray tree only med: {med(t_asarr):.1f} ms")

    # ---- build the train step ----
    import faulthandler
    import signal
    faulthandler.register(signal.SIGUSR1)

    model = ST2VecEncoder(cfg)
    tx = optax.adamw(3e-3, b1=0.9, b2=0.98, eps=1e-6, weight_decay=0.01)
    t0 = time.perf_counter()
    state = init_spiral_state(
        model, jax.random.PRNGKey(0), (BATCH, spec_len, cfg.num_features), tx)
    jax.block_until_ready(state.params)
    print(f"init_spiral_state: {time.perf_counter()-t0:.1f} s")
    step = make_pretrain_step(model, cfg, tx)
    base_key = jax.random.key(0, impl="rbg")

    staged = put_tree(augs[0])
    # warm compile
    t0 = time.perf_counter()
    for i in range(3):
        state, m = step(state, staged, jax.random.fold_in(base_key, i))
    jax.device_get(m["loss"])
    print(f"step compile+3 warm: {time.perf_counter()-t0:.1f} s")

    # ---- pre-staged arm (delayed reads depth 2) ----
    def run_arm(batches, st, n):
        pending = deque()
        t0 = time.perf_counter()
        k = 0
        for b in batches:
            st, m = step(st, b, jax.random.fold_in(base_key, k)); k += 1
            pending.append(m["loss"])
            while len(pending) > 2:
                jax.device_get(pending.popleft())
        while pending:
            jax.device_get(pending.popleft())
        return st, (time.perf_counter() - t0) / n

    n_steps = 10
    state, t_synth = run_arm((staged for _ in range(n_steps)), state, n_steps)
    print(f"prestaged step: {t_synth*1e3:.1f} ms")

    # ---- stage 4: transfer while a step is in flight ----
    t_put_load = []
    for i, a2 in enumerate(augs):
        state, m = step(state, staged, jax.random.fold_in(base_key, 100 + i))
        t0 = time.perf_counter()
        put_tree(a2)
        t_put_load.append(time.perf_counter() - t0)
        jax.device_get(m["loss"])
    print(f"stage4 device_put tree WITH step in flight med: "
          f"{med(t_put_load):.1f} ms")

    # ---- stage 5: loader-fed arm exactly like the bench ----
    from tpu_speech.data.prefetch import threaded_prefetch

    stage_t = {"fetch": [], "augment": [], "transfer": []}

    def loader_batches():
        n = 0
        while n < n_steps:
            it = iter(loader)
            while n < n_steps:
                t0 = time.perf_counter()
                try:
                    raw = next(it)
                except StopIteration:
                    break
                t1 = time.perf_counter()
                a3 = host_augment_batch(
                    cfg, raw["wavs"], raw["wav_lens"], raw["p_wavs"],
                    raw["p_wav_lens"], spec_len, host_rng)
                t2 = time.perf_counter()
                out = jax.device_put(jax.tree.map(jnp.asarray, a3))
                t3 = time.perf_counter()
                stage_t["fetch"].append(t1 - t0)
                stage_t["augment"].append(t2 - t1)
                stage_t["transfer"].append(t3 - t2)
                yield out
                n += 1

    state, t_loader = run_arm(threaded_prefetch(loader_batches), state,
                              n_steps)
    print(f"loader-fed step: {t_loader*1e3:.1f} ms  "
          f"(efficiency {t_synth/t_loader:.3f})")
    for k, v in stage_t.items():
        print(f"  producer {k:9s} med {med(v):8.1f} ms  "
              f"sum {sum(v)*1e3:8.1f} ms over {len(v)}")


if __name__ == "__main__":
    main()
