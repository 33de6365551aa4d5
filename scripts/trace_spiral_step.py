"""Op-level XLA trace of the SPIRAL pretrain step (top self-time HLO ops).

Captures a jax.profiler device trace of a few chained production steps and
digests the xplane with tensorboard_plugin_profile into a ranked table of
HLO ops by device self-time — the ground truth for "where do the 90 ms go"
that the phase-level attribution (scripts/profile_spiral_step.py) can't see
inside fused branches.

Usage: python scripts/trace_spiral_step.py [--bf16] [--top 40]
"""

import argparse
import glob
import gzip
import json
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

from tpu_speech.models.spiral.st2vec import ST2VecEncoder, spiral_base_config  # noqa: E402
from tpu_speech.train.spiral import (  # noqa: E402
    host_augment_batch,
    init_spiral_state,
    make_pretrain_step,
)
from tpu_speech.train.spiral_runner import _spec_len  # noqa: E402

BATCH = 24
CROP = 250000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--chain", type=int, default=4)
    ap.add_argument("--logdir", default=None)
    args = ap.parse_args()

    import optax

    cfg = spiral_base_config()
    model = ST2VecEncoder(cfg)
    tx = optax.adamw(3e-3, b1=0.9, b2=0.98, eps=1e-6, weight_decay=0.01)
    spec_len = _spec_len(CROP, cfg.sample_rate)
    rng = np.random.default_rng(0)
    wavs = (rng.standard_normal((BATCH, CROP)) * 0.1).astype(np.float32)
    lens = np.full((BATCH,), CROP, dtype=np.int32)
    batch = host_augment_batch(
        cfg, wavs, lens, wavs.copy(), lens.copy(), spec_len,
        np.random.default_rng(1),
    )
    batch = jax.tree.map(jnp.asarray, batch)
    state = init_spiral_state(
        model, jax.random.PRNGKey(0), (BATCH, spec_len, cfg.num_features), tx
    )
    step = make_pretrain_step(model, cfg, tx, bf16=args.bf16)
    base_key = jax.random.key(0, impl="rbg")

    @partial(jax.jit, donate_argnums=(0,))
    def run_chain(st, batch, key):
        def it(st, i):
            st, m = step(st, batch, jax.random.fold_in(key, i))
            return st, m["loss"]
        return jax.lax.scan(it, st, jnp.arange(args.chain))

    # warm up (compile outside the trace)
    state, losses = run_chain(state, batch, jax.random.fold_in(base_key, 0))
    jax.device_get(losses)

    logdir = args.logdir or tempfile.mkdtemp(prefix="spiral_trace_")
    with jax.profiler.trace(logdir):
        state, losses = run_chain(state, batch, jax.random.fold_in(base_key, 1))
        jax.device_get(losses)

    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        raise SystemExit(f"no xplane captured under {logdir}")
    xplane = max(xplanes, key=os.path.getmtime)
    print(f"trace: {xplane}", flush=True)

    top_ops(xplane, args.top, args.chain)


def top_ops(xplane_path: str, top: int, chain: int):
    """Aggregate the TPU plane's 'XLA Ops' line by op name; print the top
    table. Uses the vendored xplane proto (scripts/xplane.proto, compiled
    with protoc on first use) — the tensorboard profile plugin's TF glue is
    version-broken in this environment."""
    import re
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    if not os.path.exists(os.path.join(here, "xplane_pb2.py")):
        subprocess.run(["protoc", "--python_out=.", "xplane.proto"],
                       cwd=here, check=True)
    sys.path.insert(0, here)
    import xplane_pb2

    sp = xplane_pb2.XSpace()
    with open(xplane_path, "rb") as f:
        sp.ParseFromString(f.read())
    plane = next(p for p in sp.planes if p.name.startswith("/device:TPU"))
    meta = plane.event_metadata
    smeta = plane.stat_metadata

    def meta_stats(m):
        out = {}
        for st in m.stats:
            nm = smeta[st.metadata_id].name
            out[nm] = (st.str_value or st.int64_value or st.uint64_value
                       or st.double_value)
        return out

    by_cat = {}
    by_src = {}
    by_name = {}
    total_ps = 0
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            m = meta[ev.metadata_id]
            ms = meta_stats(m)
            cat = str(ms.get("hlo_category", "?"))
            if cat in ("control flow",) or m.name.startswith("%while"):
                continue  # parents double-count their children
            d = ev.duration_ps
            total_ps += d
            fl = float(ms.get("flops", 0) or 0)
            by = float(ms.get("bytes_accessed", 0) or 0)
            for table, key in (
                (by_cat, cat),
                (by_src, str(ms.get("source", "?"))),
                (by_name, re.sub(r"[.\d]+$", "", m.name.split(" = ")[0])),
            ):
                dur, cnt, tf, tb = table.get(key, (0, 0, 0.0, 0.0))
                table[key] = (dur + d, cnt + 1, tf + fl, tb + by)

    def dump(title, table, n):
        rows = sorted(table.items(), key=lambda kv: -kv[1][0])
        print(f"\n== {title} ==")
        print(f"{'key':52s} {'ms/step':>9s} {'%':>6s} {'count':>7s} "
              f"{'GF/step':>8s} {'GB/step':>8s}")
        for name, (dur, cnt, fl, by) in rows[:n]:
            print(f"{name[:52]:52s} {dur / 1e9 / chain:9.3f} "
                  f"{100 * dur / total_ps:6.2f} {cnt:7d} "
                  f"{fl / 1e9 / chain:8.2f} {by / 1e9 / chain:8.3f}",
                  flush=True)

    print(f"\ntotal leaf device op-time: {total_ps / 1e9 / chain:.2f} ms/step"
          f" over {chain} steps")
    dump("by hlo_category", by_cat, 20)
    dump("by source line", by_src, top)
    dump("by op name", by_name, top)


if __name__ == "__main__":
    main()
