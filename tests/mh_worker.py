"""Standalone worker for the multi-host equality test.

Runs ONE SPIRAL pretrain step on a fixed synthetic global batch over an
8-device mesh, either as a single process (8 virtual CPU devices) or as one of
two federated jax.distributed processes (4 virtual devices each). Both modes
execute the same global program on the same global values, so the loss must
match — the TPU answer to validating the reference's multi-node DDP
(SPIRAL/README.md:36-42) without a cluster.

Usage: python mh_worker.py single
       python mh_worker.py multi <pid> <nprocs> <port>
       python mh_worker.py eval_single <corpus_dir>
       python mh_worker.py eval_multi <pid> <nprocs> <port> <corpus_dir>
(caller must set JAX_PLATFORMS=cpu and
 XLA_FLAGS=--xla_force_host_platform_device_count=<n> in the child env)

The eval modes drive SpiralFinetuneRunner.evaluate() on a fixed corpus:
multi shards the utterances across processes and all-reduces the error
counts, so the printed WER/CER/n must equal the single-process run exactly.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")


def eval_main(corpus_dir: str):
    import copy
    from importlib import import_module

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "cli"),
    )
    from tpu_speech.text.tokenizers import CharTokenizer
    from tpu_speech.train.spiral_runner import SpiralFinetuneRunner

    cfg = copy.deepcopy(import_module("conf.spiral.spiral_tiny_test").cfg)
    mpath = os.path.join(corpus_dir, "manifest.json")
    for ds in (cfg.model.train_ds, cfg.model.validation_ds, cfg.model.test_ds):
        if ds is not None:
            ds.manifest_filepath = mpath
    runner = SpiralFinetuneRunner(
        cfg, os.path.join(corpus_dir, f"logs_p{jax.process_index()}"),
        CharTokenizer(cfg.model.labels),
    )
    res = runner.evaluate()
    print(
        f"MHWER {res['wer']:.10f} {res['cer']:.10f} {res['n']} "
        f"{res['ser']:.10f}",
        flush=True,
    )


def main():
    mode = sys.argv[1]
    if mode.startswith("eval"):
        if mode == "eval_multi":
            pid, nprocs, port = int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
            jax.distributed.initialize(
                coordinator_address=f"localhost:{port}",
                num_processes=nprocs, process_id=pid,
            )
            eval_main(sys.argv[5])
        else:
            eval_main(sys.argv[2])
        return
    if mode == "multi":
        pid, nprocs, port = int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nprocs, process_id=pid,
        )

    import numpy as np
    import optax

    from tests.test_spiral_pretrain import TINY_CFG
    from tpu_speech.models.spiral.st2vec import ST2VecEncoder
    from tpu_speech.parallel.mesh import make_mesh, replicate, shard_batch
    from tpu_speech.train.spiral import (
        host_augment_batch,
        init_spiral_state,
        make_pretrain_step,
    )

    assert len(jax.devices()) == 8, jax.devices()
    mesh = make_mesh()

    cfg = TINY_CFG
    b_global, n_samples = 8, 16000
    rng = np.random.default_rng(7)
    wavs = (rng.standard_normal((b_global, n_samples)) * 0.1).astype(np.float32)
    lens = np.full((b_global,), n_samples, dtype=np.int32)
    spec_len = 112  # ceil(16000/160)=100 -> pad16 -> 112
    batch = host_augment_batch(
        cfg, wavs, lens, wavs.copy(), lens.copy(), spec_len,
        np.random.default_rng(11), np.random.default_rng(13),
    )
    if mode == "multi":
        # every process computed the identical global batch; keep only this
        # process's contiguous slice of the batch-dim leaves
        lo = jax.process_index() * (b_global // jax.process_count())
        hi = lo + b_global // jax.process_count()
        batch = jax.tree.map(
            lambda a: a[lo:hi] if np.ndim(a) > 0 else a, batch
        )

    model = ST2VecEncoder(cfg)
    tx = optax.adamw(1e-3)
    state = init_spiral_state(
        model, jax.random.PRNGKey(0), (2, spec_len, cfg.num_features), tx
    )
    state = replicate(mesh, state)
    step = make_pretrain_step(model, cfg, tx)
    state, metrics = step(state, shard_batch(mesh, batch), jax.random.PRNGKey(3))
    loss = float(jax.device_get(metrics["loss"]))
    print(f"MHLOSS {loss:.10f}", flush=True)


if __name__ == "__main__":
    main()
