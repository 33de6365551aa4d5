"""Multi-host distribution + gradient accumulation.

Covers the reference's DDP surface (SPIRAL/README.md:36-42 multi-node env
launch; trainer.accumulate_grad_batches spiral_base_pretrain_ls960.py:218;
expected_gpu_num lr rescale run_spiral.py:83-86) in their TPU-native forms:
jax.distributed two-process equality, in-jit micro-batch accumulation
equality, linear lr scaling.
"""

import dataclasses
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tests.test_spiral_pretrain import TINY_CFG
from tpu_speech.models.spiral.ctc import (
    CTCFinetuneModel,
    CTCTrainState,
    make_finetune_step,
)
from tpu_speech.models.spiral.st2vec import ST2VecEncoder
from tpu_speech.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_microbatches,
)
from tpu_speech.train.spiral import (
    host_augment_batch,
    init_spiral_state,
    make_pretrain_step,
)
from tpu_speech.train.spiral_runner import _lr_scale

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def _zero_dropout_blocks():
    from tpu_speech.models.spiral.encoder import (
        ConvLayerCfg,
        ConvTransformerBlockCfg,
        TransformerCfg,
    )

    t = TransformerCfg(
        1, 32, 64, 4, 0.0, attention_dropout=0.0, activation_dropout=0.0,
        conv_pos=8, conv_pos_groups=4,
    )
    return (
        ConvTransformerBlockCfg(
            conv_layers=(
                ConvLayerCfg(24, (5,), (2,), "ln", "relu", 0.0),
                ConvLayerCfg(32, (5,), (2,), "ln", "relu", 0.0),
            ),
            transformer=t,
        ),
        ConvTransformerBlockCfg(
            conv_layers=(ConvLayerCfg(32, (5,), (2,), "ln", "relu", 0.0),),
            transformer=t,
        ),
    )


def _ctc_setup(b):
    from tpu_speech.models.spiral.encoder import ConvLayerCfg

    # fully deterministic network: accumulation equality must not depend on
    # the per-micro-batch dropout/dither rng fold
    cfg = dataclasses.replace(
        TINY_CFG, dither=0.0, blocks=_zero_dropout_blocks()
    )
    dec = (
        ConvLayerCfg(32, (5,), (1,), None, "relu", 0.0),
        ConvLayerCfg(32, (5,), (1,), None, "relu", 0.0),
    )
    model = CTCFinetuneModel(cfg, 6, "vocab_first", decoder_convs=dec)
    rng = np.random.default_rng(3)
    batch = {
        "wavs": (rng.standard_normal((b, 8000)) * 0.1).astype(np.float32),
        "wav_lens": np.full((b,), 8000, dtype=np.int32),
        "labels": rng.integers(1, 6, size=(b, 4)).astype(np.int32),
        "label_lens": np.full((b,), 4, dtype=np.int32),
    }
    spec_len = 64  # ceil(8000/160)=50 -> pad16 -> 64
    specs = jnp.zeros((1, spec_len, cfg.num_features))
    lens = jnp.full((1,), spec_len)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, specs, lens, train=False
    )
    # SGD: update ∝ grad, so zero-gradient params (e.g. k_proj bias, which
    # cancels in softmax) stay at fp-noise scale instead of being blown up to
    # ±lr by Adam's normalization
    tx = optax.sgd(0.1)
    return cfg, model, tx, variables, batch


@pytest.mark.slow
def test_grad_accumulation_matches_big_batch():
    """N micro-batches at accumulation N == one N*batch step (fp32, exact up
    to reduction order) — the contract accumulate_grad_batches promises."""
    cfg, model, tx, variables, batch = _ctc_setup(b=4)
    mesh = make_mesh(n_devices=2)

    def fresh_state():
        return replicate(mesh, CTCTrainState(
            jnp.zeros((), jnp.int32),
            jax.tree.map(jnp.copy, variables["params"]),
            variables.get("batch_stats", {}),
            tx.init(variables["params"]),
        ))

    key = jax.random.PRNGKey(5)
    step1 = make_finetune_step(model, cfg, tx, 0, accum_steps=1)
    s1, m1 = step1(fresh_state(), shard_batch(mesh, batch), key)

    micro = jax.tree.map(
        lambda a: np.reshape(a, (2, 2) + a.shape[1:]), batch
    )
    step2 = make_finetune_step(model, cfg, tx, 0, accum_steps=2)
    s2, m2 = step2(fresh_state(), shard_microbatches(mesh, micro), key)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-6
    )
    p1 = jax.device_get(s1.params)
    p2 = jax.device_get(s2.params)
    for a, b_ in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(a, b_, rtol=2e-5, atol=2e-7)


@pytest.mark.slow
def test_pretrain_accum_smoke():
    """Pretrain step with accum_steps=2: one EMA/optimizer update, finite loss."""
    cfg = dataclasses.replace(TINY_CFG, dither=0.0)
    model = ST2VecEncoder(cfg)
    tx = optax.adamw(1e-3)
    mesh = make_mesh(n_devices=2)
    spec_len = 64
    b, k = 2, 2
    rng = np.random.default_rng(9)
    wavs = (rng.standard_normal((k * b, 8000)) * 0.1).astype(np.float32)
    lens = np.full((k * b,), 8000, dtype=np.int32)
    micros = []
    for i in range(k):
        sl = slice(i * b, (i + 1) * b)
        micros.append(host_augment_batch(
            cfg, wavs[sl], lens[sl], wavs[sl].copy(), lens[sl].copy(),
            spec_len, np.random.default_rng(20 + i),
        ))
    batch = jax.tree.map(lambda *xs: np.stack(xs), *micros)
    state = replicate(mesh, init_spiral_state(
        model, jax.random.PRNGKey(0), (b, spec_len, cfg.num_features), tx
    ))
    step = make_pretrain_step(model, cfg, tx, accum_steps=k)
    state, metrics = step(
        state, shard_microbatches(mesh, batch), jax.random.PRNGKey(1)
    )
    m = jax.device_get(metrics)
    assert np.isfinite(m["loss"])
    assert int(jax.device_get(state.step)) == 1


def test_lr_scale_rule():
    class M:
        expected_gpu_num = 16
    assert _lr_scale(M(), 8, 2) == pytest.approx(1.0)
    assert _lr_scale(M(), 16, 1) == pytest.approx(1.0)
    assert _lr_scale(M(), 8, 1) == pytest.approx(0.5)
    M.expected_gpu_num = 0
    assert _lr_scale(M(), 8, 4) == 1.0


def test_fsdp_parity_quick_tier():
    """Quick-tier sharded-training parity (smallest mesh that shards): a
    deterministic tiny CTC step under ZeRO-style param sharding on a 2-device
    mesh must equal the replicated-DP loss. The exhaustive TP/SP/FSDP parity
    suite is slow-tier; this keeps ONE numerical placement check in every
    `-m 'not slow'` run so a partitioner regression can't ride to CI-full."""
    from tpu_speech.parallel.mesh import fsdp_shardings

    cfg, model, tx, variables, batch = _ctc_setup(b=4)
    mesh = make_mesh(n_devices=2)

    def fresh_state():
        return CTCTrainState(
            jnp.zeros((), jnp.int32),
            jax.tree.map(jnp.copy, variables["params"]),
            variables.get("batch_stats", {}),
            tx.init(variables["params"]),
        )

    losses = {}
    for name in ("dp", "fsdp"):
        state = fresh_state()
        if name == "fsdp":
            shardings = fsdp_shardings(mesh, state, min_size=2 ** 6)
            state = jax.tree.map(jax.device_put, state, shardings)
            specs = jax.tree.leaves(
                jax.tree.map(lambda a: str(a.sharding.spec), state.params)
            )
            assert any("data" in s for s in specs), specs
            step = make_finetune_step(
                model, cfg, tx, mesh=mesh, state_shardings=shardings
            )
        else:
            state = replicate(mesh, state)
            step = make_finetune_step(model, cfg, tx)
        state, m = step(
            state, shard_batch(mesh, batch), jax.random.PRNGKey(2),
            iteration=0,
        )
        losses[name] = float(jax.device_get(m["loss"]))
    assert np.isfinite(losses["dp"])
    assert losses["fsdp"] == pytest.approx(losses["dp"], abs=1e-5), losses


@pytest.mark.slow
def test_two_process_matches_single_process():
    """Two federated jax.distributed processes (4 virtual devices each) train
    one SPIRAL step with the same loss as a single 8-device process."""
    def env(n):
        e = dict(os.environ)
        e["JAX_PLATFORMS"] = "cpu"
        e["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n}"
        return e

    worker = os.path.join(REPO, "tests", "mh_worker.py")

    single = subprocess.run(
        [sys.executable, worker, "single"], env=env(8),
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert single.returncode == 0, single.stderr[-2000:]

    port = "12361"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, "multi", str(pid), "2", port],
            env=env(4), stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=REPO,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-2000:]
        outs.append(out)

    def loss_of(out):
        for line in out.splitlines():
            if line.startswith("MHLOSS"):
                return float(line.split()[1])
        raise AssertionError(f"no MHLOSS in output: {out[-500:]}")

    l_single = loss_of(single.stdout)
    l_multi = [loss_of(o) for o in outs]
    assert l_multi[0] == pytest.approx(l_multi[1], rel=1e-6)
    assert l_single == pytest.approx(l_multi[0], rel=1e-5), (
        l_single, l_multi
    )


@pytest.mark.slow
def test_two_process_eval_matches_single(tmp_path):
    """Finetune evaluate() shards utterances across processes and
    all-reduces the error counts: two federated processes report the exact
    same WER/CER/n as one process decoding everything (and each decodes
    only half the set)."""
    import json

    from tpu_speech.data.wav import write_wav

    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    rng = np.random.default_rng(0)
    words = ["hello", "world", "speech", "test", "audio"]
    sr = 16000
    entries = []
    for i in range(11):  # odd count: shards differ in length
        wav = (rng.standard_normal(int(sr * 0.6)) * 0.1).astype(np.float32)
        p = os.path.join(corpus, f"utt{i}.wav")
        write_wav(p, wav, sr)
        entries.append({
            "audio_filepath": p, "duration": 0.6,
            "text": " ".join(rng.choice(words, size=3)),
        })
    with open(os.path.join(corpus, "manifest.json"), "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")

    def env(n):
        e = dict(os.environ)
        e["JAX_PLATFORMS"] = "cpu"
        e["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n}"
        return e

    worker = os.path.join(REPO, "tests", "mh_worker.py")
    single = subprocess.run(
        [sys.executable, worker, "eval_single", corpus], env=env(8),
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert single.returncode == 0, single.stderr[-2000:]

    port = "12367"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, "eval_multi", str(pid), "2", port,
             corpus],
            env=env(4), stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=REPO,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-2000:]
        outs.append(out)

    def parse(out):
        for line in out.splitlines():
            if line.startswith("MHWER"):
                parts = line.split()
                return float(parts[1]), float(parts[2]), int(parts[3]), \
                    float(parts[4])
        raise AssertionError(f"no MHWER in output: {out[-500:]}")

    w_s, c_s, n_s, ser_s = parse(single.stdout)
    for out in outs:
        w_m, c_m, n_m, ser_m = parse(out)
        assert n_m == n_s == 11
        assert w_m == pytest.approx(w_s, abs=1e-9)
        assert c_m == pytest.approx(c_s, abs=1e-9)
        assert ser_m == pytest.approx(ser_s, abs=1e-9)


@pytest.mark.slow  # big SPMD-partitioned compiles; also driver-dryrun-covered
def test_tensor_parallel_placement_matches_dp():
    """shard_params_tp on the 2-D (data, model) mesh is a pure placement
    change: one train step must produce the same loss as the replicated-param
    DP run (XLA inserts the TP collectives)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from tpu_speech.models.grad_tts import GradTTS
    from tpu_speech.parallel.mesh import (
        MODEL_AXIS,
        make_mesh,
        replicate,
        shard_batch,
        shard_params_tp,
    )
    from tpu_speech.train.gradtts import make_train_step
    from tpu_speech.train.state import TrainState

    model = GradTTS(
        n_vocab=30, n_enc_channels=16, filter_channels=32,
        filter_channels_dp=16, n_heads=2, n_enc_layers=1, enc_kernel=3,
        enc_dropout=0.1, window_size=2, n_feats=8, dec_dim=8,
    )
    rng = np.random.default_rng(0)
    batch = {
        "x": rng.integers(1, 30, size=(8, 12)).astype(np.int32),
        "x_lengths": np.full((8,), 12, dtype=np.int32),
        "y": rng.standard_normal((8, 32, 8)).astype(np.float32),
        "y_lengths": np.full((8,), 32, dtype=np.int32),
    }
    params = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(batch["x"]), jnp.asarray(batch["x_lengths"]),
        jnp.asarray(batch["y"]), jnp.asarray(batch["y_lengths"]),
        jax.random.PRNGKey(1), train=False,
    )
    tx = optax.adam(1e-4)
    fresh = lambda: jax.tree.map(jnp.copy, {"params": params["params"]})

    mesh_dp = make_mesh(n_devices=8)
    mesh_tp = make_mesh(n_devices=8, model_parallel=2)
    assert mesh_tp.shape[MODEL_AXIS] == 2
    state_dp = replicate(mesh_dp, TrainState.create(fresh(), tx))
    state_tp = shard_params_tp(mesh_tp, TrainState.create(fresh(), tx))
    # at least one leaf is actually model-sharded
    shardings = jax.tree.leaves(
        jax.tree.map(lambda a: str(a.sharding.spec), state_tp.params)
    )
    assert any(MODEL_AXIS in s for s in shardings), shardings

    step = make_train_step(model, tx, out_size=16)
    _, m_dp = step(state_dp, shard_batch(mesh_dp, batch), jax.random.PRNGKey(2))
    _, m_tp = step(state_tp, shard_batch(mesh_tp, batch), jax.random.PRNGKey(2))
    l_dp = float(jax.device_get(m_dp["loss"]))
    l_tp = float(jax.device_get(m_tp["loss"]))
    assert abs(l_dp - l_tp) < 1e-4, (l_dp, l_tp)


@pytest.mark.slow
def test_sequence_parallel_matches_dp():
    """seq_constrainer anchors on the (data, seq) mesh are a pure placement
    change: the SPIRAL pretrain step — the workload whose 250k-sample crops
    motivate time-sharding — yields the same loss as plain DP (XLA inserts
    the halo exchanges / gathers between the anchors)."""
    from tpu_speech.models.spiral.st2vec import ST2VecEncoder as _Enc
    from tpu_speech.parallel.mesh import SEQ_AXIS

    model = _Enc(TINY_CFG)
    tx = optax.adamw(1e-3)
    b, n_samples, spec_len = 8, 8000, 64  # ceil(8000/160)=50 -> pad16 -> 64
    rng = np.random.default_rng(0)
    wavs = rng.standard_normal((b, n_samples)).astype(np.float32) * 0.1
    lens = np.full((b,), n_samples, dtype=np.int32)
    batch = host_augment_batch(
        TINY_CFG, wavs, lens, wavs + 0.01, lens, spec_len,
        np.random.default_rng(1),
    )

    losses = []
    for kw in ({}, {"seq_parallel": 2}, {"seq_parallel": 2,
                                         "model_parallel": 2}):
        mesh = make_mesh(n_devices=8, **kw)
        if kw.get("seq_parallel"):
            assert mesh.shape[SEQ_AXIS] == 2
        state = init_spiral_state(
            model, jax.random.PRNGKey(0),
            (b, spec_len, TINY_CFG.num_features), tx,
        )
        step = make_pretrain_step(model, TINY_CFG, tx, mesh=mesh)
        state = replicate(mesh, state)
        _, m = step(state, shard_batch(mesh, batch), jax.random.PRNGKey(2))
        losses.append(float(jax.device_get(m["loss"])))
    assert np.all(np.isfinite(losses)), losses
    assert abs(losses[1] - losses[0]) < 1e-4, losses
    assert abs(losses[2] - losses[0]) < 1e-4, losses


@pytest.mark.slow  # big SPMD-partitioned compiles; also driver-dryrun-covered
def test_fsdp_sharding_matches_dp():
    """ZeRO-3-style state sharding (parallel.mesh.fsdp_shardings) is a pure
    placement change: the SPIRAL pretrain step yields the same loss as
    replicated DP, and the donated-jit output state KEEPS the sharded
    placement (out_shardings pin), so per-chip state memory actually drops."""
    from tpu_speech.parallel.mesh import DATA_AXIS, fsdp_shardings

    model = ST2VecEncoder(TINY_CFG)
    tx = optax.adamw(1e-3)
    b, n_samples, spec_len = 8, 8000, 64
    rng = np.random.default_rng(0)
    wavs = rng.standard_normal((b, n_samples)).astype(np.float32) * 0.1
    lens = np.full((b,), n_samples, dtype=np.int32)
    batch = host_augment_batch(
        TINY_CFG, wavs, lens, wavs + 0.01, lens, spec_len,
        np.random.default_rng(1),
    )
    mesh = make_mesh(n_devices=8)

    def fresh():
        return init_spiral_state(
            model, jax.random.PRNGKey(0),
            (b, spec_len, TINY_CFG.num_features), tx,
        )

    # DP baseline
    step = make_pretrain_step(model, TINY_CFG, tx, mesh=mesh)
    sdp, m_dp = step(
        replicate(mesh, fresh()), shard_batch(mesh, batch),
        jax.random.PRNGKey(2),
    )

    # FSDP: min_size=8 so the tiny test model's leaves actually shard
    state = fresh()
    shardings = fsdp_shardings(mesh, state, min_size=8)
    specs = [
        s.spec for s in jax.tree.leaves(shardings)
    ]
    n_sharded = sum(1 for sp in specs if any(ax == DATA_AXIS for ax in sp))
    assert n_sharded >= 4, f"expected sharded leaves, got {n_sharded}"
    state = jax.tree.map(jax.device_put, state, shardings)
    step_f = make_pretrain_step(
        model, TINY_CFG, tx, mesh=mesh, state_shardings=shardings,
    )
    sf, m_f = step_f(state, shard_batch(mesh, batch), jax.random.PRNGKey(2))

    l_dp = float(jax.device_get(m_dp["loss"]))
    l_f = float(jax.device_get(m_f["loss"]))
    assert np.isfinite(l_dp) and np.isfinite(l_f)
    assert abs(l_f - l_dp) < 1e-4, (l_dp, l_f)
    # the updated state must still be sharded (and shards really are smaller)
    out_l, out_sh = jax.tree.leaves(sf), jax.tree.leaves(shardings)
    kept = 0
    for a, s in zip(out_l, out_sh):
        assert a.sharding.is_equivalent_to(s, a.ndim), (a.sharding, s)
        if any(ax == DATA_AXIS for ax in s.spec):
            assert a.addressable_shards[0].data.size < a.size
            kept += 1
    assert kept == n_sharded
    # params/teacher updated in the sharded run match the replicated run
    p_dp = jax.device_get(sdp.params)
    p_f = jax.device_get(sf.params)
    diffs = jax.tree.map(
        lambda x, y: float(np.max(np.abs(x - y))), p_dp, p_f
    )
    # Adam's first-step update normalizes by sqrt(v)~|g|, amplifying fp32
    # reduction-order differences between the sharded and replicated update;
    # placement BUGS would be O(1) here (wrong shard applied), not 1e-4.
    assert max(jax.tree.leaves(diffs)) < 1e-3, max(jax.tree.leaves(diffs))
