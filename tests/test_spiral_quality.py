"""SPIRAL trains-to-quality integration test through the REAL CLIs.

The reference's de-facto integration test is training to a quality metric —
pretrain validation loss and finetune/test WER
(SPIRAL/examples/asr/spiral_pretrain.py:124-190,
spec2vec/ctc_finetune.py:440-460). This test reproduces that end to end on
the deterministic tone-word corpus (tests/toy_corpus.py), driving
cli/run_spiral.py exactly as a user would:

  1. st2vec pretrain: contrastive loss DECREASES over epochs and the
     collapse diagnostics stay healthy (check_collapse analog,
     st2vec.py::check_collapse);
  1b. DETERMINISTIC transfer evidence: a closed-form ridge frame-probe on
     encoder features (pretrained EMA teacher vs random init) — pure
     linear algebra, immune to SGD trajectory chaos;
  2. ctc_finetune from the pretrain checkpoint -> --run_mode=test: WER
     beats a sanity cap;
  3. the finetuned WER beats (a) finetuning from a random-init encoder
     with the identical budget and (b) the pre-finetune model (pretrained
     encoder, random decoder), by gap AND ratio gates;
  4. the artifacts exist: train.log loss curves, wer_diagnosis.html.

Calibration (round 5, scripts/calibrate_toy_quality.py): growing the toy
corpus 120 -> 240 train utterances (50 pretrain / 30 finetune epochs)
stabilizes the finetune WER trajectories enough to tighten the round-4
gates. Measured bands across four lr*(1+k*1e-6) perturbation pairs on the
CPU test backend:

    pretrained  0.2222 0.1944 0.2639 0.2361   (band [0.19, 0.27])
    scratch     0.4097 0.3264 0.4097 0.4722   (band [0.33, 0.47])
    per-pair gap   0.188 0.132 0.146 0.236    (worst 0.132)
    per-pair ratio 0.542 0.596 0.644 0.500    (worst 0.644)

plus one chip-backend pair (0.285, 0.563). Gates with margin: sanity cap
0.35 (round 4: 0.55), gap > 0.10 (was 0.07), ratio < 0.70 (was 0.85).
Pushing further to 360 utts / 40 epochs was measured MORE chaotic on the
pretrained arm ([0.01, 0.37] across 3 pairs) — trajectory chaos is not
monotone in corpus scale, so 240/30 is the calibrated operating point.
The deterministic ridge probe (pretrained ~0.7 vs random ~0.48, gate
margin +0.15) remains the trajectory-chaos-immune transfer anchor.
Finetunes start from the EMA teacher weights (--use_teacher_encoder, the
reference's recommended source).
"""

import io
import contextlib
import os
import re
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, os.path.join(REPO, "cli"))

from tests.toy_corpus import make_toy_corpus


def _run(argv):
    import run_spiral

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        run_spiral.main(argv)
    return buf.getvalue()


def _test_wer(out):
    m = re.search(r"TEST: WER = ([\d.]+)", out)
    assert m, out
    return float(m.group(1))


def _frame_probe_accuracy(enc_params, enc_cfg, manifest):
    """Deterministic representation probe: closed-form ridge classifier on
    encoder features against the KNOWN toy frame labels (word tones at
    fixed positions, tests/toy_corpus.py layout). No SGD anywhere, so —
    unlike a finetuned WER on this scale, whose trajectory is chaotic — the
    number moves only as much as the representations themselves."""
    import json

    import jax
    import jax.numpy as jnp

    from tests.toy_corpus import GAP_DUR, N_WORDS, WORD_DUR, WORD_HZ
    from tpu_speech.data.wav import read_wav
    from tpu_speech.models.spiral.st2vec import ST2VecEncoder, wav_to_spec

    model = ST2VecEncoder(enc_cfg)
    names = sorted(WORD_HZ)
    entries = [json.loads(ln) for ln in open(manifest)]
    wavs, lens, texts = [], [], []
    for e in entries:
        w, sr = read_wav(e["audio_filepath"])
        wavs.append(w)
        lens.append(len(w))
        texts.append(e["text"])
    n = max(lens)
    batch = np.zeros((len(wavs), n), np.float32)
    for i, w in enumerate(wavs):
        batch[i, : len(w)] = w
    specs, spec_lens = wav_to_spec(
        enc_cfg, jnp.asarray(batch),
        jnp.asarray(np.asarray(lens, np.int32)))
    feats, feat_lens = jax.jit(
        model.apply, static_argnames=("train", "method")
    )({"params": enc_params}, specs, spec_lens, train=False,
      method="encode_features")
    feats = np.asarray(feats, np.float64)
    # label each 80 ms feature frame by the word (or silence) at its center
    sub = 8  # spec frames per feature frame
    xs, ys, groups = [], [], []
    for i, text in enumerate(texts):
        words = text.split(" ")
        assert len(words) == N_WORDS
        for f in range(int(feat_lens[i])):
            t = (f * sub + sub / 2) * 0.01  # seconds
            label = len(names)  # silence
            for wi, word in enumerate(words):
                start = GAP_DUR + wi * (WORD_DUR + GAP_DUR)
                if start <= t < start + WORD_DUR:
                    label = names.index(word)
            xs.append(feats[i, f])
            ys.append(label)
            groups.append(i)
    x = np.stack(xs)
    y = np.asarray(ys)
    g = np.asarray(groups)
    x = np.concatenate([x, np.ones((len(x), 1))], axis=1)
    tr, te = g % 2 == 0, g % 2 == 1  # split by utterance
    onehot = np.eye(len(names) + 1)[y]
    a = x[tr].T @ x[tr] + 1e-3 * np.eye(x.shape[1])
    w = np.linalg.solve(a, x[tr].T @ onehot[tr])
    pred = np.argmax(x[te] @ w, axis=1)
    return float(np.mean(pred == y[te]))


def _load_pretrained_teacher(logs_pre, enc_cfg, batch_size, crop_size):
    """Restore the pretrain state and return (teacher-EMA params, random
    params) for the probe."""
    import importlib

    import jax

    from tpu_speech.models.spiral.st2vec import ST2VecEncoder
    from tpu_speech.train.spiral import init_spiral_state
    from tpu_speech.train.spiral_runner import _make_optimizer, _spec_len
    from tpu_speech.utils.checkpoint import Checkpointer

    toycfg = importlib.import_module("conf.spiral.spiral_toy_quality")
    model = ST2VecEncoder(enc_cfg)
    spec_len = _spec_len(crop_size, enc_cfg.sample_rate)
    # optimizer built like the runner's so the opt_state TREE matches the
    # checkpoint (values are discarded; only params/teacher are used)
    tx = _make_optimizer(toycfg.cfg.model.optim, 100, 1.0)
    template = init_spiral_state(
        model, jax.random.PRNGKey(0),
        (batch_size, spec_len, enc_cfg.num_features), tx)
    random_params = jax.device_get(template.params)
    state = Checkpointer(os.path.join(logs_pre, "ckpt")).restore_latest(
        jax.device_get(template))
    assert state is not None
    pre = dict(state.params)
    pre.update(state.teacher)  # EMA feature_encoder + projector
    return pre, random_params


@pytest.mark.slow
@pytest.mark.quality
def test_spiral_trains_to_quality(tmp_path):
    train_manifest = make_toy_corpus(
        str(tmp_path / "train"), 240, seed=0, name="train.json"
    )
    test_manifest = make_toy_corpus(
        str(tmp_path / "test"), 48, seed=1, name="test.json"
    )
    sets = [
        "--set", f"model.train_ds.manifest_filepath={train_manifest}",
        "--set", f"model.validation_ds.manifest_filepath={test_manifest}",
        "--set", f"model.test_ds.manifest_filepath={test_manifest}",
    ]

    # ---- 1. pretrain through the CLI ------------------------------------
    logs_pre = str(tmp_path / "logs_pre")
    _run([
        "--config_name=spiral_toy_quality",
        "--model_save_dir", logs_pre,
        "--model_type=st2vec",
        "--max_epochs=50",
        "--resume_if_exists=false",
    ] + sets)
    log_text = open(os.path.join(logs_pre, "train.log")).read()
    losses = [float(x) for x in re.findall(r"Epoch \d+: loss = ([\d.]+)",
                                           log_text)]
    assert len(losses) == 50, log_text
    # contrastive loss decreases and stays down (compare epoch means, not
    # single steps): last-5 mean well below first-epoch loss
    assert np.mean(losses[-5:]) < losses[0] - 0.15, losses
    # collapse diagnostics healthy: off-diagonal self-similarity of the
    # student predictions must not approach 1 (a collapsed representation
    # maps every frame to the same vector; st2vec_model.py:287-312)
    # (?<!target_): match the STUDENT self-similarity only — the plain
    # substring also caught target_self_sim, and the EMA teacher's
    # self-similarity is legitimately high on the self-similar tone corpus
    sims = [float(x)
            for x in re.findall(r"(?<!target_)self_sim = ([-\d.]+)", log_text)]
    assert sims, log_text
    assert max(sims) < 0.98, sims

    # ---- 1b. DETERMINISTIC transfer evidence: closed-form frame probe ----
    # ridge classifier on encoder features vs the known toy frame labels,
    # pretrained EMA-teacher encoder vs a random-init encoder. Pure linear
    # algebra on top of the features — immune to the SGD trajectory chaos
    # that makes the toy WERs move 0.1-0.4 under 1e-7 perturbations.
    import importlib

    toycfg = importlib.import_module("conf.spiral.spiral_toy_quality")
    pre_params, rand_params = _load_pretrained_teacher(
        logs_pre, toycfg.encoder, 8, toycfg.crop_size)
    acc_pre = _frame_probe_accuracy(pre_params, toycfg.encoder, test_manifest)
    acc_rand = _frame_probe_accuracy(
        rand_params, toycfg.encoder, test_manifest)
    print(f"frame probe: pretrained {acc_pre:.3f} vs random {acc_rand:.3f}")
    assert acc_pre > acc_rand + 0.15, (acc_pre, acc_rand)

    ck = os.path.join(logs_pre, "ckpt")
    step_dir = sorted(os.listdir(ck))[-1]

    # ---- 2. finetune from the pretrained encoder + test mode ------------
    logs_ft = str(tmp_path / "logs_ft")
    _run([
        "--config_name=spiral_toy_quality",
        "--model_save_dir", logs_ft,
        "--model_type=ctc_finetune",
        "--max_epochs=30",
        "--resume_if_exists=false",
        "--init_chkpt_dir", ck,
        "--init_chkpt_file", step_dir,
        # EMA teacher weights (reference --use_teacher_encoder): the
        # momentum-averaged encoder is far less sensitive to the toy
        # pretrain trajectory's chaos than the raw student — this is what
        # keeps the pretrained arm's WER band tight across harmless float
        # reassociations (round-4 calibration)
        "--use_teacher_encoder", "true",
    ] + sets)
    out = _run([
        "--config_name=spiral_toy_quality",
        "--model_save_dir", logs_ft,
        "--model_type=ctc_finetune",
        "--run_mode=test",
        "--resume_if_exists=true",
    ] + sets)
    wer_pretrained = _test_wer(out)
    # sanity cap, round-5 calibration at the 240-utt scale: pretrained band
    # [0.19, 0.27] over four CPU perturbation pairs (+0.285 on chip), so
    # 0.35 holds with margin (round 4's cap at the 120-utt scale was 0.55)
    assert wer_pretrained < 0.35, out

    # artifacts: per-utterance diagnosis + loss curves
    assert os.path.exists(os.path.join(logs_ft, "wer_diagnosis.html"))
    ft_log = open(os.path.join(logs_ft, "train.log")).read()
    ctc_losses = [float(x) for x in re.findall(r"ctc loss = ([\d.]+)",
                                               ft_log)]
    assert len(ctc_losses) == 30
    assert ctc_losses[-1] < 0.5 * ctc_losses[0], ctc_losses

    # ---- 3a. control: identical budget from a random-init encoder -------
    logs_scratch = str(tmp_path / "logs_scratch")
    _run([
        "--config_name=spiral_toy_quality",
        "--model_save_dir", logs_scratch,
        "--model_type=ctc_finetune",
        "--max_epochs=30",
        "--resume_if_exists=false",
        "--finetune_from_scratch=true",
    ] + sets)
    out = _run([
        "--config_name=spiral_toy_quality",
        "--model_save_dir", logs_scratch,
        "--model_type=ctc_finetune",
        "--run_mode=test",
        "--resume_if_exists=true",
    ] + sets)
    wer_scratch = _test_wer(out)
    # pretraining must transfer: substantially better than scratch.
    # round-5 calibration pairs (pretrained, scratch) at this scale:
    # (0.22, 0.41), (0.19, 0.33), (0.26, 0.41), (0.24, 0.47) — worst
    # per-pair gap 0.132, worst ratio 0.644; gates leave margin on both
    assert wer_pretrained < wer_scratch - 0.10, (wer_pretrained, wer_scratch)
    assert wer_pretrained < 0.70 * wer_scratch, (wer_pretrained, wer_scratch)

    # ---- 3b. control: pre-finetune model (pretrained enc, random head) --
    # --max_epochs=0 runs no finetune steps but writes the archive, so test
    # mode can consume it via --init_archive (restore workflow)
    logs_nof = str(tmp_path / "logs_nofinetune")
    _run([
        "--config_name=spiral_toy_quality",
        "--model_save_dir", logs_nof,
        "--model_type=ctc_finetune",
        "--max_epochs=0",
        "--resume_if_exists=false",
        "--init_chkpt_dir", ck,
        "--init_chkpt_file", step_dir,
    ] + sets)
    arch = [f for f in os.listdir(logs_nof) if f.endswith(".tpu_speech")]
    assert arch, os.listdir(logs_nof)
    out = _run([
        "--config_name=spiral_toy_quality",
        "--model_save_dir", str(tmp_path / "logs_nof_test"),
        "--model_type=ctc_finetune",
        "--run_mode=test",
        "--resume_if_exists=false",
        "--init_archive", os.path.join(logs_nof, arch[0]),
    ] + sets)
    wer_prefinetune = _test_wer(out)
    # finetuning must beat the untrained head. Round-5 calibration at the
    # 240-utt scale: the prefinetune arm lands FAR lower than round 4's
    # 0.78-1.0 (the stronger pretrained features make even a random head
    # partially decodable) — measured band [0.34, 0.60] across the five
    # perturbation arms vs finetuned [0.19, 0.27]; worst per-pair gap
    # 0.139, worst ratio 0.592. Gates with margin:
    assert wer_pretrained < wer_prefinetune - 0.08, (
        wer_pretrained, wer_prefinetune,
    )
    assert wer_pretrained < 0.70 * wer_prefinetune, (
        wer_pretrained, wer_prefinetune,
    )
