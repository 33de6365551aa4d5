"""Grad-TTS and DiffVC train-to-quality through the REAL CLIs.

Mirrors tests/test_spiral_quality.py for the other two model families: the
reference's de-facto integration test for them is per-epoch loss curves +
synthesis quality inspection (Grad-TTS/train.py:142-175,
DiffVC/train_dec.py:87-140); here both are made assertable on the
deterministic tone-word corpus (tests/toy_tts_corpus.py):

Grad-TTS (cli/train.py -> cli/inference.py):
  1. dur/prior/diff losses all FALL over epochs (train.log curves);
  2. the trained model synthesizes a training sentence through the real
     inference CLI and the mel MAE vs the ground-truth mel is under a
     calibrated overfit threshold (measured 1.8-3.0 across budgets/seeds;
     an UNTRAINED control synthesized through the same CLI lands ~43 with
     durations collapsed to ~20 frames — the gate demands >10x better than
     control), and the predicted duration is within 25% of the truth.

DiffVC (cli/train_enc.py -> cli/train_dec.py, chained two-stage):
  3. stage-1 encoder loss falls; stage-2 decoder loss falls;
  4. the ENC-FROZEN invariant holds: after decoder training, the encoder
     subtree of the stage-2 state is bit-identical to the loaded stage-1
     checkpoint (vc.py loss stop-gradients the encoder; the optimizer must
     not move it either).
"""

import glob
import io
import contextlib
import os
import re
import sys

import numpy as np
import pytest

import jax

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, os.path.join(REPO, "cli"))

from tests.toy_tts_corpus import SR, make_tts_corpus, synth_utterance


def _epoch_losses(log_path, pattern):
    text = open(log_path).read()
    return [float(x) for x in re.findall(pattern, text)], text


@pytest.mark.slow
@pytest.mark.quality
def test_gradtts_trains_to_quality(tmp_path, monkeypatch):
    import params

    import train as train_cli
    import inference as infer_cli

    flist, entries = make_tts_corpus(str(tmp_path / "corpus"), n_utts=16,
                                     seed=0)
    log_dir = str(tmp_path / "logs")
    n_epochs = 220
    # toy-scale recipe: small model, no decoder crop (utterances are shorter
    # than the 2 s reference crop), one checkpoint at the end
    base = dict(
        train_filelist_path=flist, test_filelist_path=flist,
        log_dir=log_dir, n_epochs=n_epochs, batch_size=8,
        learning_rate=1.5e-3, out_size=None, save_every=max(n_epochs, 1),
        seed=37, n_feats=20, n_fft=512, win_length=512, hop_length=128,
        f_min=0, f_max=8000,
        n_enc_channels=48, filter_channels=128, filter_channels_dp=64,
        n_enc_layers=2, n_heads=2, window_size=2, dec_dim=32,
        y_max_length_bucket=128,
    )
    for k, v in base.items():
        monkeypatch.setattr(params, k, v)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        train_cli.main()

    # 1. all three losses fall: last-10-epoch mean well below first epoch
    pat = (r"Epoch \d+: duration loss = ([\d.]+) \| prior loss = ([\d.]+) "
           r"\| diffusion loss = ([\d.]+)")
    text = open(os.path.join(log_dir, "train.log")).read()
    rows = [(float(a), float(b), float(c))
            for a, b, c in re.findall(pat, text)]
    assert len(rows) == n_epochs, text
    dur, prior, diff = (np.array([r[i] for r in rows]) for i in range(3))
    assert dur[-10:].mean() < 0.5 * dur[0], dur
    assert prior[-10:].mean() < prior[0] - 0.3, prior
    assert diff[-10:].mean() < 0.7 * diff[:5].mean(), diff

    from tpu_speech.audio.mel import mel_spectrogram_np
    from tpu_speech.data.wav import read_wav

    wav_path, text0 = entries[0]
    tfile = str(tmp_path / "texts.txt")
    with open(tfile, "w") as f:
        f.write(text0 + "\n")
    wav, sr = read_wav(wav_path)
    assert sr == SR
    gt = mel_spectrogram_np(
        wav[None], params.n_fft, params.n_feats, SR, params.hop_length,
        params.win_length, params.f_min, params.f_max,
    )[0]

    def synth_mae(archive, out_dir):
        with contextlib.redirect_stdout(io.StringIO()):
            infer_cli.main([
                "-f", tfile, "-c", archive, "-t", "10",
                "--length-scale", "1.0", "--out-dir", out_dir,
                "--hifigan", str(tmp_path / "nonexistent.pt"),
            ])
        mel = np.load(os.path.join(out_dir, "sample_0_mel.npy"))
        n = min(mel.shape[0], gt.shape[0])
        return float(np.abs(mel[:n] - gt[:n]).mean()), mel.shape[0]

    # 2. synthesize the training sentence through the REAL inference CLI
    # (no vocoder checkpoint -> mel .npy output) and gate mel MAE + duration
    arch = glob.glob(os.path.join(log_dir, "*.tpu_speech"))
    assert arch, os.listdir(log_dir)
    mae, n_frames = synth_mae(arch[0], str(tmp_path / "synth"))
    # calibrated on this corpus: trained lands 1.8-3.0 across budgets/seeds
    # (the residual is a systematic score bias of the underfit toy decoder
    # whose magnitude varies with the training trajectory — the PRODUCTION
    # config's absolute fidelity is gated on-chip at 8.7e-4 vs the torch
    # reference by cli/check_fidelity.py); the untrained control lands ~43
    # with durations collapsed, so the train-to-quality signal here is the
    # >10x control ratio + the loss curves + learned durations
    assert mae < 3.5, mae
    assert abs(n_frames - gt.shape[0]) < 0.25 * gt.shape[0], (
        n_frames, gt.shape[0])

    # 3. control: UNTRAINED model through the identical CLI path must be
    # far worse (mirrors test_spiral_quality's scratch arm)
    log0 = str(tmp_path / "logs_untrained")
    monkeypatch.setattr(params, "log_dir", log0)
    monkeypatch.setattr(params, "n_epochs", 0)
    with contextlib.redirect_stdout(io.StringIO()):
        train_cli.main()
    arch0 = glob.glob(os.path.join(log0, "*.tpu_speech"))
    assert arch0, os.listdir(log0)
    mae0, _ = synth_mae(arch0[0], str(tmp_path / "synth_untrained"))
    assert mae < 0.1 * mae0, (mae, mae0)


def _make_vc_data(root: str, n_per_spk: int = 12):
    """DiffVC data-dir layout (mels/ mels_mode/ embeds/ per speaker):
    two pitch-shifted speakers; the 'average voice' target of an utterance
    is the SAME words at pitch 1.0 — exactly the speaker-normalization task
    the real avg-mel builder poses (DiffVC/get_avg_mels.ipynb)."""
    from tpu_speech.audio.mel import mel_spectrogram_np
    from tests.toy_tts_corpus import WORD_HZ

    rng = np.random.default_rng(7)
    words = sorted(WORD_HZ)
    spk_pitch = {"spk0": 0.88, "spk1": 1.12}
    emb_rng = np.random.default_rng(11)
    embeds = {s: (lambda v: v / np.linalg.norm(v))(
        emb_rng.standard_normal(256).astype(np.float32)) for s in spk_pitch}

    def mel_of(wav):
        m = mel_spectrogram_np(wav[None], 1024, 80, SR, 256, 1024, 0, 8000)[0]
        return m.T.astype(np.float32)  # stored (n_mels, T) like the reference

    for spk, pitch in spk_pitch.items():
        for d in ("mels", "mels_mode", "embeds"):
            os.makedirs(os.path.join(root, d, spk), exist_ok=True)
        for i in range(n_per_spk):
            ws = [words[int(k)] for k in rng.integers(0, len(words), size=3)]
            seed_rng = np.random.default_rng(1000 + i)
            wav = synth_utterance(seed_rng, ws, pitch)
            avg = synth_utterance(np.random.default_rng(1000 + i), ws, 1.0)
            mid = f"{spk}_{i:03d}"
            np.save(os.path.join(root, "mels", spk, mid + "_mel.npy"),
                    mel_of(wav))
            np.save(os.path.join(root, "mels_mode", spk,
                                 mid + "_avgmel.npy"), mel_of(avg))
            np.save(os.path.join(root, "embeds", spk, mid + "_embed.npy"),
                    embeds[spk])
    return root


@pytest.mark.slow
@pytest.mark.quality
def test_diffvc_two_stage_trains_to_quality(tmp_path, monkeypatch):
    import params_vc

    import train_enc as enc_cli
    import train_dec as dec_cli

    data_dir = _make_vc_data(str(tmp_path / "vc_data"))
    # toy-scale dims (shared by both stages through params_vc)
    for k, v in dict(
        channels=32, filters=96, layers=2, heads=2, window_size=2,
        enc_dim=32, dec_dim=32, spk_dim=32, train_frames=64,
    ).items():
        monkeypatch.setattr(params_vc, k, v)

    logs_enc = str(tmp_path / "logs_enc")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        enc_cli.main([
            "--data-dir", data_dir, "--log-dir", logs_enc,
            "--epochs", "30", "--batch-size", "8", "--lr", "1e-3",
        ])
    losses, text = _epoch_losses(
        os.path.join(logs_enc, "train.log"), r"Epoch \d+: loss = ([\d.]+)")
    assert len(losses) == 30, text
    assert np.mean(losses[-5:]) < 0.6 * losses[0], losses

    # stage-1 checkpoint -> stage 2 with the frozen encoder
    steps = sorted(glob.glob(os.path.join(logs_enc, "ckpt", "*")))
    assert steps, os.listdir(logs_enc)
    enc_ckpt = steps[-1]

    logs_dec = str(tmp_path / "logs_dec")
    with contextlib.redirect_stdout(buf):
        dec_cli.main([
            "--data-dir", data_dir, "--log-dir", logs_dec,
            "--enc-ckpt", enc_ckpt,
            "--epochs", "20", "--batch-size", "8", "--lr", "1e-3",
        ])
    dlosses, dtext = _epoch_losses(
        os.path.join(logs_dec, "train.log"), r"Epoch \d+: loss = ([\d.]+)")
    assert len(dlosses) == 20, dtext
    assert np.mean(dlosses[-5:]) < np.mean(dlosses[:3]), dlosses

    # 4. enc-frozen invariant: stage-2 final encoder == loaded stage-1 ckpt
    import orbax.checkpoint as ocp

    from tpu_speech.utils.checkpoint import Checkpointer

    enc_params = dec_cli.load_encoder_params(enc_ckpt)
    ck = Checkpointer(os.path.join(logs_dec, "ckpt"))
    restored = ocp.StandardCheckpointer().restore(ck._path(ck.latest_step()))
    dec_enc = restored["params"]["params"]["encoder"]
    ref_leaves = jax.tree.leaves(enc_params)
    got_leaves = jax.tree.leaves(dec_enc)
    assert len(ref_leaves) == len(got_leaves)
    for a, b in zip(ref_leaves, got_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
