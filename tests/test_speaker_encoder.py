"""Speaker encoder parity (LSTM vs torch) + vocoding utility tests."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpu_speech.compat.torch_speaker_encoder import convert_speaker_encoder  # noqa: E402
from tpu_speech.models.speaker_encoder import (  # noqa: E402
    SpeakerEncoder,
    compute_partial_slices,
    embed_utterance,
    ge2e_loss,
    normalize_volume,
    wav_to_mel_spectrogram,
)


class TorchSpeakerEncoder(torch.nn.Module):
    """Minimal torch twin of the reference encoder (model.py:14-62) used as
    oracle (the reference file imports sklearn/webrtcvad, absent here)."""

    def __init__(self, mel_n=40, hidden=64, emb=64, layers=3):
        super().__init__()
        self.lstm = torch.nn.LSTM(mel_n, hidden, layers, batch_first=True)
        self.linear = torch.nn.Linear(hidden, emb)

    def forward(self, x):
        out, (hidden, cell) = self.lstm(x)
        raw = torch.relu(self.linear(hidden[-1]))
        return raw / torch.norm(raw, dim=1, keepdim=True)


def test_lstm_encoder_parity(rng):
    torch.manual_seed(0)
    tm = TorchSpeakerEncoder()
    tm.eval()
    x = rng.standard_normal((3, 20, 40)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    params = convert_speaker_encoder(tm.state_dict())
    model = SpeakerEncoder(hidden_size=64, embedding_size=64, num_layers=3)
    got = model.apply({"params": params["params"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_embed_utterance_shape(rng):
    model = SpeakerEncoder(hidden_size=32, embedding_size=32, num_layers=2)
    wav = rng.standard_normal(16000 * 2).astype(np.float32) * 0.1
    frames = wav_to_mel_spectrogram(wav)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(frames[None, :160]))
    emb = embed_utterance(model, params, wav)
    assert emb.shape == (32,)
    assert np.isclose(np.linalg.norm(emb), 1.0, atol=1e-5)


def test_partial_slices():
    wav_slices, mel_slices = compute_partial_slices(16000 * 3)
    assert len(wav_slices) == len(mel_slices) >= 2
    assert all(s.stop - s.start == 160 for s in mel_slices)


def test_ge2e_loss_separates_speakers(rng):
    # identical embeddings per speaker, orthogonal across -> tiny loss
    e = np.zeros((4, 5, 16), dtype=np.float32)
    for s in range(4):
        e[s, :, s] = 1.0
    loss_good, _ = ge2e_loss(jnp.asarray(e), 10.0, -5.0)
    e_bad = rng.standard_normal((4, 5, 16)).astype(np.float32)
    e_bad /= np.linalg.norm(e_bad, axis=2, keepdims=True)
    loss_bad, _ = ge2e_loss(jnp.asarray(e_bad), 10.0, -5.0)
    assert float(loss_good) < float(loss_bad)


def test_normalize_volume():
    wav = np.ones(1000, dtype=np.float32) * 0.001
    out = normalize_volume(wav, -30, increase_only=True)
    dbfs = 10 * np.log10(np.mean(out**2))
    assert np.isclose(dbfs, -30, atol=0.5)


def test_random_cycler_guarantees():
    from tpu_speech.data.speaker_verification import RandomCycler

    items = list(range(5))
    cyc = RandomCycler(items, np.random.default_rng(0))
    m = 23
    out = cyc.sample(m)
    counts = {i: out.count(i) for i in items}
    lo, hi = m // len(items), ((m - 1) // len(items)) + 1
    assert all(lo <= c <= hi for c in counts.values()), counts


def test_speaker_verification_sampler(tmp_path, rng):
    from tpu_speech.data.speaker_verification import SpeakerVerificationSampler

    n_mels = 12
    for spk in range(3):
        d = tmp_path / f"spk{spk}"
        d.mkdir()
        for u in range(2):
            np.save(d / f"utt{u}.npy",
                    rng.standard_normal((20 + 5 * u, n_mels)).astype(np.float32))
    sampler = SpeakerVerificationSampler(
        str(tmp_path), speakers_per_batch=3, utterances_per_speaker=4,
        n_frames=10, seed=1,
    )
    batch = sampler.next_batch()
    assert batch.shape == (12, 10, n_mels)
    batch2 = sampler.next_batch()
    assert not np.array_equal(batch, batch2)


@pytest.mark.slow  # full train loop with checkpoint save + resume
def test_train_speaker_encoder_loop(tmp_path, rng):
    """End-to-end GE2E loop (reference encoder/train.py): loss/EER logging,
    projection image, checkpoint save + resume."""
    from tpu_speech.train.speaker_encoder import train_speaker_encoder

    n_mels = 40
    data = tmp_path / "data"
    for spk in range(3):
        d = data / f"spk{spk}"
        d.mkdir(parents=True)
        for u in range(2):
            np.save(d / f"utt{u}.npy",
                    rng.standard_normal((12, n_mels)).astype(np.float32))
    models = str(tmp_path / "models")
    state = train_speaker_encoder(
        str(data), models, run_id="t", speakers_per_batch=3,
        utterances_per_speaker=2, n_frames=8, max_steps=2, vis_every=1,
        umap_every=2, save_every=2, backup_every=0,
    )
    assert int(state.step) == 2
    backups = tmp_path / "models" / "t_backups"
    assert (backups / "t_proj_000002.png").exists()
    # resume continues from the saved step
    state = train_speaker_encoder(
        str(data), models, run_id="t", speakers_per_batch=3,
        utterances_per_speaker=2, n_frames=8, max_steps=3, vis_every=1,
        umap_every=0, save_every=0, backup_every=0,
    )
    assert int(state.step) == 3


def test_plot_projections_shapes(rng):
    from tpu_speech.utils.plotting import pca_project, plot_projections

    emb = rng.standard_normal((20, 16)).astype(np.float32)
    proj = pca_project(emb)
    assert proj.shape == (20, 2)
    img = plot_projections(emb, utterances_per_speaker=4, step=7)
    assert img.ndim == 3 and img.shape[2] == 3


def test_preprocess_spk_cli(tmp_path, rng):
    """preprocess.py analog: wav dirs -> per-speaker .npy frames consumable
    by the GE2E sampler (encoder/preprocess.py:63-120)."""
    import sys
    sys.path.insert(0, "cli")
    from preprocess_spk import preprocess_speaker_dirs

    from tpu_speech.data.speaker_verification import SpeakerVerificationSampler
    from tpu_speech.data.wav import write_wav

    raw = tmp_path / "raw"
    for spk in range(2):
        d = raw / f"spk{spk}" / "sess1"
        d.mkdir(parents=True)
        for u in range(2):
            # ~2.2 s of tone+noise at 16 kHz -> > 160 mel frames after VAD
            t = np.arange(35000) / 16000.0
            wav = (0.4 * np.sin(2 * np.pi * (200 + 50 * spk + 10 * u) * t)
                   + 0.05 * rng.standard_normal(35000)).astype(np.float32)
            write_wav(str(d / f"utt{u}.wav"), wav, 16000)
    out = tmp_path / "processed"
    n = preprocess_speaker_dirs(str(raw), str(out), "toy")
    assert n == 4
    assert (out / "Log_toy.txt").exists()
    assert (out / "spk0" / "_sources.txt").exists()
    frames = np.load(next((out / "spk0").glob("*.npy")))
    assert frames.ndim == 2 and frames.shape[1] == 40
    assert frames.shape[0] >= 160
    sampler = SpeakerVerificationSampler(str(out), 2, 3, 160, seed=0)
    batch = sampler.next_batch()
    assert batch.shape == (6, 160, 40)
