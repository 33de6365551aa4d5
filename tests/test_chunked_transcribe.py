"""Chunked long-audio transcription: overlapping windows stitched at the
overlap midpoints must reproduce the whole-sequence log-prob stream.

Uses a deterministic fake inference (1 frame per 80 samples, label from the
wav's sign at the frame start) so the stitching arithmetic is checked
exactly against the unchunked oracle, independent of any model.
"""

import types

import numpy as np

from tpu_speech.eval.wer import ctc_greedy_decode
from tpu_speech.train.spiral_runner import SpiralFinetuneRunner

SR = 8000
SPF = 80  # samples per output frame in the fake encoder


def _fake_log_probs(wav_segment: np.ndarray) -> np.ndarray:
    f = len(wav_segment) // SPF
    lp = np.full((f, 3), -30.0)
    for j in range(f):
        label = 1 if wav_segment[j * SPF] > 0 else 2
        lp[j, label] = 0.0
    return lp


def _stub(max_samples: int):
    stub = types.SimpleNamespace()
    stub.cfg = types.SimpleNamespace(
        model=types.SimpleNamespace(
            train_ds=types.SimpleNamespace(sample_rate=SR)
        )
    )
    stub.max_samples = max_samples
    stub.state = types.SimpleNamespace(params=None, batch_stats=None)

    def infer_fn():
        def infer(params, batch_stats, wavs, wav_lens):
            w = np.asarray(wavs)[0]
            n = int(np.asarray(wav_lens)[0])
            lp = _fake_log_probs(w[:n])
            return lp[None], np.array([lp.shape[0]])

        return infer

    stub._infer_fn = infer_fn
    return stub


def test_stitched_equals_unchunked_oracle():
    rng = np.random.default_rng(0)
    # alternating-sign blocks -> alternating labels; block length 400 samples
    n_blocks, block = 50, 400
    wav = np.concatenate([
        np.full(block, 0.5 if (i % 2 == 0) else -0.5) for i in range(n_blocks)
    ]) + rng.standard_normal(n_blocks * block) * 0.01
    wav = np.sign(wav) * np.maximum(np.abs(wav), 0.1)  # keep signs clean

    full = _fake_log_probs(wav)
    window = 8000  # 1 s windows over a 2.5 s wav
    # overlap 0.2 s -> ov=1600 samples = exactly 10 frames per half-overlap
    stitched = SpiralFinetuneRunner._chunked_log_probs(
        _stub(window), wav, overlap_s=0.2
    )
    assert stitched.shape == full.shape, (stitched.shape, full.shape)
    np.testing.assert_array_equal(stitched, full)

    # and the decoded label stream matches
    dec_full = ctc_greedy_decode(full[None], np.array([len(full)]), 0)[0]
    dec_st = ctc_greedy_decode(
        stitched[None], np.array([len(stitched)]), 0
    )[0]
    assert list(dec_full) == list(dec_st)


def test_tail_window_is_kept():
    # wav not a multiple of the hop: the last partial window must contribute
    wav = np.full(20000 + 1600, 0.5)
    stitched = SpiralFinetuneRunner._chunked_log_probs(
        _stub(8000), wav, overlap_s=0.2
    )
    full = _fake_log_probs(wav)
    assert stitched.shape[0] == full.shape[0]


class _IdTokenizer:
    def ids_to_text(self, ids):
        return " ".join(str(i) for i in ids)


def test_transcribe_beam_matches_greedy_on_peaked_probs(monkeypatch, tmp_path):
    """transcribe(beam_width>1) routes through prefix beam search; on the
    fake encoder's near-one-hot frames the beam result must equal greedy,
    on both the short path and the chunked long-audio path."""
    stub = _stub(8000)
    stub.model = types.SimpleNamespace(blank_idx=0)
    stub.tokenizer = _IdTokenizer()
    stub._chunked_log_probs = (
        lambda wav, overlap_s: SpiralFinetuneRunner._chunked_log_probs(
            stub, wav, overlap_s
        )
    )

    short_wav = np.full(4000, 0.5)           # fits in one window
    long_wav = np.concatenate([               # forces the chunked path
        np.full(6400, 0.5), np.full(6400, -0.5), np.full(6400, 0.5)
    ])
    wavs = {"short.wav": short_wav, "long.wav": long_wav}
    monkeypatch.setattr(
        "tpu_speech.data.wav.read_wav",
        lambda path: (wavs[path.split("/")[-1]], SR),
    )

    paths = [str(tmp_path / "short.wav"), str(tmp_path / "long.wav")]
    greedy = SpiralFinetuneRunner.transcribe(stub, paths)
    beam = SpiralFinetuneRunner.transcribe(stub, paths, beam_width=8)
    assert greedy == beam
    assert all(t for t in greedy)  # both decoded something non-empty
