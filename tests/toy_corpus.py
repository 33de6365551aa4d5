"""Deterministic synthetic tone-word corpus for trains-to-quality tests.

Five "words" (named by single letters so CharTokenizer transcribes them),
each a fixed fundamental with two harmonics — a crude formant structure —
spoken by "speakers" that scale the pitch and amplitude. Utterances are
word sequences separated by short silences, so an ASR model must learn
both the tone->letter mapping and the silence->space segmentation.

Used by the SPIRAL trains-to-quality test (tests/test_spiral_quality.py):
the reference's de-facto integration test is training to a quality metric
(SPIRAL/examples/asr/spiral_pretrain.py:124-190, ctc_finetune.py:440-460);
this corpus makes that assertable deterministically without LibriSpeech.
"""

from __future__ import annotations

import json
import os

import numpy as np

SR = 16000
WORD_HZ = {"a": 400.0, "b": 650.0, "c": 950.0, "d": 1350.0, "e": 1850.0}
WORD_DUR = 0.16
GAP_DUR = 0.08
N_WORDS = 3
# 3 * (0.16 + 0.08) + 0.08 lead = 0.8 s = 12800 samples
UTT_SAMPLES = int(SR * (N_WORDS * (WORD_DUR + GAP_DUR) + GAP_DUR))
SPEAKER_PITCH = (0.88, 1.0, 1.14)


def _synth_word(rng: np.random.Generator, f0: float, pitch: float
                ) -> np.ndarray:
    n = int(SR * WORD_DUR)
    t = np.arange(n) / SR
    f = f0 * pitch * (1.0 + 0.01 * rng.standard_normal())
    sig = (
        np.sin(2 * np.pi * f * t)
        + 0.5 * np.sin(2 * np.pi * 2 * f * t + rng.uniform(0, np.pi))
        + 0.25 * np.sin(2 * np.pi * 3 * f * t + rng.uniform(0, np.pi))
    )
    ramp = int(0.01 * SR)
    env = np.minimum(1.0, np.minimum(np.arange(n), n - np.arange(n)) / ramp)
    return (sig * env).astype(np.float32)


def synth_utterance(rng: np.random.Generator, words, pitch: float
                    ) -> np.ndarray:
    gap = int(SR * GAP_DUR)
    amp = 0.25 * (1.0 + 0.2 * rng.standard_normal())
    pieces = [np.zeros(gap, np.float32)]
    for w in words:
        pieces.append(amp * _synth_word(rng, WORD_HZ[w], pitch))
        pieces.append(np.zeros(gap, np.float32))
    wav = np.concatenate(pieces)[:UTT_SAMPLES]
    wav = np.pad(wav, (0, UTT_SAMPLES - len(wav)))
    wav += (0.003 * rng.standard_normal(len(wav))).astype(np.float32)
    return wav


def make_toy_corpus(root: str, n_utts: int, seed: int = 0,
                    name: str = "manifest.json") -> str:
    """Write n_utts wavs + a JSON-lines manifest under root; returns the
    manifest path. Deterministic in (seed, n_utts)."""
    from tpu_speech.data.wav import write_wav

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    letters = sorted(WORD_HZ)
    entries = []
    for i in range(n_utts):
        words = [letters[int(k)] for k in rng.integers(0, len(letters),
                                                       size=N_WORDS)]
        pitch = SPEAKER_PITCH[i % len(SPEAKER_PITCH)]
        wav = synth_utterance(rng, words, pitch)
        path = os.path.join(root, f"{name.split('.')[0]}_utt{i:04d}.wav")
        write_wav(path, wav, SR)
        entries.append({
            "audio_filepath": path,
            "duration": len(wav) / SR,
            "text": " ".join(words),
        })
    mpath = os.path.join(root, name)
    with open(mpath, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    return mpath
