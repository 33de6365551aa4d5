"""Deterministic synthetic tone-word corpus for TTS/VC trains-to-quality.

The TTS analog of tests/toy_corpus.py (ASR): a closed vocabulary of real
English words (so the Grad-TTS text frontend exercises cleaners + CMUdict
lookup), each rendered as a fixed fundamental with two harmonics at
22.05 kHz. An overfit-able corpus with enough text->spectral structure that
a trained model's synthesized mel can be gated by MAE against the ground
truth — the reference's de-facto integration test is exactly per-epoch loss
curves + synthesis inspection (Grad-TTS/train.py:142-175,
DiffVC/train_dec.py:115-136), made assertable here.
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import numpy as np

SR = 22050
# words chosen to be in the CMU dictionary; distinct fundamentals give each
# word a distinct mel signature
WORD_HZ = {
    "bee": 340.0,
    "day": 520.0,
    "key": 760.0,
    "go": 1050.0,
    "my": 1420.0,
    "new": 1900.0,
}
WORD_DUR = 0.16
GAP_DUR = 0.06
N_WORDS = 3


def synth_utterance(rng: np.random.Generator, words: Sequence[str],
                    pitch: float = 1.0) -> np.ndarray:
    gap = int(SR * GAP_DUR)
    n = int(SR * WORD_DUR)
    ramp = int(0.01 * SR)
    env = np.minimum(1.0, np.minimum(np.arange(n), n - np.arange(n)) / ramp)
    pieces = [np.zeros(gap, np.float32)]
    for w in words:
        t = np.arange(n) / SR
        f = WORD_HZ[w] * pitch
        sig = (
            np.sin(2 * np.pi * f * t)
            + 0.5 * np.sin(2 * np.pi * 2 * f * t)
            + 0.25 * np.sin(2 * np.pi * 3 * f * t)
        )
        pieces.append((0.3 * sig * env).astype(np.float32))
        pieces.append(np.zeros(gap, np.float32))
    wav = np.concatenate(pieces)
    # tiny deterministic dither so the mel floor is not exactly log(clamp)
    wav += (1e-4 * rng.standard_normal(len(wav))).astype(np.float32)
    return wav


def make_tts_corpus(root: str, n_utts: int = 12, seed: int = 0,
                    multispeaker: bool = False,
                    pitches: Sequence[float] = (1.0,),
                    ) -> Tuple[str, List[Tuple[str, str]]]:
    """Write wavs + a 'path|text[|spk]' filelist under root.

    Returns (filelist_path, [(wav_path, text), ...]). Deterministic in
    (seed, n_utts)."""
    from tpu_speech.data.wav import write_wav

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    words = sorted(WORD_HZ)
    entries = []
    lines = []
    for i in range(n_utts):
        ws = [words[int(k)] for k in rng.integers(0, len(words),
                                                  size=N_WORDS)]
        spk = i % len(pitches)
        wav = synth_utterance(rng, ws, pitches[spk])
        path = os.path.join(root, f"utt{i:04d}.wav")
        write_wav(path, wav, SR)
        text = " ".join(ws)
        entries.append((path, text))
        line = f"{path}|{text}"
        if multispeaker:
            line += f"|{spk}"
        lines.append(line)
    flist = os.path.join(root, "filelist.txt")
    with open(flist, "w") as f:
        f.write("\n".join(lines) + "\n")
    return flist, entries
