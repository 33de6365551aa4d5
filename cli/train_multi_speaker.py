"""Grad-TTS multi-speaker training CLI (reference train_multi_speaker.py
recipe: Libri-TTS filelist with '|'-separated speaker ids, n_spks=247)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import train

if __name__ == "__main__":
    import params

    assert params.n_spks > 1, "set params.n_spks (e.g. 247 for Libri-TTS)"
    train.main(multispeaker=True)
