"""Greedy CTC decoding + WER/CER metrics.

Equivalent of SPIRAL/nemo/collections/asr/metrics/wer.py:71-272 and
parts/compute_wer.py: argmax -> collapse repeats -> drop blanks; word/char
error rates via native Levenshtein distance (no editdistance dependency).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def ctc_greedy_decode(
    log_probs: np.ndarray, lengths: np.ndarray, blank_idx: int
) -> List[List[int]]:
    """(B, T, K) -> list of token-id sequences (repeats collapsed, blanks
    removed)."""
    preds = np.asarray(log_probs).argmax(axis=-1)
    out = []
    for i in range(preds.shape[0]):
        seq = preds[i, : int(lengths[i])]
        collapsed = []
        prev = -1
        for s in seq:
            if s != prev and s != blank_idx:
                collapsed.append(int(s))
            prev = s
        out.append(collapsed)
    return out


def levenshtein(a: Sequence, b: Sequence) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def word_error_rate(hypotheses: Sequence[str], references: Sequence[str],
                    use_cer: bool = False) -> float:
    """Aggregate WER (or CER): total edits / total reference tokens."""
    errors, total = 0, 0
    for hyp, ref in zip(hypotheses, references):
        h = list(hyp) if use_cer else hyp.split()
        r = list(ref) if use_cer else ref.split()
        errors += levenshtein(h, r)
        total += len(r)
    return errors / max(total, 1)


def analyze_errors(hypotheses: Sequence[str], references: Sequence[str]
                   ) -> List[Tuple[str, str, int, int]]:
    """Per-utterance (hyp, ref, edits, ref_len) diagnosis rows
    (parts/compute_wer.py:24-73 role)."""
    rows = []
    for hyp, ref in zip(hypotheses, references):
        h, r = hyp.split(), ref.split()
        rows.append((hyp, ref, levenshtein(h, r), len(r)))
    return rows
