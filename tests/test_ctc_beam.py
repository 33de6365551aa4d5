"""CTC prefix beam search vs exact brute-force marginalization."""

import itertools

import numpy as np
import pytest

from tpu_speech.eval.ctc_beam import NGramLM, ctc_beam_search, ctc_beam_search_batch

BLANK = 0


def _labeling_logp(log_probs, labeling):
    """Exact log P(labeling) = logsumexp over ALL alignments that collapse to
    it (brute force over the T^|V| alignment space)."""
    T, V = log_probs.shape
    total = -np.inf
    for path in itertools.product(range(V), repeat=T):
        # collapse: remove repeats then blanks
        out, prev = [], None
        for s in path:
            if s != prev and s != BLANK:
                out.append(s)
            prev = s
        if tuple(out) == tuple(labeling):
            total = np.logaddexp(total, sum(log_probs[t, s] for t, s in enumerate(path)))
    return total


def _all_labelings(T, V):
    for L in range(T + 1):
        yield from itertools.product(range(1, V), repeat=L)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_beam_finds_exact_argmax_labeling(seed):
    rng = np.random.default_rng(seed)
    T, V = 5, 3
    logits = rng.standard_normal((T, V)) * 2.0
    log_probs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    exact = max(
        _all_labelings(T, V), key=lambda lab: _labeling_logp(log_probs, lab)
    )
    hyp = ctc_beam_search(log_probs, T, blank=BLANK, beam_width=64)
    assert tuple(hyp) == tuple(exact), (hyp, exact)


def test_beam_matches_greedy_when_peaked():
    from tpu_speech.eval.wer import ctc_greedy_decode

    rng = np.random.default_rng(3)
    T, V = 12, 6
    # near-one-hot frames: beam and greedy must agree
    hot = rng.integers(0, V, size=T)
    log_probs = np.full((T, V), -20.0)
    log_probs[np.arange(T), hot] = -1e-3
    hyp = ctc_beam_search(log_probs, T, blank=BLANK, beam_width=8)
    greedy = ctc_greedy_decode(log_probs[None], np.array([T]), BLANK)[0]
    assert list(hyp) == list(greedy)


def test_lm_fusion_breaks_acoustic_tie():
    # labels 1 and 3 acoustically near-tied at the second step (3 slightly
    # ahead); the LM prefers 2->1 and flips the decision
    log_probs = np.log(np.array([
        [0.01, 0.01, 0.97, 0.01],   # label 2
        [0.01, 0.48, 0.01, 0.50],   # 1 vs 3, 3 slightly ahead
    ], dtype=np.float64))
    no_lm = ctc_beam_search(log_probs, 2, blank=0, beam_width=8)
    assert no_lm == [2, 3]

    def lm(prefix, nxt):
        if prefix and prefix[-1] == 2 and nxt == 1:
            return np.log(0.9)
        return np.log(0.05)

    with_lm = ctc_beam_search(
        log_probs, 2, blank=0, beam_width=8, lm=lm, alpha=1.0
    )
    assert with_lm == [2, 1]


def test_batch_decode_respects_lengths():
    rng = np.random.default_rng(4)
    lp = rng.standard_normal((2, 6, 4))
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    out = ctc_beam_search_batch(lp, np.array([6, 2]), blank=0, beam_width=16)
    short = ctc_beam_search(lp[1], 2, blank=0, beam_width=16)
    assert out[1] == short


def test_ngram_lm_prefers_seen_sequences():
    lm = NGramLM(order=3).fit([[1, 2, 3, 4], [1, 2, 3, 5], [1, 2, 3, 4]])
    # after context (2, 3): 4 seen twice, 5 once, 6 never
    p4 = lm((1, 2, 3)[:-1] + (3,), 4)
    assert lm((2, 3), 4) > lm((2, 3), 5) > lm((2, 3), 6)
    assert np.isfinite(p4)
    # backoff: unseen trigram context falls back to bigram/unigram
    assert np.isfinite(lm((9, 9), 4))
