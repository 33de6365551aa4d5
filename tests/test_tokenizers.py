"""Tokenizer registry (reference: SPIRAL/nemo/collections/common/tokenizers/).

Covers char/word/subword round-trips, the CTC blank-offset wrapper, and the
HuggingFace AutoTokenizer wrapper (constructed from local files — this
environment has no hub access, like any airgapped trainer).
"""

import json

import pytest

from tpu_speech.text.tokenizers import (
    BlankOffsetTokenizer,
    CharTokenizer,
    DEFAULT_CHAR_LABELS,
    HuggingFaceTokenizer,
    SubwordTokenizer,
    WordTokenizer,
)


def test_char_tokenizer_roundtrip():
    tok = CharTokenizer(DEFAULT_CHAR_LABELS)
    ids = tok.text_to_ids("Hello World")
    assert tok.ids_to_text(ids) == "hello world"
    assert tok.vocab_size == len(DEFAULT_CHAR_LABELS)


def test_word_tokenizer_unk():
    tok = WordTokenizer(["the", "cat"])
    assert tok.text_to_ids("the dog") == [0, tok.unk_id]


def test_subword_greedy_longest_match(tmp_path):
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("<unk>\n▁the\n▁cat\n▁ca\nt\ns\n")
    tok = SubwordTokenizer(str(vocab))
    ids = tok.text_to_ids("the cats")
    assert tok.ids_to_text(ids) == "the cats"
    # longest match: '▁cat' wins over '▁ca'+'t'
    assert ids == [1, 2, 5]


def test_blank_offset_wrapper():
    tok = BlankOffsetTokenizer(CharTokenizer(DEFAULT_CHAR_LABELS))
    ids = tok.text_to_ids("ab")
    assert 0 not in ids  # id 0 reserved for the CTC blank
    assert tok.ids_to_text(ids) == "ab"
    assert tok.vocab_size == len(DEFAULT_CHAR_LABELS) + 1


def test_huggingface_tokenizer_wrapper(tmp_path):
    # build a local wordpiece tokenizer (no hub access needed)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "cat", "sat", "##s"]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab) + "\n")
    (tmp_path / "tokenizer_config.json").write_text(
        json.dumps({"tokenizer_class": "BertTokenizer",
                    "do_lower_case": True})
    )
    tok = HuggingFaceTokenizer(str(tmp_path))
    ids = tok.text_to_ids("the cats sat")
    # special tokens excluded from encode (CTC targets are pieces only)
    assert 2 not in ids and 3 not in ids
    assert tok.ids_to_text(ids) == "the cats sat"
    # transformers may register extra special tokens (e.g. [MASK])
    assert tok.vocab_size >= len(vocab)


# --- manifest-transcript parsers (reference parts/parsers.py) ---

from tpu_speech.text.parsers import CharParser, ENCharParser, make_parser


def test_char_parser_basic_and_oov_drop():
    p = CharParser(["a", "b", "c"])
    assert p("abc") == [0, 1, 2]
    # default unk_id == blank_id == -1 silently drops OOV (parsers.py:96)
    assert p("aXc") == [0, 2]


def test_char_parser_space_and_special_labels():
    p = CharParser([" ", "a", "b", "<sil>"])
    # multi-char labels match whole whitespace-split words
    assert p("ab <sil> b") == [1, 2, 0, 3, 0, 2]


def test_char_parser_add_end_space():
    p = CharParser([" ", "a", "b"], add_end_space=True)
    # end-space mode: space AFTER each word instead of between words
    assert p("ab a") == [1, 2, 0, 1, 0]


def test_char_parser_unk_id_kept_when_distinct():
    p = CharParser(["a", "b"], unk_id=7, blank_id=-1)
    assert p("aXb") == [0, 7, 1]


def test_en_parser_normalization():
    labels = [" "] + list("abcdefghijklmnopqrstuvwxyz") + ["'"]
    p = ENCharParser(labels)
    # transliterate + number expansion + punctuation mapping + '&' word
    assert p("Café #5 & co.") == p("cafe five and company")
    ids = p("it's 2 a.m.")
    assert ids == p("it's two a m")


def test_en_parser_keeps_label_punctuation():
    labels = [" "] + list("abcdefghijklmnopqrstuvwxyz") + ["'"]
    p = ENCharParser(labels)
    # apostrophe is a label so the punctuation table must not strip it
    assert labels.index("'") in p("don't")


def test_make_parser_registry():
    import pytest

    assert isinstance(make_parser(["a"], name="base"), CharParser)
    assert isinstance(make_parser(["a"], name="en"), ENCharParser)
    with pytest.raises(ValueError):
        make_parser(["a"], name="zh")
    with pytest.raises(ValueError):
        make_parser(None, name="base")


def test_char_tokenizer_en_parser_default():
    tok = CharTokenizer(DEFAULT_CHAR_LABELS)
    # the reference char datasets default to parser='en'
    # (audio_to_text.py:446); digits must expand to words
    ids = tok.text_to_ids("agent 7")
    assert tok.ids_to_text(ids) == "agent seven"
    raw = CharTokenizer(DEFAULT_CHAR_LABELS, parser=None)
    assert raw.ids_to_text(raw.text_to_ids("agent 7")) == "agent "


# --- SPM unigram Viterbi (offline fallback) -------------------------------
# The reference tokenizes subword finetunes with a real SentencePiece unigram
# model (sentencepiece_tokenizer.py:34, vocab spm_1k_libri_unigram_bos_mask
# via parts/mixins.py:33-120). Without the sentencepiece binary, the scored
# '.vocab' fallback must produce the SAME segmentation: unigram Viterbi with
# the SPM unknown model (min_score - 10.0 per char, consecutive unknowns
# fused). The frozen table below was generated from the HuggingFace
# `tokenizers` Unigram implementation (the faithful SPM-unigram port) with
# Metaspace pretokenization — the same lattice SPM's unigram_model.cc solves.

UNIGRAM_VOCAB = [
    ("<unk>", 0.0), ("<s>", 0.0), ("</s>", 0.0),
    ("▁the", -3.1), ("▁cat", -3.4), ("▁sat", -3.6), ("▁mat", -3.7),
    ("▁on", -3.2), ("▁speech", -3.3), ("▁back", -4.0), ("bone", -4.1),
    ("▁backbone", -7.9), ("th", -6.0), ("he", -6.1), ("at", -6.2),
    ("▁s", -8.0), ("s", -9.5), ("c", -10.0), ("a", -10.1), ("t", -10.2),
    ("h", -10.3), ("e", -10.4), ("▁", -11.0), ("o", -10.5), ("n", -10.6),
    ("m", -10.7), ("b", -10.8), ("k", -10.9), ("p", -11.1), ("▁c", -9.0),
    ("▁t", -9.1), ("▁m", -9.2), ("▁b", -9.3), ("▁o", -9.4),
]

# text -> SPM-unigram ids (frozen from the tokenizers-library oracle)
UNIGRAM_EXPECTED = {
    "the cat sat on the mat": [3, 4, 5, 7, 3, 6],
    # one piece (-7.9) beats '▁back'+'bone' (-8.1): true Viterbi, a greedy
    # longest-match FROM THE LEFT also picks '▁backbone', but...
    "backbone": [11],
    "speech backbones": [8, 11, 16],
    # ...'thecat' splits '▁the'+'c'+'at', where greedy would eat '▁th'(absent)
    "thecat": [3, 17, 14],
    "catmat": [4, 25, 14],
    # unknown chars: fused into ONE <unk> per run (SPM id output)
    "xx the qq cat": [22, 0, 3, 22, 0, 4],
    "cczz": [29, 17, 0],
}


def _write_unigram_vocab(path):
    with open(path, "w", encoding="utf-8") as f:
        for p, s in UNIGRAM_VOCAB:
            f.write(f"{p}\t{s}\n")
    return str(path)


def test_subword_unigram_viterbi_frozen_table(tmp_path):
    tok = SubwordTokenizer(_write_unigram_vocab(tmp_path / "uni.vocab"))
    assert tok.scores is not None  # scored vocab -> Viterbi path active
    for text, ids in UNIGRAM_EXPECTED.items():
        assert tok.text_to_ids(text) == ids, text


def test_subword_unigram_viterbi_beats_greedy(tmp_path):
    """A case where greedy longest-match and unigram Viterbi disagree —
    the old fallback would diverge from real SentencePiece here."""
    vocab = tmp_path / "v.vocab"
    # greedy eats '▁ab' then is stuck with 'c'+'d'; Viterbi picks '▁a'+'bcd'
    vocab.write_text(
        "<unk>\t0.0\n▁ab\t-1.0\n▁a\t-3.0\nbcd\t-1.0\nc\t-8.0\nd\t-8.0\n",
        encoding="utf-8",
    )
    tok = SubwordTokenizer(str(vocab))
    pieces = [tok.pieces[i] for i in tok.text_to_ids("abcd")]
    assert pieces == ["▁a", "bcd"]  # total -4.0 beats greedy's -17.0


def test_subword_unigram_matches_hf_tokenizers_oracle(tmp_path):
    """Property check against the live HuggingFace `tokenizers` Unigram
    oracle (the SPM-unigram algorithm), randomized inputs."""
    pytest.importorskip("tokenizers")
    import random

    from tokenizers import Tokenizer as HFTokenizer
    from tokenizers.models import Unigram
    from tokenizers.pre_tokenizers import Metaspace

    oracle = HFTokenizer(Unigram(UNIGRAM_VOCAB, unk_id=0, byte_fallback=False))
    oracle.pre_tokenizer = Metaspace(
        replacement="▁", prepend_scheme="always", split=True
    )
    tok = SubwordTokenizer(_write_unigram_vocab(tmp_path / "uni.vocab"))
    rng = random.Random(11)
    alphabet = "abcdefghijklmnopqrstuvwxyz'7"
    for _ in range(200):
        text = " ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
            for _ in range(rng.randint(1, 5))
        )
        assert tok.text_to_ids(text) == oracle.encode(text).ids, text


def test_subword_unigram_control_symbols_never_match(tmp_path):
    tok = SubwordTokenizer(_write_unigram_vocab(tmp_path / "uni.vocab"))
    # the literal string '<unk>' in text must not match the control piece
    ids = tok.text_to_ids("<unk>")
    assert all(tok.pieces[i] != "<s>" for i in ids)


def test_subword_unigram_wer_bpe_roundtrip(tmp_path):
    """WERBPE-path semantics (reference metrics/wer_bpe.py): hypothesis ids
    decode through the subword tokenizer back to words before WER."""
    import numpy as np

    from tpu_speech.eval.wer import word_error_rate

    tok = SubwordTokenizer(_write_unigram_vocab(tmp_path / "uni.vocab"))
    refs = ["the cat sat on the mat", "speech backbones"]
    hyps = [tok.ids_to_text(tok.text_to_ids(r)) for r in refs]
    assert hyps == refs
    assert word_error_rate(hyps, refs) == 0.0
    # substituted word -> 1 error / 8 ref words
    hyp_ids = tok.text_to_ids("the cat sat on the cat")
    wer = word_error_rate(
        [tok.ids_to_text(hyp_ids), refs[1]], refs,
    )
    assert np.isclose(wer, 1.0 / 8.0)
