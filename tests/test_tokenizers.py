"""Tokenizer registry (reference: SPIRAL/nemo/collections/common/tokenizers/).

Covers char/word/subword round-trips, the CTC blank-offset wrapper, and the
HuggingFace AutoTokenizer wrapper (constructed from local files — this
environment has no hub access, like any airgapped trainer).
"""

import json

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
