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
