import io

from tpu_speech.text import (
    CMUDict,
    intersperse,
    sequence_to_text,
    symbols,
    text_to_sequence,
)
from tpu_speech.text.cleaners import english_cleaners
from tpu_speech.text.numbers import (
    normalize_numbers,
    number_to_words,
    ordinal_to_words,
    year_style_words,
)


def test_symbol_table_matches_reference_inventory():
    assert len(symbols) == 148
    assert symbols[0] == "_"
    assert symbols[1] == "-"
    assert symbols[2] == "!"
    assert "@AA1" in symbols
    assert symbols[-1] == "@ZH"


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(7) == "seven"
    assert number_to_words(21) == "twenty-one"
    assert number_to_words(105) == "one hundred five"
    assert number_to_words(1234) == "one thousand, two hundred thirty-four"
    assert (
        number_to_words(1234567)
        == "one million, two hundred thirty-four thousand, five hundred sixty-seven"
    )


def test_ordinals():
    assert ordinal_to_words(1) == "first"
    assert ordinal_to_words(2) == "second"
    assert ordinal_to_words(3) == "third"
    assert ordinal_to_words(12) == "twelfth"
    assert ordinal_to_words(20) == "twentieth"
    assert ordinal_to_words(21) == "twenty-first"
    assert ordinal_to_words(100) == "one hundredth"


def test_year_style():
    assert year_style_words(1999) == "nineteen ninety-nine"
    assert year_style_words(1905) == "nineteen oh five"
    assert year_style_words(2015) == "twenty fifteen"


def test_normalize_numbers():
    assert normalize_numbers("in 1999") == "in nineteen ninety-nine"
    assert normalize_numbers("$1.50") == "one dollar, fifty cents"
    assert normalize_numbers("the 3rd") == "the third"
    assert normalize_numbers("2000") == "two thousand"
    assert normalize_numbers("2005") == "two thousand five"
    assert normalize_numbers("1900") == "nineteen hundred"
    assert normalize_numbers("3.14") == "three point fourteen"
    assert normalize_numbers("1,000 things") == "one thousand things"


def test_english_cleaners():
    assert english_cleaners("Dr.  Smith   lives\tat 21 Main St.") == (
        "doctor smith lives at twenty-one main saint"
    )
    assert english_cleaners("Café") == "cafe"


def test_text_to_sequence_roundtrip():
    seq = text_to_sequence("Hello, world!", ["english_cleaners"])
    assert sequence_to_text(seq) == "hello, world!"


def test_text_to_sequence_arpabet_escape():
    seq = text_to_sequence("{HH AH0 L OW1} there", ["english_cleaners"])
    text = sequence_to_text(seq)
    assert text.startswith("{HH AH0 L OW1}")
    assert text.endswith(" there")


def test_cmudict_lookup_and_phonemization():
    fake = io.StringIO(
        "HELLO  HH AH0 L OW1\nHELLO(1)  HH EH0 L OW1\nWORLD  W ER1 L D\n"
    )
    d = CMUDict(fake)
    assert len(d) == 2
    assert d.lookup("hello") == ["HH AH0 L OW1", "HH EH0 L OW1"]
    seq = text_to_sequence("hello world", ["english_cleaners"], d)
    txt = sequence_to_text(seq)
    assert "{HH AH0 L OW1}" in txt and "{W ER1 L D}" in txt


def test_intersperse():
    assert intersperse([5, 6], 0) == [0, 5, 0, 6, 0]
    assert intersperse([], 9) == [9]
