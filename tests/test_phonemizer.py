"""Native phonemizer tests: number expansion, acronyms, roman numerals,
possessives, contractions, dictionary lookups, grapheme rules."""
import numpy as np
import pytest

from tts_tpu.text import phonemizer_data as D
from tts_tpu.text.phonemizer import (
    Conditions, Corpus, DictionaryResponse, PhonemeDictionary, Phonemizer,
    WordPhonemizer, build_number_phoneme, build_subthousand_phoneme,
    replace_accents, response_from_string,
)
from tts_tpu.text.tokenizer import SinglePassTokenizer


def mk_phonemizer(dictionary=None, rules=None):
    d = PhonemeDictionary()
    for k, v in (dictionary or {}).items():
        out = [response_from_string(x, k) for x in v.split(",")]
        kk = k
        if kk[:1] in ("$", "#"):
            kk = kk[1:]
        if kk.endswith("#"):
            kk = kk[:-1]
        d.lookup_map[kk] = out
    graphemes = ["<unk>"] + list("abcdefghijklmnopqrstuvwxyz") + ["ch", "sh", "th"]
    wp = WordPhonemizer(SinglePassTokenizer(graphemes))
    for keys, ph in (rules or []):
        wp.add_rule(keys, ph)
    return Phonemizer(d, wp)


def test_corpus_basics():
    c = Corpus("hello world")
    assert c.next() == "h"
    assert c.next(5) == "hello"
    assert c.pop(5) == "hello"
    assert c.last() == "o"
    assert c.after() == "w"
    assert c.next_in(D.ALPHABET) == ""
    c.pop()
    assert c.next_in(D.ALPHABET) == "world"


def test_number_phonemes():
    assert build_subthousand_phoneme(5) == D.NUMBER_PHONEMES[5]
    assert build_subthousand_phoneme(21) == \
        D.SUB_HUNDRED_NUMBERS[0] + " " + D.NUMBER_PHONEMES[1]
    assert build_subthousand_phoneme(300) == \
        D.NUMBER_PHONEMES[3] + " " + D.HUNDRED_PHONEME
    out = build_number_phoneme(1_000_001)
    assert D.MILLION_PHONEME in out and D.NUMBER_PHONEMES[1] in out


def test_simple_number_text():
    ph = mk_phonemizer()
    out = ph.text_to_phonemes("42")
    assert out == D.SUB_HUNDRED_NUMBERS[2] + " " + D.NUMBER_PHONEMES[2]


def test_decimal_number():
    ph = mk_phonemizer()
    out = ph.text_to_phonemes("3.5")
    assert D.NUMBER_PHONEMES[3] in out
    assert D.POINT_PHONEME in out
    assert D.NUMBER_PHONEMES[5] in out


def test_large_number_with_commas():
    ph = mk_phonemizer()
    out = ph.text_to_phonemes("1,234")
    assert D.THOUSAND_PHONEME in out


def test_dictionary_word():
    ph = mk_phonemizer({"hello": "həlˈoʊ", "world": "wˈɜːld"})
    assert ph.text_to_phonemes("hello world") == "həlˈoʊ wˈɜːld"


def test_dictionary_preserves_clause_punctuation():
    ph = mk_phonemizer({"hi": "hˈaɪ"})
    assert ph.text_to_phonemes("hi!") == "hˈaɪ!"


def test_acronym_spelled_out():
    ph = mk_phonemizer()
    # "tts" (3 letters, not an english word) is spelled letter by letter
    out = ph.text_to_phonemes("tts")
    assert out == D.LETTER_PHONEMES["t"] + D.LETTER_PHONEMES["t"] + D.LETTER_PHONEMES["s"]


def test_small_word_not_acronym():
    ph = mk_phonemizer({}, rules=[(["c", "^", "a", "cat"], "k"),
                                  (["a", "c", "t", "cat"], "æ"),
                                  (["t", "a", "$", "cat"], "t")])
    assert ph.text_to_phonemes("cat") == "kæt"


def test_grapheme_rule_wildcards():
    # rule keyed on before/after with wildcard word fallback
    ph = mk_phonemizer({}, rules=[
        (["a"], "ɑ"), (["b"], "b"), (["t"], "t"), (["c"], "k"),
        (["a", "b", "*t"], "æ"),
    ])
    # in "bat": 'a' has before=b, after=t -> the specific rule
    assert ph.text_to_phonemes("bat") == "bæt"


def test_roman_numerals():
    ph = mk_phonemizer()
    out = ph.text_to_phonemes("XIV")
    assert out == build_number_phoneme(14)


def test_possessive_forms():
    ph = mk_phonemizer({"dog": "dˈɔːɡ", "cats": "kˈæts", "sofa": "sˈoʊfə"})
    # consonant (non s/z) -> "s"; vowel -> "z"; s/z -> ᵻz
    assert ph.text_to_phonemes("dog's") == "dˈɔːɡs"
    assert ph.text_to_phonemes("sofa's") == "sˈoʊfəz"
    assert ph.text_to_phonemes("cats's") == "kˈætsᵻz"


def test_contraction():
    ph = mk_phonemizer({"they": "ðˈeɪ"})
    assert ph.text_to_phonemes("they're") == "ðˈeɪr"
    ph2 = mk_phonemizer({"i": "ˈaɪ"})
    assert ph2.text_to_phonemes("i've") == "ˈaɪəv"


def test_symbol_replacement():
    ph = mk_phonemizer({"b": "bi"})
    out = ph.text_to_phonemes("a + b")
    assert D.REPLACEABLE["+"] in out


def test_accented_word_fallback():
    ph = mk_phonemizer({"cafe": "kæfˈeɪ"})
    assert ph.text_to_phonemes("café") == "kæfˈeɪ"


def test_clause_punctuation_preserved():
    ph = mk_phonemizer({"yes": "jˈɛs", "no": "nˈoʊ"})
    out = ph.text_to_phonemes("yes. no!")
    assert out == "jˈɛs. nˈoʊ!"


def test_hyphenated_words():
    ph = mk_phonemizer({"well": "wˈɛl", "known": "nˈoʊn"})
    out = ph.text_to_phonemes("well-known")
    # hyphenation joins without a space
    assert out == "wˈɛlnˈoʊn"


def test_partial_response_mechanics():
    # value:after parses into a SUCCESS_PARTIAL with after-match text, and
    # $/# key prefixes/suffixes set the context flags (reference
    # response_from_string, phonemizer.cpp:1068-1088)
    r = response_from_string("ɹˈɛd:ing", "read")
    assert r.code == 101 and r.value == "ɹˈɛd" and r.after_match == "ing"
    r2 = response_from_string("θˈɜːd", "$rd")
    assert r2.expects_to_be_proceeded_by_number
    r3 = response_from_string("x", "#word#")
    assert r3.not_at_clause_start and r3.not_at_clause_end
    # is_match honors the was_number flag
    c = Corpus("ing after")
    f = Conditions()
    r = response_from_string("ɹˈɛd:ing", "read")
    assert r.is_match(c, f)
    r2b = response_from_string("θˈɜːd:", "$rd")
    f.was_number = False
    assert not r2b.is_match(c, f)
    f.was_number = True
    assert r2b.is_match(c, f)


def test_replace_accents():
    assert replace_accents("café") == "cafe"
    assert replace_accents("niño") == "nino"


def test_gguf_roundtrip(tmp_path):
    from tts_tpu.gguf import GGUFReader, GGUFWriter
    path = str(tmp_path / "ph.gguf")
    w = GGUFWriter(path, "kokoro")
    w.add_u32("phonemizer.type", 0)
    w.add_array("phonemizer.graphemes", ["<unk>"] + list("abcdefghijklmnopqrstuvwxyz"))
    w.add_array("phonemizer.rules.keys", ["c", "a", "t"])
    w.add_array("phonemizer.rules.phonemes", ["k", "æ", "t"])
    w.add_array("phonemizer.dictionary.keys", ["hello"])
    w.add_array("phonemizer.dictionary.values", ["həlˈoʊ"])
    w.write()
    r = GGUFReader(path)
    ph = Phonemizer.from_gguf(r)
    assert ph.text_to_phonemes("hello") == "həlˈoʊ"
    assert ph.text_to_phonemes("cat") == "kæt"
