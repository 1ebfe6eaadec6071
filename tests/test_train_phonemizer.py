"""Phonemizer trainer: rule induction must reproduce the lexicon exactly and
export a GGUF loadable by the runtime phonemizer."""
import numpy as np
import pytest

from tts_tpu.apps.train_phonemizer import PhonemizationTrainer
from tts_tpu.gguf import GGUFReader
from tts_tpu.text.phonemizer import Phonemizer

LEXICON = {
    "cat": "kˈæt",
    "cab": "kˈæb",
    "bat": "bˈæt",
    "bad": "bˈæd",
    "tab": "tˈæb",
    "chat": "tʃˈæt",
    "chap": "tʃˈæp",
    "ship": "ʃˈɪp",
    "shin": "ʃˈɪn",
    "thin": "θˈɪn",
    "dog": "dˈɔːɡ",
    "dot": "dˈɑːt",
    "sofa": "sˈoʊfə",
    "city": "sˈɪɾi",   # c -> s before i: needs a context rule
    "ice": "ˈaɪs",
}


def test_trainer_exact_reproduction():
    t = PhonemizationTrainer()
    t.train(LEXICON)
    assert t.verify(LEXICON) == 1.0


def test_trainer_learns_defaults_and_contexts():
    t = PhonemizationTrainer()
    t.train(LEXICON)
    wp = t._build(t.rules)
    # a word that was in training reproduces
    assert (t.dictionary.get("cat") or wp.phonemize("cat")) == "kˈæt"
    # generalization: an unseen word built from trained graphemes produces
    # SOMETHING non-empty from the defaults
    assert len(wp.phonemize("tad")) > 0


def test_trainer_gguf_roundtrip(tmp_path):
    t = PhonemizationTrainer()
    t.train(LEXICON)
    path = str(tmp_path / "ph.gguf")
    t.export_gguf(path)
    r = GGUFReader(path)
    ph = Phonemizer.from_gguf(r)
    # runtime phonemizer: dictionary words take the dictionary path; others
    # route through the grapheme rules
    for word, ipa in LEXICON.items():
        got = ph.text_to_phonemes(word)
        assert got == ipa, (word, got, ipa)
