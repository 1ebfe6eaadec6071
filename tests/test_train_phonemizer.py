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


def _systematic_lexicon():
    """CMUdict-style word list from a systematic grapheme->IPA mapping
    (plus a context rule: c -> s before i/e, else k) — large enough to
    split train/held-out and measure generalization, the contract the
    reference trainer documents (phonemization_training/README.md: rules
    compiled from grapheme/phoneme correspondence rates, exceptions to a
    dictionary)."""
    cons = {"b": "b", "d": "d", "f": "f", "g": "ɡ", "k": "k", "l": "l",
            "m": "m", "n": "n", "p": "p", "r": "ɹ", "s": "s", "t": "t",
            "ch": "tʃ", "sh": "ʃ", "th": "θ"}
    vowels = {"a": "æ", "e": "ɛ", "i": "ɪ", "o": "ɒ", "u": "ʌ",
              "ee": "iː", "oo": "uː"}

    def phonemize(word):
        out = []
        i = 0
        graphemes = sorted(list(cons) + list(vowels) + ["c"], key=len,
                           reverse=True)
        units = []
        while i < len(word):
            for gr in graphemes:
                if word.startswith(gr, i):
                    units.append(gr)
                    i += len(gr)
                    break
            else:
                raise AssertionError(word)
        for j, gr in enumerate(units):
            if gr == "c":
                nxt = units[j + 1] if j + 1 < len(units) else ""
                out.append("s" if nxt and nxt[0] in "ie" else "k")
            elif gr in cons:
                out.append(cons[gr])
            else:
                out.append(vowels[gr])
        return "".join(out)

    onsets = ["b", "d", "f", "g", "k", "l", "m", "n", "p", "r", "s", "t",
              "ch", "sh", "th", "c"]
    nuclei = ["a", "e", "i", "o", "u", "ee", "oo"]
    codas = ["b", "d", "g", "k", "l", "m", "n", "p", "s", "t"]
    words = []
    for i, on in enumerate(onsets):
        for j, nu in enumerate(nuclei):
            # subsample codas so the lexicon stays a few hundred words;
            # append a second coda so every word is >= 4 letters — the
            # runtime (faithfully to the reference, phonemizer.cpp:698-712)
            # letter-spells unknown words shorter than 4 chars as acronyms
            for k, co in enumerate(codas[(i + j) % 3::3]):
                words.append(on + nu + co + ("t", "s", "p")[k % 3])
    return {w: phonemize(w) for w in words}


def test_trainer_heldout_accuracy_through_gguf(tmp_path):
    """Train on 80% of a systematic lexicon, export the GGUF, and measure
    EXACT-match accuracy of the runtime phonemizer on the held-out 20%
    (words never seen in training, built from trained graphemes/contexts).
    Prints the metric; the reference's contract is rule generalization with
    exceptions in the dictionary, so held-out accuracy must be high."""
    lex = _systematic_lexicon()
    words = sorted(lex)
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(words))
    held = {words[i] for i in perm[: len(words) // 5]}
    train = {w: lex[w] for w in words if w not in held}
    t = PhonemizationTrainer()
    t.train(train)
    assert t.verify(train) == 1.0          # training set reproduces exactly

    path = str(tmp_path / "ph_big.gguf")
    t.export_gguf(path)
    ph = Phonemizer.from_gguf(GGUFReader(path))
    hits = sum(ph.text_to_phonemes(w) == lex[w] for w in held)
    acc = hits / len(held)
    print(f"\nheld-out phonemization accuracy: {acc:.3f} "
          f"({hits}/{len(held)} words, {len(train)} train)")
    assert acc >= 0.85, acc


# ---------------------------------------------------------------------------
# natural-English validation (round-5): a bundled REAL lexicon of ~690
# common English words in espeak-style GenAm IPA (tests/data/), not the
# synthetic rule-generated lexicon above
# ---------------------------------------------------------------------------

def _edit_distance(a: str, b: str) -> int:
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev, dp[j] = dp[j], cur
    return dp[n]


def _english_lexicon():
    import json
    import os
    path = os.path.join(os.path.dirname(__file__), "data",
                        "english_lexicon.json")
    return json.load(open(path))


def test_trainer_on_natural_english(tmp_path):
    """Reference-trainer contract on real English
    (phonemization_training/phonemization_trainer.py:17-60): rules are
    compiled so the TRAINING corpus reproduces exactly, with the exception
    dictionary absorbing residuals; held-out generalization is partial
    (English stress placement is lexical) and is reported here with
    measured floors — exact match >= 12% and mean phoneme-edit similarity
    >= 0.65 on a 1/6 held-out split (measured: 18.4% / 0.714)."""
    import random
    from tts_tpu.apps.train_phonemizer import PhonemizationTrainer

    lex = _english_lexicon()
    assert len(lex) > 500
    items = sorted(lex.items())
    random.Random(0).shuffle(items)
    n_hold = len(items) // 6
    hold, train = dict(items[:n_hold]), dict(items[n_hold:])

    tr = PhonemizationTrainer()
    tr.train(train, iters=3)
    # the reference contract: every training word reproduces exactly
    # (dictionary absorbs whatever the rules cannot express)
    assert tr.verify(train) == 1.0

    wp = tr._build(tr.rules)
    exact = 0
    sims = []
    for w, p in hold.items():
        got = tr.dictionary.get(w.lower()) or wp.phonemize(w.lower())
        exact += got == p
        sims.append(1 - _edit_distance(got, p) / max(len(got), len(p), 1))
    exact_frac = exact / len(hold)
    mean_sim = sum(sims) / len(sims)
    print(f"natural-English held-out n={len(hold)}: "
          f"exact={exact_frac:.3f} edit-sim={mean_sim:.3f}")
    assert exact_frac >= 0.12, exact_frac
    assert mean_sim >= 0.65, mean_sim


def test_trainer_natural_english_gguf_roundtrip(tmp_path):
    """Export the natural-English ruleset to GGUF and phonemize through the
    RUNTIME phonemizer loader — trained words must reproduce exactly end to
    end (the deployment path of the reference's training pipeline)."""
    from tts_tpu.apps.train_phonemizer import PhonemizationTrainer
    from tts_tpu.gguf.reader import GGUFReader
    from tts_tpu.text.phonemizer import Phonemizer

    lex = dict(sorted(_english_lexicon().items())[:200])
    tr = PhonemizationTrainer()
    tr.train(lex, iters=2)
    path = str(tmp_path / "english_rules.gguf")
    tr.export_gguf(path)
    ph = Phonemizer.from_gguf(GGUFReader(path))
    bad = [w for w, p in lex.items()
           if ph.text_to_phonemes(w).strip() != p]
    assert len(bad) <= 2, bad[:10]
