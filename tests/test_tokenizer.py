"""Tokenizer semantics tests.

Unigram is cross-checked against an independent brute-force DP; BPE against
hand-worked merge sequences; single-pass against the reference's documented
shortest-first / longest-match behaviors.
"""
import itertools

import numpy as np
import pytest

from tts_tpu.text import BPETokenizer, SinglePassTokenizer, UnigramTokenizer


def brute_force_unigram(text, vocab, scores, unk, unk_score):
    """Exhaustive best-segmentation search (exponential; tiny strings only).

    Any byte not covered by a vocab token may be taken as an unknown step
    with unk_score; consecutive unknowns merge into one token id."""
    data = text.encode("utf-8")
    n = len(data)
    best = (float("-inf"), None)

    def rec(i, toks, score):
        nonlocal best
        if i == n:
            # merge consecutive unknowns
            merged = [t for t, g in itertools.groupby(toks)
                      if True] if False else []
            out = []
            for t in toks:
                if out and out[-1] == unk and t == unk:
                    continue
                out.append(t)
            if score > best[0]:
                best = (score, out)
            return
        for tok, tid in vocab.items():
            b = tok.encode("utf-8")
            if data[i:i + len(b)] == b:
                rec(i + len(b), toks + [tid], score + scores[tid])
        rec(i + 1, toks + [unk], score + unk_score)

    rec(0, [], 0.0)
    return best[1]


def test_unigram_matches_bruteforce():
    tokens = ["<unk>", " ", "ab", "abc", "bc", "c", "a", "b", " a"]
    scores = [-10.0, -1.0, -2.0, -2.5, -1.5, -1.2, -3.0, -3.0, -1.8]
    vocab = {t: i for i, t in enumerate(tokens)}
    tok = UnigramTokenizer(vocab, 0, scores)
    for text in ["abc", "abcabc", "a bc", "cab", "abcc"]:
        got = tok.tokenize(text)
        # normalization: " " + collapsed
        norm = " " + text
        expect = brute_force_unigram(norm, vocab, scores, 0, scores[0])
        assert got == expect, (text, got, expect)


def test_unigram_space_dedupe():
    tokens = ["<unk>", " ", "hi"]
    scores = [-10.0, -1.0, -1.0]
    tok = UnigramTokenizer({t: i for i, t in enumerate(tokens)}, 0, scores)
    assert tok.tokenize("hi    hi") == tok.tokenize("hi hi")


def test_unigram_unknown_merging():
    tokens = ["<unk>", " ", "x"]
    scores = [-1.0, -1.0, -1.0]
    tok = UnigramTokenizer({t: i for i, t in enumerate(tokens)}, 0, scores)
    # "zzz" -> three unknown steps merged into one unk token
    got = tok.tokenize("xzzzx")
    assert got == [1, 2, 0, 2]  # " ", "x", <unk merged>, "x"


def test_unigram_utf8_unknown_step():
    tokens = ["<unk>", " ", "é"]
    scores = [-5.0, -1.0, -1.0]
    tok = UnigramTokenizer({t: i for i, t in enumerate(tokens)}, 0, scores)
    got = tok.tokenize("éñé")  # ñ unknown, 2-byte step
    assert got == [1, 2, 0, 2]


def test_single_pass_shortest_first():
    sp = SinglePassTokenizer(["<unk>", "a", "ab", "b"])
    # tokenize is shortest-match-first: "ab" -> "a","b"
    assert sp.tokenize("ab") == [1, 3]
    # token_split is longest-match: "ab" stays one piece
    assert sp.token_split("ab") == ["ab"]


def test_single_pass_unknown_advance():
    sp = SinglePassTokenizer(["<unk>", "a"])
    assert sp.tokenize("aza") == [1, 0, 1]


def test_single_pass_ipa():
    sp = SinglePassTokenizer(["<unk>", "ɑ", "t", "tʃ"])
    assert sp.tokenize("tɑ") == [2, 1]
    assert sp.token_split("tʃɑ") == ["tʃ", "ɑ"]


def _mk_bpe():
    # vocab: letters + merged units
    tokens = ["<pad>", "h", "e", "l", "o", "Ġ", "he", "ll", "hell", "hello",
              "Ġh", "Ġhe", "lo"]
    vocab = {t: i for i, t in enumerate(tokens)}
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"),
              ("Ġ", "h"), ("Ġh", "e"), ("l", "o")]
    ranks = {m: i for i, m in enumerate(merges)}
    return BPETokenizer(vocab, ranks, bos_token_id=98, eos_token_id=99)


def test_bpe_basic_merges():
    bpe = _mk_bpe()
    assert bpe.tokenize("hello") == [9]  # full merge chain
    # "hell" -> he + ll merged then hell
    assert bpe.tokenize("hell") == [8]


def test_bpe_space_prefix():
    bpe = _mk_bpe()
    # second word gets Ġ prefix; (h,e) rank 0 outranks (Ġ,h) rank 4, so the
    # chain h+e -> ll -> hell -> hello wins, leaving Ġ unmerged
    ids = bpe.tokenize("hello hello")
    assert ids == [9, 5, 9]


def test_bpe_multiple_spaces_collapse():
    bpe = _mk_bpe()
    assert bpe.tokenize("hello  hello") == bpe.tokenize("hello hello")


def test_bpe_rank_priority():
    # ambiguous merge order resolved by rank
    tokens = ["a", "b", "c", "ab", "bc", "abc"]
    vocab = {t: i for i, t in enumerate(tokens)}
    # bc has better (lower) rank than ab
    ranks = {("b", "c"): 0, ("a", "b"): 1, ("a", "bc"): 2}
    bpe = BPETokenizer(vocab, ranks, 0, 0)
    out = bpe.tokenize("abc")
    # b+c merges first -> a, bc -> then a+bc merges -> abc... vocab has no
    # "abc" merge result id 5 via ranks ("a","bc") -> merged
    assert out == [5]
