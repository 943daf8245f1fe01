"""Byte-level vectorized tokenizer (analysis/fastpath.py) equivalence
against the reference `analyze()` chain, plus the `_window_codes`
dispatcher that merges non-ASCII / over-long fallback docs into the
fast path's code space."""

import random
import string

import numpy as np
import pytest

from lucene_spark.analysis import analyze
from lucene_spark.analysis.fastpath import tokenize_window_ascii
from lucene_spark.index.builder import _window_codes


def reconstruct(codes, uniq, dls):
    out, i = [], 0
    for dl in dls:
        out.append([uniq[c] for c in codes[i:i + int(dl)]])
        i += int(dl)
    return out


GRAMMAR_CASES = [
    ["hello world", "a.b c:d 1,2 don't x_y", "", "   ", "123;456 a.1 1.a"],
    ["_x __ 9_a", "don''t a..b a.b.c 'x' ,,;;", ".a a. 'a a' 1. .1 1,"],
    ["a" * 255, "x", "a.b", "ABC Def.GHI 1.2"],
]


@pytest.mark.parametrize("texts", GRAMMAR_CASES)
def test_fastpath_matches_analyze(texts):
    codes, uniq, dls = tokenize_window_ascii(texts)
    assert reconstruct(codes, uniq, dls) == [analyze(t) for t in texts]


def test_fastpath_rejects_overlong_runs():
    assert tokenize_window_ascii(["a" * 300]) is None
    assert tokenize_window_ascii(["a" * 200 + "." + "a" * 200]) is None


def test_fastpath_random_property():
    rng = random.Random(1234)
    alphabet = (
        string.ascii_letters + string.digits
        + "_.,;:' \n\t!@#$%^&*()[]{}<>/\\\"-+=~`|?"
    )
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 300)))
        for _ in range(1500)
    ]
    codes, uniq, dls = tokenize_window_ascii(texts)
    assert reconstruct(codes, uniq, dls) == [analyze(t) for t in texts]


def test_window_codes_merges_fallback_docs():
    """Non-ASCII and over-long docs are re-lexed via analyze() and merged
    into the shared code space; output must equal per-doc analyze()."""
    texts = [
        "plain ascii doc one",
        "unicode été doc",          # non-ascii -> fallback
        "b" * 300 + " tail",                    # overlong -> fallback
        "plain ascii doc two plain",
        "İstanbul İ",                # dotted capital I
        "",
    ]
    codes, uniq, dls, emitted = _window_codes(texts)
    assert emitted is None  # no dropping filter in the chain
    assert reconstruct(codes, uniq, dls) == [analyze(t) for t in texts]
    # codes all valid, vocabulary covers every referenced code
    assert codes.dtype == np.int32
    if codes.size:
        assert codes.max() < len(uniq)
