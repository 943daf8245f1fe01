"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Shape fixed by BASELINE.json input_hint:
    (repo: string, path: string, commit: string, lang: string, content: string)

Every field of row i is a pure function of (seed, i), so generation is
reproducible at any parallelism / partitioning — the property that makes
docID assignment and rank-identity stable across cluster sizes.

Content mixes (Zipf frequencies): identifiers, keywords, numerics,
punctuation-joined phrases, a shared license header on ~30% of docs
(hot-term skew driver), occasional >255-char unbroken tokens (split
rule), and non-ASCII sprinkles from the analyzer goldens. Doc lengths
span 1..~20,000 tokens so byte4 norm quantization is exercised on both
sides of 39.
"""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pandas as pd

SEED = 42

_EXTS = [("py", "python"), ("java", "java"), ("c", "c"), ("go", "go"), ("md", "markdown")]

_KEYWORDS = (
    "def return if else for while import class public static void int "
    "func package struct type interface var const try except finally "
    "break continue switch case new delete this self super lambda yield"
).split()

_NUMERICS = "0 1 2 42 100 3.14 2.718 1,000 216.239.63.104 0xFF 1e9 99".split()

_NONASCII = ["Վիքիպեդիայի", "don't", "O'Reilly's", "naïve", "München", "日本語"]

LICENSE_HEADER = (
    "Licensed to the Apache Software Foundation ASF under one or more "
    "contributor license agreements See the NOTICE file distributed with "
    "this work for additional information regarding copyright ownership "
    "The ASF licenses this file to You under the Apache License Version "
    "2.0 the License you may not use this file except in compliance with "
    "the License"
)

_VOCAB_SIZE = 4000


def _identifiers(n: int) -> list[str]:
    out = []
    styles = [
        lambda i: f"var{i}",
        lambda i: f"getValue{i}",
        lambda i: f"do_thing_{i}",
        lambda i: f"CONSTANT_{i}",
        lambda i: f"handleRequest{i}",
        lambda i: f"parse_node_{i}",
        lambda i: f"MAX_BUFFER_{i}",
        lambda i: f"tmpVal{i}",
    ]
    for i in range(n):
        out.append(styles[i % len(styles)](i // len(styles)))
    return out


_IDENTS = _identifiers(_VOCAB_SIZE)
# Zipf-ish weights over the identifier vocab (rank^-1.1), pre-accumulated
# so random.choices is O(log V) per draw instead of O(V)
import itertools as _it

_IDENT_W = [1.0 / (r + 1) ** 1.1 for r in range(_VOCAB_SIZE)]
_IDENT_CUM = list(_it.accumulate(_IDENT_W))


def _doc_length(rng: random.Random) -> int:
    """1..20000 tokens, log-spread, mean a few hundred."""
    u = rng.random()
    if u < 0.05:
        return rng.randint(1, 10)  # tiny docs: norms below 39
    if u < 0.9:
        return rng.randint(20, 600)
    if u < 0.99:
        return rng.randint(600, 4000)
    return rng.randint(4000, 20000)


def make_key(i: int, seed: int = SEED) -> tuple[str, str, str]:
    """(repo, path, commit) of row i — cheap (no content generation), used
    to derive range-partition boundaries analytically for builds over the
    synthetic corpus (builder.build_index key_sample)."""
    ext, _ = _EXTS[i % len(_EXTS)]
    return (
        f"org{i % 7}/repo{i % 23}",
        f"src/dir{i % 13}/file_{i}.{ext}",
        hashlib.sha1(f"{seed}:{i}".encode()).hexdigest()[:12],
    )


def key_sample(n_docs: int, max_keys: int = 4096, seed: int = SEED) -> list[tuple[str, str, str]]:
    step = max(1, n_docs // max_keys)
    return [make_key(i, seed) for i in range(0, n_docs, step)]


def make_doc(i: int, seed: int = SEED) -> dict:
    rng = random.Random((seed << 32) ^ (i * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFF))
    _, lang = _EXTS[i % len(_EXTS)]
    repo, path, commit = make_key(i, seed)

    n_tokens = _doc_length(rng)
    parts: list[str] = []
    if rng.random() < 0.30:
        parts.append(LICENSE_HEADER)
        n_tokens = max(1, n_tokens - 60)
    # occasional pathological docs
    if i % 97 == 0:
        parts.append("x" * 300)  # must split 255+45
    if i % 131 == 0:
        parts.append(" ".join(rng.choices(_NONASCII, k=3)))

    # batch-draw token kinds and fills (all O(n log V))
    kinds = rng.choices("kinp", weights=[35, 45, 10, 10], k=n_tokens)
    n_k = kinds.count("k")
    n_i = kinds.count("i")
    n_n = kinds.count("n")
    n_p = kinds.count("p")
    kws = iter(rng.choices(_KEYWORDS, k=n_k + n_p))
    ids = iter(rng.choices(_IDENTS, cum_weights=_IDENT_CUM, k=n_i + n_p))
    nums = iter(rng.choices(_NUMERICS, k=n_n))
    styles = iter(rng.choices(range(3), k=n_p))
    body: list[str] = []
    for kind in kinds:
        if kind == "k":
            body.append(next(kws))
        elif kind == "i":
            body.append(next(ids))
        elif kind == "n":
            body.append(next(nums))
        else:
            a, b, style = next(ids), next(kws), next(styles)
            if style == 0:
                body.append(f"{a}({b}, baz);")
            elif style == 1:
                body.append(f"{a}.{b}:q")
            else:
                body.append(f"{a}[{b}]")
    parts.append(" ".join(body))
    return {
        "repo": repo,
        "path": path,
        "commit": commit,
        "lang": lang,
        "content": "\n".join(parts),
    }


def generate_corpus(n_docs: int, seed: int = SEED, start: int = 0) -> pd.DataFrame:
    """Rows [start, start+n_docs) of the deterministic corpus."""
    return pd.DataFrame([make_doc(i, seed) for i in range(start, start + n_docs)])


def corpus_spark_df(spark, n_docs: int, seed: int = SEED, partitions: int = 32):
    """Distributed deterministic generation: each partition materializes
    its own row range (function-of-index, so independent of scheduling)."""
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [
            StructField("repo", StringType()),
            StructField("path", StringType()),
            StructField("commit", StringType()),
            StructField("lang", StringType()),
            StructField("content", StringType()),
        ]
    )

    base = spark.range(0, n_docs, 1, partitions)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            yield pd.DataFrame([make_doc(int(i), seed) for i in ids])

    return base.mapInPandas(gen, schema=schema)
