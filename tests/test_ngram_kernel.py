"""r6 ngram-verify kernel: the numpy co-occurrence block kernel must be
output-IDENTICAL to the JVM self-join form it replaces for small blocks
(``kernel_max_block=None`` re-enables the pure JVM path, which stays in
the module as the parity oracle and the mid-size-block engine)."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.operators.dedup import (_block_intersections,
                                               ngram_jaccard_pairs)


def _brute(sets):
    out = {}
    ss = [set(int(x) for x in a) for a in sets]
    for i in range(len(ss)):
        for j in range(i + 1, len(ss)):
            c = len(ss[i] & ss[j])
            if c:
                out[(i, j)] = c
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_block_intersections_fuzz(seed):
    rng = random.Random(seed)
    for trial in range(25):
        k = rng.randint(0, 40)
        vocab = rng.randint(1, 30)  # small vocab -> hot groups guaranteed
        sets = []
        for _ in range(k):
            m = rng.randint(0, 12)
            # duplicates on purpose: the kernel must dedup like
            # array_intersect's set semantics
            sets.append(np.array([rng.randrange(vocab) for _ in range(m)],
                                 dtype=np.int64))
        for hot_cut in (1, 2, 32):
            ia, jb, inter = _block_intersections(sets, hot_cut=hot_cut)
            got = {(int(i), int(j)): int(c)
                   for i, j, c in zip(ia, jb, inter)}
            assert got == _brute(sets), (trial, hot_cut, sets)
            assert all(i < j for i, j in got)


def test_block_intersections_bincount_branch():
    # a size class with > 2^16 emissions exercises the bincount path
    rng = random.Random(7)
    k = 80
    sets = [np.array(rng.sample(range(2000), 400), dtype=np.int64)
            for _ in range(k)]
    ia, jb, inter = _block_intersections(sets, hot_cut=4)
    got = {(int(i), int(j)): int(c) for i, j, c in zip(ia, jb, inter)}
    assert got == _brute(sets)


def _rows_multiset(df):
    return sorted((r["id_a"], r["id_b"], r["jaccard"]) for r in df.collect())


def _mk_corpus(rng, n_docs, n_blocks, with_nulls=False):
    words = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(n_docs):
        toks = [rng.choice(words) for _ in range(rng.randint(0, 30))]
        text = " ".join(toks)
        rows.append((i, text, f"b{rng.randrange(n_blocks)}"))
    # planted near-dup cluster inside one block
    rows.append((900, "alpha beta gamma delta epsilon zeta", "b0"))
    rows.append((901, "alpha beta gamma delta epsilon zeta", "b0"))
    rows.append((902, "alpha beta gamma delta epsilon eta", "b0"))
    if with_nulls:
        # NULL text normalizes to the {""} shingle set (legacy
        # size(NULL) = -1 + concat_ws over an all-NULL slice), so it
        # pairs with empty-text docs at jaccard 1.0 — pinned explicitly
        rows.append((903, None, "b0"))
        rows.append((906, "", "b0"))            # NULL↔empty pair in b0
        rows.append((None, "alpha beta gamma delta epsilon zeta", "b0"))
        rows.append((904, "alpha beta gamma delta epsilon zeta", None))
        rows.append((905, "", "b1"))            # empty text is a real doc
        rows.append((905, "alpha beta gamma", "b1"))  # duplicate id: strict <
    return rows


@pytest.mark.parametrize("threshold", [0.05, 0.8])
def test_kernel_equals_jvm(spark, threshold):
    rng = random.Random(11)
    rows = _mk_corpus(rng, 120, 4, with_nulls=True)
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    kern = _rows_multiset(ngram_jaccard_pairs(df, threshold=threshold))
    jvm = _rows_multiset(ngram_jaccard_pairs(df, threshold=threshold,
                                             kernel_max_block=None))
    assert kern == jvm and len(kern) > 0
    assert (903, 906, 1.0) in kern   # NULL text ↔ empty text
    # bit-exact jaccard values, not approximate
    assert all(isinstance(j, float) for _, _, j in kern)


def test_mid_block_path_equals_default(spark):
    """kernel_max_block smaller than a block forces that block through
    the retained JVM join (the mid path) — output unchanged."""
    rng = random.Random(5)
    rows = _mk_corpus(rng, 60, 2)
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    full = _rows_multiset(ngram_jaccard_pairs(df, threshold=0.05))
    mid = _rows_multiset(ngram_jaccard_pairs(df, threshold=0.05,
                                             kernel_max_block=3))
    assert mid == full


def test_kernel_tokenize_parity_whitespace_edges(spark):
    """The kernel splits JVM-normalized text on a single space; Java's
    ``\\s`` is ASCII, so NBSP stays INSIDE tokens, tabs/newlines were
    already collapsed by normalized_text, and punctuation was stripped.
    Pinned against the JVM form on the edge rows."""
    rows = [(1, "alpha beta gamma delta epsilon", "b"),   # NBSP in-token
            (2, "alpha beta gamma delta epsilon", "b"),
            (3, "alpha beta\tgamma\ndelta  epsilon", "b"),     # \s collapsed
            (4, "  alpha beta gamma delta epsilon.  ", "b"),   # trim + punct
            (5, "alpha beta gamma delta epsilon", "b"),
            (6, "one", "b"), (7, "one", "b"),                  # m < n shingle
            (8, "two tok", "b"), (9, "two tok", "b")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    kern = _rows_multiset(ngram_jaccard_pairs(df, threshold=0.3))
    jvm = _rows_multiset(ngram_jaccard_pairs(df, threshold=0.3,
                                             kernel_max_block=None))
    assert kern == jvm
    pairs = {(a, b): j for a, b, j in kern}
    assert pairs[(1, 2)] == 1.0 and pairs[(6, 7)] == 1.0
    assert pairs[(8, 9)] == 1.0 and pairs[(3, 4)] == 1.0
    assert (1, 3) not in pairs   # NBSP token differs from space token


def test_shingle_stream_signatures_equal_hof_twin(spark):
    """r6 change #14: minhash_signatures now builds its shingle stream
    from codegen primitives (shifted-slice arrays_zip + posexplode +
    concat_ws) instead of exploding the interpreted HOF shingle array.
    Signature VALUES must be bit-identical to the per-row HOF twin
    with_minhash_signature (which still evaluates the original
    transform-based pipeline) — incl. NULL text, empty text, sub-n
    docs, duplicate-heavy text, and unicode."""
    from khl_pdf_ocr_spark.operators.dedup import (minhash_signatures,
                                                   with_minhash_signature)
    rng = random.Random(3)
    words = ["alpha", "beta", "gamma", "δέλτα", "ёж", "x1"]
    rows = [(i, " ".join(rng.choice(words)
                         for _ in range(rng.randint(0, 25))))
            for i in range(60)]
    rows += [(100, None), (101, ""), (102, "one"), (103, "two tok"),
             (104, "dup dup dup dup dup"), (105, "  padded   text  ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    batch = {r["id"]: list(r["sig"])
             for r in minhash_signatures(df).collect()}
    perrow = {r["doc_id"]: list(r["sig"])
              for r in with_minhash_signature(df).collect()}
    assert set(batch) == set(perrow) == {r[0] for r in rows}
    assert batch == perrow


def test_kernel_string_ids_byte_order(spark):
    """id_a < id_b uses UTF8String byte order in the JVM; UTF-8 byte
    order equals code-point order, so the kernel's Python compare must
    agree — pinned on non-ASCII ids."""
    rows = [("яz", "alpha beta gamma delta", "b"),
            ("zé", "alpha beta gamma delta", "b"),
            ("Z", "alpha beta gamma delta", "b")]
    df = spark.createDataFrame(rows, "doc_id string, text string, source string")
    kern = _rows_multiset(ngram_jaccard_pairs(df, threshold=0.5))
    jvm = _rows_multiset(ngram_jaccard_pairs(df, threshold=0.5,
                                             kernel_max_block=None))
    assert kern == jvm and len(kern) == 3
