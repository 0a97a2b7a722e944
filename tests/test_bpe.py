"""BPE tokenizer training (operators/bpe.py): the Sennrich reference
example, determinism, the cap audit, and the Spark encode path."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.operators.bpe import (END, bpe_segment, encode_word,
                                             train_bpe,
                                             word_frequency_table)

# the worked example from Sennrich et al. 2016 §3.2
SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_sennrich_reference_merges():
    merges, audit = train_bpe(SENNRICH, n_merges=6, min_pair_count=1)
    # hand-traced rounds (word-final </w> fused onto the last char):
    # 1 ('e','s') 9 [newest 6 + widest 3]; 2 ('es','t</w>') 9;
    # 3 ('l','o') 7 [low 5 + lower 2]; 4 ('e','w') 6 [newest] — NOT
    #   ('lo','w'): "low" is now (lo, w</w>) so that pair counts only
    #   lower's 2, and ('lo','w</w>') counts 5 < 6;
    # 5 tie at 6 between ('n','ew') and ('ew','est</w>') → lexicographic
    #   tie-break picks ('ew','est</w>'); 6 ('n','ewest</w>') 6.
    assert merges == [("e", "s"), ("es", "t" + END), ("l", "o"),
                      ("e", "w"), ("ew", "est" + END),
                      ("n", "ewest" + END)]
    assert audit["n_merges"] == 6
    assert audit["coverage"] == 1.0
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("lowest", ranks) == ["lo", "w", "est" + END]
    assert encode_word("low", ranks) == ["lo", "w" + END]  # 'w</w>' != 'w'
    assert encode_word("newest", ranks) == ["newest" + END]  # merge 6 applies
    assert encode_word("widest", ranks) == ["w", "i", "d", "est" + END]


def test_training_is_input_order_insensitive():
    import random

    shuffled = SENNRICH[:]
    random.Random(3).shuffle(shuffled)
    assert train_bpe(shuffled, n_merges=10, min_pair_count=1)[0] \
        == train_bpe(SENNRICH, n_merges=10, min_pair_count=1)[0]


def test_min_pair_count_stops_early():
    merges, audit = train_bpe([("ab", 1), ("cd", 1)], n_merges=50,
                              min_pair_count=2)
    assert merges == [] and audit["n_merges"] == 0


def test_max_words_cap_is_audited():
    merges, audit = train_bpe(SENNRICH, n_merges=2, min_pair_count=1,
                              max_words=2)
    # kept: newest (6) + low (5) of 16 total occurrences
    assert audit["n_words"] == 2
    assert audit["coverage"] == pytest.approx(11 / 16)


def test_encode_roundtrip_property():
    merges, _ = train_bpe(SENNRICH, n_merges=10, min_pair_count=1)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["low", "lower", "newest", "widest", "lowest", "news",
              "wide", "zzz", "a"]:
        pieces = encode_word(w, ranks, cache={})
        assert "".join(pieces) == w + END     # lossless segmentation
        assert pieces[-1].endswith(END)


def test_word_frequency_table_matches_duckdb(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {r["word"]: r["n"] for r in word_frequency_table(docs).collect()}
    want = {w: n for w, n in duckdb.sql("""
        SELECT word, count(*) AS n FROM (
          SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))
                 AS word
          FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
          WHERE text IS NOT NULL)
        WHERE length(word) > 0 GROUP BY word
    """).fetchall()}
    # the synthetic corpus has a deliberately small vocabulary (~31
    # distinct words at sf0.001) — the equality is the oracle
    assert got == want and len(got) > 20


def test_bpe_segment_matches_driver_encode(spark):
    """The Spark Arrow path and the plain driver encode agree per doc —
    and pieces_per_word exposes the whitespace-undercount the packing
    stages care about."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .limit(60)
    wf = word_frequency_table(docs)
    merges, audit = train_bpe(wf, n_merges=200)
    assert audit["coverage"] == 1.0           # no cap at this scale
    out = {r["doc_id"]: r for r in
           bpe_segment(docs, merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    cache: dict = {}
    for r in docs.select("doc_id", "text").collect():
        toks = (r["text"] or "").lower().split()
        want_pieces = sum(len(encode_word(w, ranks, cache)) for w in toks)
        row = out[r["doc_id"]]
        assert row["n_words"] == len(toks)
        assert row["n_pieces"] == want_pieces
        if toks:
            assert row["pieces_per_word"] >= 1.0
        else:
            assert row["pieces_per_word"] is None
    assert len(out) == 60
