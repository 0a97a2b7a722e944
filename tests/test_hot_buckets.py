"""Hot-bucket bounds for banded LSH joins + the ngram big-block guard.

The scale failure these prevent: k documents sharing a band bucket (or
one oversized blocking key) produce k(k-1)/2 candidates in ONE shuffle
partition — quadratic work from a single hot key at 100 TB.
"""

from __future__ import annotations

import pytest

from khl_pdf_ocr_spark.operators.dedup import (CHAIN_WINDOW, hot_band_buckets,
                                               minhash_lsh_pairs,
                                               ngram_jaccard_pairs,
                                               simhash_pairs)

N_CLUMP = 300  # > DEFAULT_MAX_BUCKET=256 → the chain bound must engage

# windowed chain over k id-sorted members: sum_{d=1..W} (k-d) pairs
N_CHAIN = CHAIN_WINDOW * N_CLUMP - CHAIN_WINDOW * (CHAIN_WINDOW + 1) // 2


@pytest.fixture(scope="module")
def clumped_docs(spark):
    """300 byte-identical docs (one giant LSH bucket) + 3 distinct."""
    boiler = "the same boilerplate footer text repeated on every single page " * 4
    rows = [(i, boiler, "hot") for i in range(N_CLUMP)]
    rows += [(1000, "a completely different document about gardening tools", "cold"),
             (1001, "a completely different document about gardening implements", "cold"),
             (1002, "unrelated text regarding astronomy and telescopes", "cold")]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"]).repartition(8)


def test_minhash_hot_bucket_is_chain_bounded(clumped_docs):
    audit: dict = {}
    pairs = minhash_lsh_pairs(clumped_docs, verify_threshold=0.9,
                              audit=audit).collect()
    clump = [(r["id_a"], r["id_b"]) for r in pairs
             if r["id_a"] < N_CLUMP and r["id_b"] < N_CLUMP]
    # all-pairs would be C(300,2) = 44_850; the chain bound emits the
    # windowed chain (each member + its CHAIN_WINDOW predecessors)
    assert len(clump) == N_CHAIN
    assert all(r["jaccard"] == 1.0 for r in pairs if r["id_a"] < N_CLUMP)
    # connected-component property: every clump member still linked
    # (adjacent members verify pairwise here — identical docs)
    linked = {i for p in clump for i in p}
    assert linked == set(range(N_CLUMP))
    # no-silent-caps: the audit hook exposes what was chain-bounded
    hot = audit["hot_buckets"].collect()
    assert hot and all(r["bucket_size"] == N_CLUMP for r in hot)


def test_minhash_unbounded_mode_still_available(clumped_docs):
    # tiny subset → explicit max_bucket=None gives the full pair set
    sub = clumped_docs.filter("doc_id < 5 or doc_id >= 1000")
    pairs = minhash_lsh_pairs(sub, verify_threshold=0.9, max_bucket=None).collect()
    clump = [(r["id_a"], r["id_b"]) for r in pairs if r["id_a"] < 5]
    assert len(clump) == 5 * 4 // 2  # all C(5,2) pairs


def test_hot_band_buckets_audit(clumped_docs):
    from khl_pdf_ocr_spark.operators.dedup import minhash_signatures
    from pyspark.sql import functions as F

    sigs = minhash_signatures(clumped_docs)
    banded = sigs.select(
        "id", F.lit(0).alias("band"), F.xxhash64(F.col("sig")[0]).alias("bh"))
    hot = hot_band_buckets(banded).collect()
    assert len(hot) >= 1
    assert all(r["bucket_size"] >= N_CLUMP for r in hot)


def test_simhash_hot_bucket_is_chain_bounded(clumped_docs):
    pairs = simhash_pairs(clumped_docs, max_hamming=3).collect()
    clump = [(r["id_a"], r["id_b"]) for r in pairs
             if r["id_a"] < N_CLUMP and r["id_b"] < N_CLUMP]
    assert len(clump) == N_CHAIN  # windowed chain, not C(300,2)
    assert all(r["hamming"] == 0 for r in pairs if r["id_a"] < N_CLUMP)


def test_simhash_chain_orders_by_simhash(spark):
    """Heterogeneous hot bucket: the chain sorts by the sketch value, so
    a hamming-close planted pair with far-apart ids is still adjacent
    and survives — an id-ordered chain would interleave the noise docs
    between them and (usually) miss the pair."""
    from pyspark.sql import functions as F

    from khl_pdf_ocr_spark.operators.dedup import _band_candidates

    # one bucket; simhash values: pair (0, 999) differ in 1 bit; the
    # rest are spread far away.  ids interleave the pair to the extremes.
    rows = [(0, 1 << 40), (999, (1 << 40) | 1)]
    rows += [(i, (1 << 50) + i * 7919) for i in range(1, 11)]
    banded = spark.createDataFrame(
        [(i, 0, 0, s) for i, s in rows], ["id", "band", "bh", "simhash"])
    cand = _band_candidates(banded, extra=("simhash",), max_bucket=4,
                            chain_order="simhash")
    got = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    assert (0, 999) in got  # adjacent in simhash order despite id gap
    ham = F.bit_count(F.col("simhash_a").bitwiseXOR(F.col("simhash_b")))
    close = cand.withColumn("h", ham).filter("h <= 3").collect()
    assert {(r["id_a"], r["id_b"]) for r in close} == {(0, 999)}


def test_ngram_big_block_routes_through_lsh(spark):
    """A block above max_block goes through MinHash-LSH with identical
    verification; on a fixture where banding recall is 1 the output
    equals the exact all-pairs result."""
    texts = [f"document number {i} about completely distinct subject matter "
             f"with unique content token{i} filler words everywhere" for i in range(8)]
    texts[6] = texts[5]  # planted exact near-dup inside the big block
    rows = [(i, texts[i], "bigblock") for i in range(8)]
    rows += [(100, "tiny block doc one about fishing rods and reels", "small"),
             (101, "tiny block doc one about fishing rods and reels", "small")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])

    exact = {(r["id_a"], r["id_b"], r["jaccard"]) for r in
             ngram_jaccard_pairs(df, threshold=0.8, max_block=None).collect()}
    guarded = {(r["id_a"], r["id_b"], r["jaccard"]) for r in
               ngram_jaccard_pairs(df, threshold=0.8, max_block=5).collect()}
    assert (5, 6, 1.0) in exact and (100, 101, 1.0) in exact
    assert guarded == exact
    # no cross-block pairs leaked through the LSH fallback
    assert not any(a < 100 <= b for a, b, _ in guarded)


def test_audit_banded_frame_is_persisted(clumped_docs):
    """Counting the hot-bucket audit AFTER the pairs are materialized
    must reuse the persisted banded signatures, not re-run the whole
    signature lineage (r3 ADVICE: clean_cli's post-write stats count
    nearly doubled job cost)."""
    audit: dict = {}
    pairs = minhash_lsh_pairs(clumped_docs, verify_threshold=0.9, audit=audit)
    cached = audit["persisted"]
    assert len(cached) == 1
    assert cached[0].storageLevel.useMemory or cached[0].storageLevel.useDisk
    pairs.count()                       # materialize → populates the cache
    assert audit["hot_buckets"].count() > 0   # served from the cache
    for frame in cached:
        frame.unpersist()
