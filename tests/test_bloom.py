"""Sharded Bloom membership store (operators/bloom.py)."""

import math

import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.operators.bloom import (bloom_dedup_incremental,
                                               bloom_geometry, bloom_probe,
                                               build_bloom_store,
                                               merge_bloom_stores)


def _fps(spark, ids, prefix="fp"):
    return spark.createDataFrame([(f"{prefix}-{i}",) for i in ids],
                                 ["fingerprint"])


def test_geometry_formulas():
    m, k = bloom_geometry(1000, 0.01)
    # textbook optimum: m ≈ 9.585 bits/item, k ≈ 7 at 1% fpp
    assert abs(m - 9.585 * 1000) < 16  # byte-rounded
    assert k == round(m / 1000 * math.log(2)) == 7
    with pytest.raises(ValueError):
        bloom_geometry(1000, 1.5)


def test_no_false_negatives(spark):
    inserted = _fps(spark, range(500))
    store = build_bloom_store(inserted, n_shards=8,
                              expected_per_shard=200, fpp=0.01)
    probed = bloom_probe(inserted, store)
    assert probed.filter(~F.col("probably_seen")).count() == 0


def test_fp_rate_bounded(spark):
    store = build_bloom_store(_fps(spark, range(4000)), n_shards=8,
                              expected_per_shard=600, fpp=0.01)
    novel = _fps(spark, range(4000), prefix="novel")
    n_fp = bloom_probe(novel, store).filter("probably_seen").count()
    # expect ~40 at 1%; deterministic hashing makes this a fixed number
    assert n_fp <= 4000 * 0.03, n_fp


def test_merge_is_union(spark):
    a = build_bloom_store(_fps(spark, range(0, 100)), n_shards=4,
                          expected_per_shard=100, fpp=0.001)
    b = build_bloom_store(_fps(spark, range(100, 200)), n_shards=4,
                          expected_per_shard=100, fpp=0.001)
    merged = merge_bloom_stores(a, b)
    both = _fps(spark, range(0, 200))
    assert bloom_probe(both, merged).filter(~F.col("probably_seen")).count() == 0
    # per-shard n_items accumulates
    tot = merged.agg(F.sum("n_items")).collect()[0][0]
    assert tot == 200


def test_or_reduce_many_deltas(spark):
    # the increment-delta shape: union N per-increment deltas, reduce
    # shard-wise in one pass; bits equal the pairwise-merge result
    from khl_pdf_ocr_spark.operators.bloom import or_reduce_bloom_stores

    kw = dict(n_shards=4, expected_per_shard=100, fpp=0.001)
    deltas = [build_bloom_store(_fps(spark, range(i * 40, (i + 1) * 40)),
                                **kw) for i in range(3)]
    unioned = deltas[0].unionByName(deltas[1]).unionByName(deltas[2])
    reduced = or_reduce_bloom_stores(unioned)
    pair = merge_bloom_stores(merge_bloom_stores(deltas[0], deltas[1]),
                              deltas[2])
    rb = {r["shard"]: bytes(r["bits"]) for r in reduced.collect()}
    pb = {r["shard"]: bytes(r["bits"]) for r in pair.collect()}
    assert rb == pb
    everything = _fps(spark, range(120))
    assert bloom_probe(everything, reduced).filter(
        ~F.col("probably_seen")).count() == 0


def test_merge_geometry_mismatch_fails_fast(spark):
    a = build_bloom_store(_fps(spark, range(10)), n_shards=4,
                          expected_per_shard=100, fpp=0.01)
    b = build_bloom_store(_fps(spark, range(10)), n_shards=8,
                          expected_per_shard=100, fpp=0.01)
    with pytest.raises(ValueError, match="geometry mismatch"):
        merge_bloom_stores(a, b).count()


def test_merge_with_empty_side_passes_through(spark):
    a = build_bloom_store(_fps(spark, range(10)), n_shards=4,
                          expected_per_shard=100, fpp=0.01)
    empty = a.limit(0)
    assert merge_bloom_stores(a, empty).count() == a.count()
    assert merge_bloom_stores(empty, a).count() == a.count()


def test_build_deterministic(spark):
    kw = dict(n_shards=4, expected_per_shard=100, fpp=0.01)
    a = {r["shard"]: bytes(r["bits"]) for r in
         build_bloom_store(_fps(spark, range(50)), **kw).collect()}
    b = {r["shard"]: bytes(r["bits"]) for r in
         build_bloom_store(_fps(spark, range(50)), **kw).collect()}
    assert a == b


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_incremental_two_day_e2e(spark):
    kw = dict(n_shards=4, expected_per_shard=200, fpp=0.001)
    day1 = _docs(spark, [(1, "alpha beta"), (2, "gamma delta"),
                         (3, "alpha beta"),   # in-batch dup of 1
                         (4, None)])          # NULL passes through
    kept1, store1, ledger1 = bloom_dedup_incremental(day1, None, **kw)
    assert sorted(r["doc_id"] for r in kept1.collect()) == [1, 2, 4]
    led1 = {r["id"]: r["reject_reason"] for r in ledger1.collect()}
    assert led1 == {3: "exact_dup_batch"}
    store1 = store1.localCheckpoint()  # what increment_cli would persist

    day2 = _docs(spark, [(10, "alpha beta"),    # history dup
                         (11, "epsilon zeta"),  # novel
                         (12, None)])           # NULL never store-checked
    kept2, store2, ledger2 = bloom_dedup_incremental(day2, store1, **kw)
    assert sorted(r["doc_id"] for r in kept2.collect()) == [11, 12]
    led2 = {r["id"]: r["reject_reason"] for r in ledger2.collect()}
    assert led2 == {10: "bloom_probable_dup"}
    # day-3 probe: day-2 survivor now rejected, store geometry inherited
    day3 = _docs(spark, [(20, "epsilon zeta")])
    _, _, ledger3 = bloom_dedup_incremental(
        day3, store2.localCheckpoint(), **kw)
    assert [r["reject_reason"] for r in ledger3.collect()] == \
        ["bloom_probable_dup"]


def test_incremental_matches_exact_twin_here(spark):
    # at fpp=0.001 on this tiny corpus the deterministic FP set is
    # empty, so the Bloom policy reproduces the exact ledger's kept set
    from khl_pdf_ocr_spark.operators.dedup import exact_dedup_incremental

    hist = _docs(spark, [(i, f"history doc {i}") for i in range(50)])
    batch = _docs(spark, [(100 + i, f"history doc {i}") for i in range(25)]
                  + [(200 + i, f"fresh doc {i}") for i in range(25)])
    _, store, _ = bloom_dedup_incremental(hist, None, n_shards=4,
                                          expected_per_shard=100, fpp=0.001)
    kept_b, _, _ = bloom_dedup_incremental(batch, store.localCheckpoint(),
                                           n_shards=4,
                                           expected_per_shard=100, fpp=0.001)
    from khl_pdf_ocr_spark.functions import text as X
    seen_fp = hist.select(X.fingerprint(F.col("text")).alias("fingerprint"))
    kept_e, _, _ = exact_dedup_incremental(batch, seen_fp)
    assert sorted(r["doc_id"] for r in kept_b.collect()) == \
        sorted(r["doc_id"] for r in kept_e.collect())


def test_probe_never_moves_text(spark):
    # the probe projection is (fp, shard, positions): the cogroup's
    # Python stage sees only those three columns — document text joins
    # back AFTER the flags come out
    docs = _docs(spark, [(i, f"text {i}") for i in range(20)])
    fp = docs.withColumn("fingerprint", F.md5("text"))
    store = build_bloom_store(fp.select("fingerprint"), n_shards=4,
                              expected_per_shard=100, fpp=0.01)
    out = bloom_probe(fp, store)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan
    import re
    cg = re.search(r"FlatMapCoGroupsInPandas[^\n]*", plan).group(0)
    assert "text" not in cg and "doc_id" not in cg, cg
    assert out.count() == 20
    assert out.filter(~F.col("probably_seen")).count() == 0


def test_probe_null_fingerprint_is_false_not_null(spark):
    store = build_bloom_store(_fps(spark, range(10)), n_shards=4,
                              expected_per_shard=100, fpp=0.01)
    df = spark.createDataFrame([("fp-1",), (None,)],
                               "fingerprint string")
    out = {r["fingerprint"]: r["probably_seen"]
           for r in bloom_probe(df, store).collect()}
    assert out["fp-1"] is True
    assert out[None] is False          # exact: NULL is never inserted


def test_multi_row_shard_fails_fast(spark):
    # a raw increment_id-partitioned multi-delta layout read back as
    # one frame must not silently drop memberships
    import pytest as _pt

    kw = dict(n_shards=2, expected_per_shard=100, fpp=0.01)
    d1 = build_bloom_store(_fps(spark, range(20)), **kw)
    d2 = build_bloom_store(_fps(spark, range(20, 40)), **kw)
    raw = d1.unionByName(d2)           # 2 rows per shard
    with _pt.raises(Exception, match="or_reduce_bloom_stores"):
        bloom_probe(_fps(spark, range(5)), raw).collect()
    with _pt.raises(Exception, match="or_reduce_bloom_stores"):
        merge_bloom_stores(raw, d1).collect()
    # the documented reduction path works on the same layout
    from khl_pdf_ocr_spark.operators.bloom import or_reduce_bloom_stores
    ok = or_reduce_bloom_stores(raw)
    assert bloom_probe(_fps(spark, range(40)), ok).filter(
        ~F.col("probably_seen")).count() == 0


def test_null_fingerprints_never_inserted(spark):
    # ADVICE r5: raw NULL fingerprints collide onto one seed-derived
    # synthetic key at build time while probe treats NULL as unseen —
    # the build must skip them so the store carries no phantom
    # membership.
    with_nulls = spark.createDataFrame(
        [("fp-1",), (None,), ("fp-2",), (None,)], ["fingerprint"])
    kw = dict(n_shards=4, expected_per_shard=16, fpp=0.01)
    store = build_bloom_store(with_nulls, **kw)
    clean = build_bloom_store(with_nulls.filter("fingerprint IS NOT NULL"),
                              **kw)
    a = {r["shard"]: (r["bits"], r["n_items"]) for r in store.collect()}
    b = {r["shard"]: (r["bits"], r["n_items"]) for r in clean.collect()}
    assert a == b          # identical bitsets AND item counts
    # probe with NULLs: NULL rows answer False, real rows still hit
    probed = {r["fingerprint"]: r["probably_seen"]
              for r in bloom_probe(with_nulls, store).collect()}
    assert probed["fp-1"] and probed["fp-2"]
    assert probed[None] is False


def test_merge_explicit_geometry_validated_per_row(spark):
    # ADVICE r5: with an explicit geometry kwarg the discovery collects
    # are skipped — rows whose geometry differs from the supplied one
    # must fail the merge instead of OR-ing silently (equal m,
    # different k corrupts membership semantics).
    a = build_bloom_store(_fps(spark, range(32)), n_shards=4,
                          expected_per_shard=64, fpp=0.01)
    b = build_bloom_store(_fps(spark, range(32, 64)), n_shards=4,
                          expected_per_shard=64, fpp=0.01)
    geo = (a.select("m", "k", "n_shards").first())
    good = merge_bloom_stores(a, b, geometry=(geo["m"], geo["k"],
                                              geo["n_shards"]))
    assert good.count() == 4
    with pytest.raises(Exception, match="geometry"):
        merge_bloom_stores(a, b, geometry=(geo["m"], geo["k"] + 1,
                                           geo["n_shards"])).collect()
