"""Exact repeated-substring (Lee et al. ExactSubstr) span dedup."""

import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.operators.substring import (_window_starts,
                                                   repeated_ngram_spans,
                                                   strip_repeated_spans)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_cross_doc_repeat_flagged_with_exact_positions(spark):
    # docs 1 and 2 share the 8-gram "a b c d e f g h" at offsets 0 / 1
    df = _docs(spark, [(1, "a b c d e f g h i j"),
                       (2, "x a b c d e f g h z"),
                       (3, "p q r s t u v w y")])
    out = {r["doc_id"]: r for r in repeated_ngram_spans(df, k=8).collect()}
    assert set(out) == {1, 2}
    assert (out[1]["span_start"], out[1]["span_end"]) == (0, 7)
    assert (out[2]["span_start"], out[2]["span_end"]) == (1, 8)
    assert out[1]["n_windows"] == 1


def test_within_doc_repeat_counts(spark):
    # the SAME 4-gram twice in one document (Lee et al.: within-doc
    # occurrences count toward the repeat threshold)
    df = _docs(spark, [(1, "a b c d QQ a b c d")])
    out = sorted(repeated_ngram_spans(df, k=4).collect(),
                 key=lambda r: r["span_start"])
    assert [(r["span_start"], r["span_end"]) for r in out] == [(0, 3), (5, 8)]


def test_overlapping_windows_merge_into_one_span(spark):
    # a 10-token shared region yields 3 overlapping 8-grams -> ONE span
    shared = "s0 s1 s2 s3 s4 s5 s6 s7 s8 s9"
    df = _docs(spark, [(1, f"{shared} u1 u2"),
                       (2, f"v1 v2 {shared}")])
    out = {r["doc_id"]: r for r in repeated_ngram_spans(df, k=8).collect()}
    assert (out[1]["span_start"], out[1]["span_end"]) == (0, 9)
    assert out[1]["n_windows"] == 3
    assert (out[2]["span_start"], out[2]["span_end"]) == (2, 11)


def test_distant_repeats_stay_separate_spans(spark):
    mid = " ".join(f"m{i}" for i in range(20))
    df = _docs(spark, [(1, f"a b c d {mid} a b c d"),
                       (2, "a b c d zz")])
    out = sorted(repeated_ngram_spans(df, k=4).collect(),
                 key=lambda r: (r["doc_id"], r["span_start"]))
    d1 = [(r["span_start"], r["span_end"]) for r in out if r["doc_id"] == 1]
    assert d1 == [(0, 3), (24, 27)]


def test_no_repeats_no_rows_and_short_docs_skipped(spark):
    df = _docs(spark, [(1, "a b c d e f g h"),
                       (2, "one two"),            # shorter than k
                       (3, None), (4, "   ")])    # null / blank
    assert repeated_ngram_spans(df, k=8).count() == 0


def test_strip_removes_exactly_covered_tokens(spark):
    df = _docs(spark, [(1, "a b c d e f g h i j"),
                       (2, "x a b c d e f g h z"),
                       (3, "p q r s t u v w y"),
                       (4, None)])
    out = {r["doc_id"]: r for r in
           strip_repeated_spans(df, k=8)
           .select("doc_id", "text_deduped", "n_tokens_removed").collect()}
    assert out[1]["text_deduped"] == "i j"
    assert out[1]["n_tokens_removed"] == 8
    assert out[2]["text_deduped"] == "x z"
    assert out[3]["text_deduped"] == "p q r s t u v w y"
    assert out[3]["n_tokens_removed"] == 0
    assert out[4]["text_deduped"] is None
    assert out[4]["n_tokens_removed"] == 0


def test_param_validation(spark):
    df = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        repeated_ngram_spans(df, k=0)
    with pytest.raises(ValueError):
        repeated_ngram_spans(df, min_count=1)


def test_generator_shape_no_window_materialization(spark):
    """The 100-TB shape assertion (the chunk_documents lesson, amended
    by r6 change #15): window enumeration must never materialize
    O(tokens × windows) bytes.  The r6 form posexplodes the BARE token
    array (a composite generator child is the measured 100×
    interpreted-Generate trap) and hashes the window in the SAME
    codegen stage, where the carried array is a per-input-row
    reference; the operator's output is (id, s, h) only and the whole
    pipeline holds zero Exchanges, so nothing wide ever serializes.
    """
    df = _docs(spark, [(1, "a b c d e f g h i j")])
    w = _window_starts(df, k=8, text_col="text", id_col="doc_id")
    plan = w._jdf.queryExecution().optimizedPlan().toString()
    gen_lines = [ln for ln in plan.splitlines() if "Generate" in ln]
    assert len(gen_lines) == 1
    gen = gen_lines[0]
    # bare-attribute generator: no per-index transform/slice machinery
    assert "posexplode(_toks" in gen, gen
    assert "transform(" not in gen and "slice(" not in gen, gen
    # the window string/hash is built above the generator, same stage
    assert "xxhash64(" in plan and "concat_ws(" in plan
    # output carries only (id, s, h); the array never leaves the stage
    assert [f.name for f in w.schema.fields] == ["doc_id", "s", "h"]
    phys = w._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in phys, phys


def test_long_doc_completes_quickly(spark):
    # 2 x 200k-token identical docs: every window repeated; the merge
    # must produce one full-document span per doc without materializing
    # O(tokens x windows) bytes (the naive carry would churn ~GBs here)
    n = 200_000
    doc = " ".join(f"t{i}" for i in range(n))
    df = _docs(spark, [(1, doc), (2, doc)])
    out = {r["doc_id"]: r for r in repeated_ngram_spans(df, k=8).collect()}
    assert (out[1]["span_start"], out[1]["span_end"]) == (0, n - 1)
    assert out[1]["n_windows"] == n - 7


def _empty_store(spark):
    return spark.createDataFrame([], "h long, n long")


def test_incremental_day_one_matches_batch_mode(spark):
    df = _docs(spark, [(1, "a b c d e f g h i j"),
                       (2, "x a b c d e f g h z")])
    from khl_pdf_ocr_spark.operators.substring import (
        repeated_spans_incremental)
    spans, new_w = repeated_spans_incremental(df, _empty_store(spark), k=8)
    batch = repeated_ngram_spans(df, k=8)
    assert (sorted(map(tuple, spans.collect()))
            == sorted(map(tuple, batch.collect())))
    # new_windows carries every batch window hash with its count
    total = {r["h"]: r["n"] for r in new_w.collect()}
    assert sum(total.values()) == 3 + 3   # 3 windows per 10-token doc
    assert max(total.values()) == 2       # the shared window


def test_incremental_cross_increment_repeat_flagged(spark):
    from khl_pdf_ocr_spark.operators.substring import (
        repeated_spans_incremental)
    day1 = _docs(spark, [(1, "boiler plate text repeats q r s t u v")])
    _, w1 = repeated_spans_incremental(day1, _empty_store(spark), k=4)
    # day 2: doc 10 reuses day-1 text (seen ONCE in history -> total 2);
    # doc 11 is novel
    day2 = _docs(spark, [(10, "zz boiler plate text repeats yy"),
                         (11, "totally novel words here now")])
    spans, w2 = repeated_spans_incremental(day2, w1, k=4)
    out = spans.collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_id"], r["span_start"], r["span_end"]) == (10, 1, 4)
    # the store accumulates: appending w2 makes a day-3 single
    # occurrence of the same window total 3
    day3 = _docs(spark, [(20, "boiler plate text repeats")])
    spans3, _ = repeated_spans_incremental(
        day3, w1.unionByName(w2), k=4, min_count=3)
    assert spans3.count() == 1


def test_incremental_within_batch_repeat_needs_no_history(spark):
    from khl_pdf_ocr_spark.operators.substring import (
        repeated_spans_incremental)
    day = _docs(spark, [(1, "m n o p q1 q2"), (2, "w m n o p q3")])
    spans, _ = repeated_spans_incremental(day, _empty_store(spark), k=4)
    assert {r["doc_id"] for r in spans.collect()} == {1, 2}
