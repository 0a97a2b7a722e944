"""BM25 retrieval (operators/retrieval.py): full DuckDB relational
recomputation oracle (deterministic fold), an independent pure-Python
model, top-k tie-break determinism, repartition stability, validation,
and plan shape (no cartesian, broadcast stats/df joins)."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.operators.retrieval import bm25_scores, bm25_topk

TERMS = ["fox", "dog", "rocket"]
K1, B = 1.2, 0.75

DOCS = [
    (0, "The quick brown fox jumps over the lazy dog."),
    (1, "A fox! A fox! My kingdom for a fox."),
    (2, "Rocket science is not about dogs or foxes at all."),
    (3, "dog dog dog dog dog"),
    (4, "Nothing relevant here, just words and more words."),
    (5, None),
    (6, ""),
    (7, "...!!!???"),                       # tokenizes to empty
    (8, "rocket Rocket ROCKET launch rocket"),
    (9, "the fox and the dog shared a rocket"),
    (10, "fox"),                            # shortest matching doc
    (11, "a b c d e f g h i j k l m n o p q r s t u v w x y z " * 4),
]


def py_bm25(rows, terms, k1=K1, b=B):
    """Independent model: pure-Python BM25 over the same tokenizer."""
    toks = {i: [t for t in re.split("[^a-z0-9]+", (x or "").lower()) if t]
            for i, x in rows}
    toks = {i: ts for i, ts in toks.items() if ts}
    n = len(toks)
    avgdl = sum(len(ts) for ts in toks.values()) / n
    dfreq = {t: sum(1 for ts in toks.values() if t in ts) for t in terms}
    out = {}
    for i, ts in toks.items():
        s = 0.0
        for t in sorted(terms):             # the deterministic fold order
            tf = float(ts.count(t))
            if tf == 0:
                continue
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ts) / avgdl))
        if s != 0.0:
            out[i] = s
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_scores_match_python_model(spark, docs_df):
    got = {r["doc_id"]: r["score"]
           for r in bm25_scores(docs_df, TERMS, deterministic=True).collect()}
    want = py_bm25(DOCS, TERMS)
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], abs=1e-12), i


def test_scores_match_duckdb_oracle(spark, docs_df):
    """Full relational recomputation in DuckDB with the identical
    sorted-left-fold — the cross-engine gate (1e-9 for libm ln ulps)."""
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    con.register("docs", docs_df.toPandas())
    terms_sql = ", ".join(f"'{t}'" for t in TERMS)
    oracle = con.execute(f"""
        with base as (
          select doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') as toks
          from docs where text is not null
        ), base2 as (
          select doc_id, cast(len(toks) as double) as dl, toks
          from base where len(toks) > 0
        ), stats as (
          select cast(count(*) as double) as n, avg(dl) as avgdl from base2
        ), tf as (
          select doc_id, dl, term, cast(count(*) as double) as tf
          from base2, unnest(toks) as u(term)
          where term in ({terms_sql})
          group by 1, 2, 3
        ), dfreq as (
          select term, cast(count(*) as double) as df from tf group by 1
        ), contrib as (
          select doc_id, term,
                 ln(1 + (n - df + 0.5) / (df + 0.5))
                 * (tf * ({K1} + 1)) / (tf + {K1} * (1 - {B} + {B} * dl / avgdl))
                 as c
          from tf join dfreq using (term) cross join stats
        )
        select doc_id,
               list_reduce(list_prepend(0.0, list(c order by term)),
                           (a, x) -> a + x) as score
        from contrib group by doc_id
    """).fetchall()
    want = dict(oracle)
    got = {r["doc_id"]: r["score"]
           for r in bm25_scores(docs_df, TERMS, deterministic=True).collect()}
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], abs=1e-9), i


def test_default_and_deterministic_paths_agree(spark, docs_df):
    det = {r["doc_id"]: r["score"]
           for r in bm25_scores(docs_df, TERMS, deterministic=True).collect()}
    fast = {r["doc_id"]: r["score"]
            for r in bm25_scores(docs_df, TERMS).collect()}
    assert set(det) == set(fast)
    for i in det:
        assert fast[i] == pytest.approx(det[i], rel=1e-12)


def test_topk_order_and_tiebreak(spark):
    # two byte-identical docs force a score tie → id ascending decides
    rows = [(7, "fox fox dog"), (3, "fox fox dog"), (5, "fox"),
            (1, "unrelated words entirely"), (9, "dog")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = bm25_topk(df, ["fox", "dog"], k=3).collect()
    assert [r["doc_id"] for r in top][:2] == [3, 7]     # tie → min id first
    assert top[0]["score"] == top[1]["score"]
    assert len(top) == 3


def test_nonmatching_docs_absent(spark, docs_df):
    ids = {r["doc_id"] for r in bm25_scores(docs_df, TERMS).collect()}
    assert 4 not in ids and 5 not in ids and 11 not in ids


def test_repartition_stability(spark, docs_df):
    a = sorted(bm25_scores(docs_df, TERMS, deterministic=True).collect())
    b = sorted(bm25_scores(docs_df.repartition(13), TERMS,
                           deterministic=True).collect())
    assert a == b


def test_validation_errors(spark, docs_df):
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(docs_df, [])
    with pytest.raises(ValueError, match="normalized token"):
        bm25_scores(docs_df, ["Fox"])
    with pytest.raises(ValueError, match="normalized token"):
        bm25_scores(docs_df, ["two words"])
    with pytest.raises(ValueError, match="positive"):
        bm25_topk(docs_df, TERMS, k=0)


def test_plan_no_cartesian_and_broadcast_joins(spark, docs_df):
    plan = bm25_topk(docs_df, TERMS, k=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan          # dfreq joins broadcast
    assert "TakeOrderedAndProject" in plan      # top-k, not a global sort
