"""Plan-shape assertions: the plans we WANT, kept under test so a
regression in pushdown/broadcast/shuffle-count fails here, not at 100 TB."""

import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.plans.inspect import (count_exchanges,
                                             has_broadcast_join,
                                             physical_plan, pushed_filters,
                                             read_schema)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as em

    return em.queries()


def test_scan_filter_pushdown(spark, queries):
    df = queries["scan_filter_project"](spark, SF_DIR)
    filters = " ".join(pushed_filters(df))
    assert "l_discount" in filters or "l_shipdate" in filters, filters
    # column pruning: only the needed lineitem columns are read
    schemas = read_schema(df)
    assert any("l_extendedprice" in s and "l_quantity" not in s for s in schemas), schemas


def test_q3_broadcasts_dimension(spark, queries):
    df = queries["orders_topk_metrics"](spark, SF_DIR)
    assert has_broadcast_join(df)


def test_q5_broadcasts_both_dims(spark, queries):
    df = queries["q5_nation_revenue"](spark, SF_DIR)
    plan = physical_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_q1_partial_aggregation(spark, queries):
    df = queries["q1_pricing_summary"](spark, SF_DIR)
    plan = physical_plan(df)
    # map-side combine: two HashAggregates around one exchange
    assert plan.count("HashAggregate") >= 2
    assert count_exchanges(df) == 1, plan


def test_extraction_reads_two_columns_only(spark, fixture_tables):
    from khl_pdf_ocr_spark.operators.extract import extract_documents

    docs_path, _ = fixture_tables
    df = extract_documents(spark.read.parquet(docs_path))
    assert read_schema(df) == ["url:string,html:binary"]
    assert count_exchanges(df) == 0  # default path: no payload shuffle


def test_masters_join_never_shuffles_fact_side(spark, fixture_tables):
    from khl_pdf_ocr_spark.operators.extract import extract_documents
    from khl_pdf_ocr_spark.sources.masters import (load_masters,
                                                   validate_referee_names)

    docs_path, _ = fixture_tables
    out = extract_documents(spark.read.parquet(docs_path))
    _, refs = load_masters(spark)
    validated = validate_referee_names(out, refs)
    plan = physical_plan(validated)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_exact_dedup_single_exchange(spark):
    from khl_pdf_ocr_spark.operators.dedup import exact_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert count_exchanges(exact_dedup(docs)) == 1


def test_cosine_topk_whole_stage_codegen(spark):
    from khl_pdf_ocr_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    df = cosine_topk(emb, [0.1] * 64, k=5)
    plan = physical_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, \
        "similarity math must stay JVM-side"


def test_dedup_plans_never_go_quadratic(spark):
    """The banded self-joins must plan as hash joins on the band key —
    a CartesianProduct / broadcast nested loop in any of these plans is
    the 100 TB quadratic failure mode."""
    from khl_pdf_ocr_spark.operators.dedup import (minhash_lsh_pairs,
                                                   ngram_jaccard_pairs,
                                                   simhash_pairs)

    docs = spark.createDataFrame(
        [(i, f"some text body number {i} with shared words", "s")
         for i in range(8)], ["doc_id", "text", "source"])
    for df in (minhash_lsh_pairs(docs), simhash_pairs(docs),
               ngram_jaccard_pairs(docs, max_block=5)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan


def test_crawl_day_partition_pruning(spark, tmp_path):
    """DEPLOY.md's incremental-crawl story in code: a corpus laid out
    by crawl day + a day filter must prune at the PARTITION level (the
    scan never touches other days' files) — the parquet twin of
    Iceberg `days(warc_ts)` partitioning."""
    from khl_pdf_ocr_spark.plans.inspect import partition_filters
    from khl_pdf_ocr_spark.sources.readers import write_output

    docs = spark.createDataFrame(
        [(f"https://ex.com/{d}/{i}", f"2024-03-0{d}", f"text {d}-{i}")
         for d in (1, 2, 3) for i in range(20)],
        ["url", "crawl_day", "text"])
    path = str(tmp_path / "by_day")
    write_output(docs, path, partition_by=("crawl_day",))

    scan = spark.read.parquet(path).filter(F.col("crawl_day") == "2024-03-02")
    pf = partition_filters(scan)
    assert pf and "crawl_day" in pf[0], f"no partition pruning: {pf}"
    assert scan.count() == 20
    # rows from other days are not merely filtered late — the pushed
    # partition filter means their files never enter the scan (the
    # same PartitionFilters evidence the ANN index tests assert);
    # inputFiles() can't witness this (it lists the pre-pruning
    # relation), so the plan string is the proof
    from khl_pdf_ocr_spark.plans.inspect import physical_plan

    assert "PartitionFilters: []" not in physical_plan(scan)


def test_embedding_guard_plan_never_goes_quadratic(spark):
    """The guarded embedding near-dup plan (all-pairs small blocks +
    LSH-routed big blocks) must stay equi-join everywhere."""
    from khl_pdf_ocr_spark.operators.similarity import embedding_near_dup_pairs

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0, 0.0], i % 2) for i in range(8)],
        ["vec_id", "embedding", "label"])
    df = embedding_near_dup_pairs(emb, threshold=0.9, max_block=3, dim=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_asof_enrich_plan_no_cartesian_no_global_sort(spark, queries):
    """The keyed as-of driver query: parallel window on user_id,
    never a cross/nested-loop join, never a single-partition sort."""
    df = queries["events_asof_enrich"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "SinglePartition" not in plan, plan


def test_in_intervals_plan_equi_join_only(spark, queries):
    """The range-join driver query stays a bin-bucketed equi-join —
    the θ-predicate never degrades to a cartesian plan."""
    df = queries["events_in_intervals"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_canonical_urls_all_jvm(spark, queries):
    """URL canonicalization compiles to pure JVM expressions — no
    Python worker in the plan (single whole-stage-codegen projection
    over the scan)."""
    df = queries["doc_canonical_urls"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                   "PythonMapInArrow"):
        assert marker not in plan, plan
