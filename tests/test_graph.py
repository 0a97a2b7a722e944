"""PageRank + deterministic link-graph synthesis."""

import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.operators.graph import pagerank, synthetic_link_graph


def _nodes(spark, n):
    return spark.createDataFrame([(i,) for i in range(n)], ["id"])


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_cycle_is_uniform(spark):
    # a 3-cycle is rank-regular: every node holds exactly 1/3 at every
    # iteration, independent of damping
    nodes = _nodes(spark, 3)
    edges = _edges(spark, [(0, 1), (1, 2), (2, 0)])
    out = {r["id"]: r["rank"]
           for r in pagerank(nodes, edges, n_iter=4).collect()}
    for v in out.values():
        assert v == pytest.approx(1 / 3, abs=1e-12)


def test_total_rank_conserved_with_danglers(spark):
    # star into node 0, which dangles: redistribution keeps sum == 1
    nodes = _nodes(spark, 4)
    edges = _edges(spark, [(1, 0), (2, 0), (3, 0)])
    ranks = pagerank(nodes, edges, n_iter=6).collect()
    assert sum(r["rank"] for r in ranks) == pytest.approx(1.0, abs=1e-9)
    out = {r["id"]: r["rank"] for r in ranks}
    assert out[0] > out[1]              # the hub outranks the spokes
    assert out[1] == out[2] == out[3]   # symmetric spokes tie exactly


def test_deterministic_mode_matches_fast_mode(spark):
    docs = spark.range(40).select(F.col("id").alias("doc_id"))
    edges = synthetic_link_graph(docs, n=40)
    nodes = docs.select(F.col("doc_id").alias("id"))
    fast = {r["id"]: r["rank"]
            for r in pagerank(nodes, edges, n_iter=5).collect()}
    det = {r["id"]: r["rank"]
           for r in pagerank(nodes, edges, n_iter=5,
                             deterministic=True).collect()}
    assert fast.keys() == det.keys()
    for k in fast:
        assert fast[k] == pytest.approx(det[k], abs=1e-12)
    assert sum(det.values()) == pytest.approx(1.0, abs=1e-9)


def test_synthetic_graph_shape(spark):
    docs = spark.range(35).select(F.col("id").alias("doc_id"))
    edges = synthetic_link_graph(docs, n=35).collect()
    srcs = {e["src"] for e in edges}
    # multiples of 7 dangle
    assert srcs.isdisjoint({0, 7, 14, 21, 28})
    for e in edges:
        assert e["src"] != e["dst"]           # no self-loops
        assert 0 <= e["dst"] < 35
    # out-degree bounded by 1 + src % 3
    from collections import Counter
    deg = Counter(e["src"] for e in edges)
    for s, d in deg.items():
        assert d <= 1 + s % 3
    # deterministic: same edge set on a repartitioned input
    again = set((e["src"], e["dst"]) for e in
                synthetic_link_graph(docs.repartition(7), n=35).collect())
    assert again == {(e["src"], e["dst"]) for e in edges}


def test_no_cartesian_product_in_plan(spark):
    # the 1-row dangling-mass scalar joins back as a broadcast nested
    # loop; a CartesianProduct anywhere means the rank join broke
    docs = spark.range(30).select(F.col("id").alias("doc_id"))
    edges = synthetic_link_graph(docs, n=30)
    pr = pagerank(docs.select(F.col("doc_id").alias("id")), edges,
                  n_iter=2, checkpoint_every=0)
    plan = pr._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_n_iter_validation(spark):
    nodes = _nodes(spark, 2)
    edges = _edges(spark, [(0, 1)])
    with pytest.raises(ValueError):
        pagerank(nodes, edges, n_iter=0)
