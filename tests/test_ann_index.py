"""Persisted ANN indexes: build-once, partition-pruned query paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.operators.ann_index import (build_ivf_index,
                                                   build_lsh_index,
                                                   ivf_index_topk,
                                                   lsh_index_topk,
                                                   lsh_probes, nearest_cells,
                                                   seeded_kmeans)
from khl_pdf_ocr_spark.operators.similarity import cosine_topk, hyperplanes
from khl_pdf_ocr_spark.plans.inspect import partition_filters

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB)


@pytest.fixture(scope="module")
def qvec(emb):
    row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    return [float(v) for v in row["embedding"]]


@pytest.fixture(scope="module")
def lsh_dir(emb, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("lshidx"))
    build_lsh_index(emb, d, dim=64, nbits=6, seed=42)
    return d


@pytest.fixture(scope="module")
def ivf_dir(spark, emb, tmp_path_factory):
    import duckdb

    vecs = duckdb.sql(f"SELECT embedding FROM read_parquet('{EMB}') "
                      "ORDER BY vec_id").fetchall()
    cents = seeded_kmeans([list(v[0]) for v in vecs], k=8, seed=42)
    d = str(tmp_path_factory.mktemp("ivfidx"))
    build_ivf_index(emb, d, centroids=cents)
    return d


def test_lsh_index_query_prunes_partitions(spark, lsh_dir, qvec):
    out = lsh_index_topk(spark, lsh_dir, qvec, k=5)
    pf = partition_filters(out)
    assert pf and "lsh_bucket" in pf[0], f"no partition pruning in plan: {pf}"
    rows = out.collect()
    assert rows and rows[0]["vec_id"] == 0 and rows[0]["cos_sim"] == 1.0


def test_lsh_index_reads_fewer_files_than_full_scan(spark, lsh_dir, qvec):
    import glob
    import os

    all_parts = len(glob.glob(os.path.join(lsh_dir, "data", "lsh_bucket=*")))
    with open(os.path.join(lsh_dir, "meta.json")) as f:
        import json
        meta = json.load(f)
    probes = set(lsh_probes(qvec, meta["planes"]))
    # multiprobe reads at most nbits+1 of the populated buckets
    assert len(probes) == meta["nbits"] + 1
    assert all_parts > len(probes) // 2  # index is genuinely spread out


def test_ivf_index_query_prunes_partitions(spark, ivf_dir, qvec):
    out = ivf_index_topk(spark, ivf_dir, qvec, k=5, nprobe=2)
    pf = partition_filters(out)
    assert pf and "ivf_cell" in pf[0], f"no partition pruning in plan: {pf}"
    rows = out.collect()
    assert rows and rows[0]["vec_id"] == 0 and rows[0]["cos_sim"] == 1.0


def test_indexed_lsh_matches_unindexed_operator(spark, emb, lsh_dir, qvec):
    """The persisted path returns the same result as the (full-scan)
    in-flight operator at equal parameters."""
    from khl_pdf_ocr_spark.operators.similarity import lsh_ann_topk

    indexed = [(r["vec_id"], r["cos_sim"]) for r in
               lsh_index_topk(spark, lsh_dir, qvec, k=5).collect()]
    inflight = [(r["vec_id"], r["cos_sim"]) for r in
                lsh_ann_topk(emb, qvec, k=5, nbits=6, seed=42).collect()]
    assert indexed == inflight


def test_ivf_containment_in_exact_topM(spark, emb, ivf_dir, qvec):
    """ANN guarantee on the fixture: results ⊆ exact top-50 and the true
    top-1 is found."""
    approx = ivf_index_topk(spark, ivf_dir, qvec, k=5, nprobe=3)
    exact50 = {r["vec_id"] for r in cosine_topk(emb, qvec, k=50).collect()}
    got = [r["vec_id"] for r in approx.collect()]
    assert set(got) <= exact50
    assert got[0] == 0


def test_seeded_kmeans_deterministic():
    vecs = [[float(i % 7), float(i % 3), float(i)] for i in range(50)]
    a = seeded_kmeans(vecs, k=4, seed=1)
    b = seeded_kmeans(vecs, k=4, seed=1)
    assert a == b
    assert len(a) == 4
    cells = nearest_cells([0.0, 0.0, 0.0], a, 2)
    assert len(cells) == 2 and cells == nearest_cells([0.0, 0.0, 0.0], a, 2)


def test_mllib_centroids_build_ivf(spark, emb, qvec, tmp_path):
    """The distributed-KMeans training path (the 100 TB story) feeds the
    SAME index format: build from MLlib centers, query with partition
    pruning, true top-1 found."""
    from khl_pdf_ocr_spark.operators.ann_index import mllib_centroids

    cents = mllib_centroids(emb, k=8, seed=42)
    assert len(cents) == 8 and all(len(c) == 64 for c in cents)
    # determinism at fixed seed (same data, same session)
    assert cents == mllib_centroids(emb, k=8, seed=42)

    d = str(tmp_path / "ivf_mllib")
    build_ivf_index(emb, d, centroids=cents)
    out = ivf_index_topk(spark, d, qvec, k=5, nprobe=3)
    pf = partition_filters(out)
    assert pf and "ivf_cell" in pf[0]
    rows = out.collect()
    assert rows and rows[0]["vec_id"] == 0 and rows[0]["cos_sim"] == 1.0


def test_meta_io_hadoop_scheme(spark, emb, qvec, tmp_path):
    """meta.json must travel through the Hadoop FileSystem API when the
    index dir has a scheme (hdfs://, s3a://, …) — exercised here via
    file:// against LocalFileSystem (r2 ADVICE)."""
    import json
    import os

    from khl_pdf_ocr_spark.operators.ann_index import (_read_text,
                                                       _write_text)

    uri = "file://" + str(tmp_path / "lsh_scheme")
    build_lsh_index(emb, uri, dim=64, nbits=4, seed=42)
    # the metadata landed where the parquet did, behind the scheme
    local_meta = str(tmp_path / "lsh_scheme" / "meta.json")
    assert os.path.exists(local_meta)
    with open(local_meta) as f:
        assert json.load(f)["nbits"] == 4
    # and the query path reads it back through the same API
    rows = lsh_index_topk(spark, uri, qvec, k=3).collect()
    assert rows and rows[0]["vec_id"] == 0

    # round-trip a non-trivial payload (multi-KB — past any single
    # read() buffer) through the scheme-aware helpers directly
    blob = json.dumps({"x": list(range(5000))})
    p = "file://" + str(tmp_path / "roundtrip.json")
    _write_text(spark, p, blob)
    assert _read_text(spark, p) == blob


def test_lsh_probes_match_bucket_expr(spark, emb, qvec):
    """Driver-side probe bits agree with the JVM bucket expression for
    the query's own (identical) vector — the sequential-fold contract."""
    from khl_pdf_ocr_spark.operators.similarity import with_lsh_bucket

    planes = hyperplanes(64, 6, 42)
    jvm_bucket = (with_lsh_bucket(emb.filter(F.col("vec_id") == 0), planes)
                  .select("lsh_bucket").first()["lsh_bucket"])
    assert lsh_probes(qvec, planes, multiprobe=False) == [jvm_bucket]
