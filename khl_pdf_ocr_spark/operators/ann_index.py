"""Persisted ANN indexes: build once, prune partitions per query.

The round-1 ANN operators recomputed their structure per query —
``lsh_ann_topk`` re-hashed every vector against the hyperplanes on each
call and ``ivf_ann_topk`` re-trained KMeans — correct output, but a
query that scans 100 % of a 100 TB embedding table is not a scale path.
This module makes the index a separate, persisted step:

    build_lsh_index(df, dir)  →  parquet partitioned by lsh_bucket
    build_ivf_index(df, dir)  →  parquet partitioned by ivf_cell
                                 (+ meta.json: planes / centroids / params)

    lsh_index_topk(spark, dir, q)  →  reads ONLY the probed buckets
    ivf_index_topk(spark, dir, q)  →  reads ONLY the nprobe nearest cells

The probe set is computed driver-side from the persisted metadata (pure
Python — no job, no refit); the query's bucket filter lands in the scan
as a PARTITION filter, so at 100 TB the storage layer skips every
unprobed bucket's files entirely (plan-asserted in tests/test_plans.py).

Determinism discipline (this is what makes the DuckDB oracles possible):
all bucket/cell assignment arithmetic is a SEQUENTIAL left fold over the
vector elements (Spark ``aggregate``; DuckDB ``list_reduce``), so both
engines produce bitwise-identical doubles and therefore identical sign
bits / argmins.  Centroids come from ``seeded_kmeans`` — a deterministic
pure-Python Lloyd's — passed in as literals on both sides; production
builds may instead pass MLlib-trained centers.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.functions.rounding import round_half_up
from khl_pdf_ocr_spark.operators.similarity import (_query_lit, _to_double,
                                                    cosine, hyperplanes,
                                                    with_lsh_bucket)

__all__ = ["seeded_kmeans", "mllib_centroids", "build_lsh_index",
           "lsh_index_topk", "build_ivf_index", "ivf_index_topk",
           "lsh_probes", "nearest_cells", "ivf_cell_expr"]


# ---------------------------------------------------------------------------
# deterministic coarse quantizer (pure Python — identical on both oracle sides)
# ---------------------------------------------------------------------------


def seeded_kmeans(vectors: list[list[float]], k: int, seed: int = 42,
                  iters: int = 20) -> list[list[float]]:
    """Deterministic Lloyd's k-means (seeded init, fixed iterations,
    first-index tie-breaks).  Runs driver-side on a sample/full read of
    the (small relative to the corpus) vector set; at 100 TB use
    ``mllib_centroids`` (distributed fit) — the index format is
    identical."""
    import random

    n = len(vectors)
    if n == 0:
        raise ValueError("cannot train on an empty vector set")
    k = min(k, n)
    rng = random.Random(seed)
    centers = [list(map(float, vectors[i])) for i in rng.sample(range(n), k)]
    for _ in range(iters):
        sums = [[0.0] * len(centers[0]) for _ in range(k)]
        counts = [0] * k
        for v in vectors:
            best, best_d = 0, float("inf")
            for ci, c in enumerate(centers):
                d = 0.0
                for a, b in zip(v, c):
                    d += (float(a) - b) ** 2
                if d < best_d:  # strict < → first index wins ties
                    best, best_d = ci, d
            counts[best] += 1
            for j, a in enumerate(v):
                sums[best][j] += float(a)
        centers = [[s / c for s in sums[i]] if (c := counts[i]) else centers[i]
                   for i in range(k)]
    return centers


def mllib_centroids(df: DataFrame, k: int, *, seed: int = 42,
                    max_iter: int = 20,
                    vec_col: str = "embedding") -> list[list[float]]:
    """Coarse-quantizer centers via DISTRIBUTED MLlib KMeans — the
    actual 100 TB training path for ``build_ivf_index`` (the fit is a
    Spark job over executors, never a driver-side list).

    ``seeded_kmeans`` remains the deterministic pure-Python twin used
    where the DuckDB oracle must replay the exact same centers; the two
    are interchangeable as ``build_ivf_index(centroids=...)`` inputs —
    the index format and the query path are identical.  Train on a
    sample (``df.sample(...)``) when the corpus itself is 100 TB; the
    quantizer only needs the density shape, not every vector.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.select(array_to_vector(
        F.transform(F.col(vec_col), lambda v: v.cast("double"))
    ).alias("features"))
    model = KMeans(k=k, seed=seed, maxIter=max_iter,
                   featuresCol="features").fit(feat)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def ivf_cell_expr(vec_col: Column, centroids: list[list[float]]) -> Column:
    """argmin-of-squared-distance cell id, as a pure JVM expression.

    Sequential left-fold sums (``F.aggregate``) keep the arithmetic
    bitwise-reproducible in any engine that folds left (DuckDB
    ``list_reduce``) — the oracle contract."""
    v = _to_double(vec_col)
    dists = []
    for c in centroids:
        cl = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(F.zip_with(v, cl, lambda a, b: (a - b) * (a - b)),
                        F.lit(0.0), lambda acc, x: acc + x)
        dists.append(d)
    darr = F.array(*dists)
    return (F.array_position(darr, F.array_min(darr)) - 1).cast("int")


# ---------------------------------------------------------------------------
# LSH index
# ---------------------------------------------------------------------------


def _meta_path(index_dir: str) -> str:
    return _join(index_dir, "meta.json")


def _data_path(index_dir: str) -> str:
    return _join(index_dir, "data")


def _join(base: str, leaf: str) -> str:
    # URI-safe join: os.path.join would mangle hdfs://… on Windows and
    # never normalizes scheme paths anyway
    return base.rstrip("/") + "/" + leaf if "://" in base \
        else os.path.join(base, leaf)


def _write_text(spark: SparkSession, path: str, content: str) -> None:
    """Write small metadata next to the Spark-written parquet.  The
    parquet goes through Hadoop, so on hdfs://-s3a:// index dirs the
    metadata must too (r2 ADVICE: local open() strands meta.json on the
    driver's disk); plain paths keep the cheap local write."""
    if "://" not in path:
        with open(path, "w") as f:
            f.write(content)
        return
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def _read_text(spark: SparkSession, path: str) -> str:
    if "://" not in path:
        with open(path) as f:
            return f.read()
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(hpath)
    try:
        # IOUtils drains the stream fully (read() alone returns one byte)
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8")
    finally:
        stream.close()


def build_lsh_index(df: DataFrame, index_dir: str, *, dim: int,
                    nbits: int = 8, seed: int = 42,
                    vec_col: str = "embedding", id_col: str = "vec_id") -> dict:
    """Hash every vector once and persist, partitioned by bucket."""
    planes = hyperplanes(dim, nbits, seed)
    bucketed = with_lsh_bucket(
        df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")),
        planes, "embedding")
    bucketed.write.mode("overwrite").partitionBy("lsh_bucket") \
        .parquet(_data_path(index_dir))
    meta = {"kind": "lsh", "dim": dim, "nbits": nbits, "seed": seed,
            "planes": planes}
    _write_text(df.sparkSession, _meta_path(index_dir), json.dumps(meta))
    return meta


def lsh_probes(query_vec, planes, *, multiprobe: bool = True) -> list[int]:
    """Query bucket + hamming-1 neighbors (sequential-fold dots)."""
    qbits = 0
    for i, p in enumerate(planes):
        acc = 0.0
        for a, b in zip(query_vec, p):
            acc += float(a) * b
        if acc >= 0:
            qbits |= 1 << i
    probes = [qbits]
    if multiprobe:
        probes += [qbits ^ (1 << i) for i in range(len(planes))]
    return probes


def lsh_index_topk(spark: SparkSession, index_dir: str, query_vec, k: int = 10,
                   *, multiprobe: bool = True) -> DataFrame:
    """Top-k over the probed buckets only — a partition-pruned scan."""
    meta = json.loads(_read_text(spark, _meta_path(index_dir)))
    probes = lsh_probes(query_vec, meta["planes"], multiprobe=multiprobe)
    cand = (spark.read.parquet(_data_path(index_dir))
            .filter(F.col("lsh_bucket").isin(probes)))
    sim = round_half_up(cosine(F.col("embedding"), _query_lit(query_vec)), 6)
    return (cand.select("vec_id", sim.alias("cos_sim"))
            .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
            .limit(k))


# ---------------------------------------------------------------------------
# IVF index
# ---------------------------------------------------------------------------


def build_ivf_index(df: DataFrame, index_dir: str, *,
                    centroids: list[list[float]],
                    vec_col: str = "embedding", id_col: str = "vec_id") -> dict:
    """Assign every vector to its nearest centroid once and persist,
    partitioned by cell (the inverted lists)."""
    assigned = df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"),
        ivf_cell_expr(F.col(vec_col), centroids).alias("ivf_cell"))
    assigned.write.mode("overwrite").partitionBy("ivf_cell") \
        .parquet(_data_path(index_dir))
    meta = {"kind": "ivf", "centroids": centroids}
    _write_text(df.sparkSession, _meta_path(index_dir), json.dumps(meta))
    return meta


def nearest_cells(query_vec, centroids, nprobe: int) -> list[int]:
    """The nprobe nearest centroid ids (deterministic index tie-break)."""
    dists = []
    for ci, c in enumerate(centroids):
        d = 0.0
        for a, b in zip(query_vec, c):
            d += (float(a) - b) ** 2
        dists.append((d, ci))
    return [ci for _, ci in sorted(dists)[:nprobe]]


def ivf_index_topk(spark: SparkSession, index_dir: str, query_vec, k: int = 10,
                   *, nprobe: int = 2) -> DataFrame:
    """Top-k over the nprobe nearest inverted lists only."""
    meta = json.loads(_read_text(spark, _meta_path(index_dir)))
    cells = nearest_cells(query_vec, meta["centroids"], nprobe)
    cand = (spark.read.parquet(_data_path(index_dir))
            .filter(F.col("ivf_cell").isin(cells)))
    sim = round_half_up(cosine(F.col("embedding"), _query_lit(query_vec)), 6)
    return (cand.select("vec_id", sim.alias("cos_sim"))
            .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
            .limit(k))
