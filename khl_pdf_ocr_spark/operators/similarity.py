"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``      — exact brute-force top-k against a query vector:
  the correctness baseline.  Pure built-in higher-order functions
  (zip_with/aggregate) → whole-stage codegen, no Python in the loop.
- ``lsh_ann_topk``     — random-hyperplane (sign) LSH over an
  UN-indexed frame: buckets come from deterministic seeded hyperplanes;
  the query probes its own bucket plus all hamming-1 neighbors.  This
  recomputes the bucket expression per call — ad-hoc use only.  The
  scale path is ``operators.ann_index``: ``build_lsh_index`` writes the
  bucketed table once (partitioned by bucket) and ``lsh_index_topk``
  prunes to ~nbits+1 bucket PARTITIONS instead of scanning every
  vector (plan-asserted in tests/test_ann_index.py).
- ``embedding_near_dup_pairs`` — pairwise cosine near-dups within a
  blocking key (label), for embedding-level corpus dedup; blocks above
  ``max_block`` route through the LSH path (bounded candidates) so one
  hot blocking value can never make the stage quadratic.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.functions.rounding import round_half_up

__all__ = ["cosine", "cosine_topk", "hyperplanes", "with_lsh_bucket",
           "lsh_ann_topk", "lsh_near_dup_pairs", "ivf_ann_topk",
           "embedding_near_dup_pairs"]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def _to_double(col: Column) -> Column:
    return F.transform(col, lambda v: v.cast("double"))


def cosine(a: Column, b: Column) -> Column:
    a, b = _to_double(a), _to_double(b)
    return _dot(a, b) / (_norm(a) * _norm(b))


def _query_lit(query_vec) -> Column:
    return F.array(*[F.lit(float(v)) for v in query_vec])


def _resolve_dim(df: DataFrame, vec_col: str, dim: int | None) -> int:
    """Embedding width WITHOUT running a job: explicit argument → column
    metadata key ``"dim"`` → error (plan construction must stay lazy)."""
    if dim is None:
        md = df.schema[vec_col].metadata or {}
        dim = md.get("dim")
    if dim is None:
        raise ValueError(
            f"embedding dimension unknown: pass dim= explicitly or attach "
            f"metadata {{'dim': N}} to column {vec_col!r} (plan construction "
            "must stay lazy — no probe job is run)")
    return int(dim)


def cosine_topk(df: DataFrame, query_vec, k: int = 10, *,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact top-k by cosine similarity; deterministic tie-break on id."""
    sim = round_half_up(cosine(F.col(vec_col), _query_lit(query_vec)), 6)
    return (df.select(F.col(id_col), sim.alias("cos_sim"))
            .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
            .limit(k))


def hyperplanes(dim: int, nbits: int = 12, seed: int = 42) -> list[list[float]]:
    """Deterministic unit hyperplanes (seeded Gaussian, pure stdlib)."""
    rng = random.Random(seed)
    planes = []
    for _ in range(nbits):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def _bucket_expr(vec_col: Column, planes) -> Column:
    vec = _to_double(vec_col)
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        bit = F.when(_dot(vec, F.array(*[F.lit(x) for x in p])) >= 0,
                     F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket.bitwiseOR(bit)
    return bucket


def with_lsh_bucket(df: DataFrame, planes, vec_col: str = "embedding",
                    out_col: str = "lsh_bucket") -> DataFrame:
    return df.withColumn(out_col, _bucket_expr(F.col(vec_col), planes))


def lsh_ann_topk(df: DataFrame, query_vec, k: int = 10, *, nbits: int = 12,
                 seed: int = 42, vec_col: str = "embedding",
                 id_col: str = "vec_id", multiprobe: bool = True) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket
    (+ hamming-1 probes). Same output schema as ``cosine_topk``."""
    dim = len(query_vec)
    planes = hyperplanes(dim, nbits, seed)
    qbits = 0
    for i, p in enumerate(planes):
        if sum(float(a) * b for a, b in zip(query_vec, p)) >= 0:
            qbits |= 1 << i
    probes = [qbits] + ([qbits ^ (1 << i) for i in range(nbits)] if multiprobe else [])
    bucketed = with_lsh_bucket(df, planes, vec_col)
    cand = bucketed.filter(F.col("lsh_bucket").isin(probes))
    sim = round_half_up(cosine(F.col(vec_col), _query_lit(query_vec)), 6)
    return (cand.select(F.col(id_col), sim.alias("cos_sim"))
            .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
            .limit(k))


def lsh_near_dup_pairs(df: DataFrame, threshold: float = 0.9, *, nbits: int = 10,
                       seed: int = 42, vec_col: str = "embedding",
                       id_col: str = "vec_id", dim: int | None = None,
                       block_col: str | None = None) -> DataFrame:
    """Embedding near-dup pairs at scale: candidates share an LSH bucket
    (random-hyperplane signs), then exact cosine verification.

    vs ``embedding_near_dup_pairs`` (blocking key): no natural blocking
    column needed; recall is tunable via nbits (fewer bits → bigger
    buckets → higher recall, more verification work).  The self-join
    shuffles on the bucket id only.

    ``dim`` (the embedding width) is resolved WITHOUT running a job:
    explicit argument → column metadata key ``"dim"`` → error.  A hidden
    ``df.first()`` probe here would execute the upstream plan at
    composition time — at 100 TB that is a full-scan surprise.

    ``block_col`` (optional) additionally restricts pairs to the same
    blocking key — used by ``embedding_near_dup_pairs``'s oversized-block
    fallback so routed blocks keep the same-block semantics.
    """
    dim = _resolve_dim(df, vec_col, dim)
    planes = hyperplanes(dim, nbits, seed)
    cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("v")]
    if block_col is not None:
        cols.append(F.col(block_col).alias("blk"))
    b = with_lsh_bucket(df.select(*cols), planes, "v")
    l, r = b.alias("l"), b.alias("r")
    cond = (F.col("l.lsh_bucket") == F.col("r.lsh_bucket")) \
        & (F.col("l.id") < F.col("r.id"))
    if block_col is not None:
        cond = cond & (F.col("l.blk") == F.col("r.blk"))
    sim = round_half_up(cosine(F.col("l.v"), F.col("r.v")), 6)
    return (l.join(r, cond)
            .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                    sim.alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold))


def ivf_ann_topk(df: DataFrame, query_vec, k: int = 10, *, n_centroids: int = 16,
                 nprobe: int = 2, seed: int = 42, vec_col: str = "embedding",
                 id_col: str = "vec_id", centroids=None) -> DataFrame:
    """IVF-style ANN over an UN-indexed frame: coarse-quantize → score
    only the ``nprobe`` nearest inverted lists.

    ``centroids`` (list of vectors) skips the MLlib KMeans fit — pass
    pre-trained centers (``ann_index.seeded_kmeans`` or a saved MLlib
    model) so repeated calls never refit.  Without an argument this
    trains per call, which is only acceptable for ad-hoc exploration;
    the scale path is ``ann_index.build_ivf_index`` +
    ``ann_index.ivf_index_topk`` (persisted inverted lists, partition-
    pruned scans).  Same output schema as ``cosine_topk``.
    """
    import math as _math

    q = [float(v) for v in query_vec]
    if centroids is not None:
        from khl_pdf_ocr_spark.operators.ann_index import ivf_cell_expr

        assigned = df.select(F.col(id_col), F.col(vec_col),
                             ivf_cell_expr(F.col(vec_col), centroids).alias("ivf_cell"))
        centers = centroids
    else:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feat = df.select(F.col(id_col), F.col(vec_col),
                         array_to_vector(_to_double(F.col(vec_col))).alias("features"))
        model = KMeans(k=n_centroids, seed=seed, featuresCol="features",
                       predictionCol="ivf_cell").fit(feat)
        assigned = model.transform(feat)
        centers = model.clusterCenters()

    def _dist(c):
        return _math.sqrt(sum((a - b) ** 2 for a, b in zip(c, q)))

    probes = sorted(range(len(centers)), key=lambda i: _dist(centers[i]))[:nprobe]
    cand = assigned.filter(F.col("ivf_cell").isin([int(p) for p in probes]))
    sim = round_half_up(cosine(F.col(vec_col), _query_lit(q)), 6)
    return (cand.select(F.col(id_col), sim.alias("cos_sim"))
            .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
            .limit(k))


def embedding_near_dup_pairs(df: DataFrame, threshold: float = 0.95, *,
                             vec_col: str = "embedding", id_col: str = "vec_id",
                             block_col: str = "label",
                             max_block: int | None = 10_000,
                             nbits: int = 10, seed: int = 42,
                             dim: int | None = None) -> DataFrame:
    """Embedding-cosine near-dup pairs within a blocking key.

    A block of k rows yields k(k-1)/2 comparisons in one shuffle
    partition, so one hot blocking value at 100 TB makes the stage
    quadratic.  Blocks larger than ``max_block`` are therefore routed
    through ``lsh_near_dup_pairs`` (bucketed candidates + exact cosine
    verification, restricted to the same block), exactly like
    ``dedup.ngram_jaccard_pairs``'s big-block fallback — candidate
    *generation* switches from all-pairs to LSH banding on precisely the
    blocks where all-pairs is unpayable.  ``max_block=None`` disables
    the guard (and then ``dim`` is not needed).
    """
    base = df.select(F.col(id_col).alias("id"), F.col(block_col).alias("blk"),
                     F.col(vec_col).alias("v"))
    if max_block is not None:
        from khl_pdf_ocr_spark.operators.dedup import _oversized_block_keys

        # dim is resolved eagerly (metadata/arg only — no probe job):
        # the LSH branch is part of the lazy plan whether or not any
        # block actually exceeds the bound at runtime.  Hot blocking
        # KEYS come from a map-side-combined groupBy and route rows via
        # broadcast semi/anti joins — never a Window over the fat
        # embedding table.
        try:
            dim = _resolve_dim(df, vec_col, dim)
        except ValueError as e:
            raise ValueError(
                f"{e}; alternatively disable the hot-block guard with "
                "max_block=None (all-pairs within blocks — only safe "
                "when no blocking value can be huge)") from None
        big_keys = _oversized_block_keys(df, block_col, max_block)
        big_rows = df.join(F.broadcast(big_keys), block_col, "left_semi")
        small_ids = (df.join(F.broadcast(big_keys), block_col, "left_anti")
                     .select(F.col(id_col).alias("id")))
        base = base.join(small_ids, "id", "left_semi")
        big_pairs = lsh_near_dup_pairs(
            big_rows, threshold=threshold, nbits=nbits, seed=seed,
            vec_col=vec_col, id_col=id_col, dim=dim, block_col=block_col)
    a, b = base.alias("a"), base.alias("b")
    sim = round_half_up(cosine(F.col("a.v"), F.col("b.v")), 6)
    small_pairs = (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold))
    if max_block is not None:
        return small_pairs.unionByName(big_pairs)
    return small_pairs
