"""SemDeDup — semantic deduplication over an embedding column
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication"): cluster the embeddings with a
k-means quantizer, find ε-similar pairs WITHIN each cluster, and keep
exactly one representative per duplicate group — by the paper's rule,
the member FARTHEST from its cluster centroid (low centroid similarity
≈ the least prototypical copy, which the paper found preserves the
most training signal).

This is the embedding-space sibling of the text-level near-dup stages
(MinHash/SimHash catch lexical duplicates; SemDeDup catches *semantic*
ones — translations, templated rewrites, same-content-different-words).
No counterpart exists in the reference; the grounding is the published
method.

Scale design (100 TB):
- cell assignment is ``ann_index.ivf_cell_expr`` — a stateless pure-JVM
  argmin projection over the (bounded, broadcastable) centroid list;
  no shuffle, and the same expression the IVF ANN index uses, so one
  trained quantizer serves search AND dedup.
- within-cell pairs reuse ``similarity.embedding_near_dup_pairs`` with
  the cell as the blocking key: cells above ``max_cell`` rows route
  through LSH banding instead of all-pairs (the hot-block guard), so a
  degenerate quantizer cell can never make the stage quadratic.
- duplicate groups = ``dedup.connected_components`` over the pair set
  (pointer doubling, pair-set-sized — never the corpus).
- survivor election = one window over the component MEMBERS (again
  pair-set-sized); centroid similarity comes from a broadcast
  (cell, centroid) dim join, not a per-row centroid array literal.
- the drop list is corpus-derived and unbounded → joined ``left_anti``,
  never force-broadcast (the r4 decontamination rule).

Known blind spot (inherent to the method, disclosed in the paper): a
duplicate pair straddling a quantizer-cell boundary is never compared
and survives.  ``tests/test_semdedup.py`` pins this behavior — callers
wanting cross-cell recall should lower ``k`` or run the LSH near-dup
stage as well.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.functions.rounding import round_half_up
from khl_pdf_ocr_spark.operators.similarity import (_to_double, cosine,
                                                    embedding_near_dup_pairs)

__all__ = ["semdedup", "prune_prototypes", "cap_per_cluster"]


def semdedup(df: DataFrame, centroids, *, threshold: float = 0.95,
             vec_col: str = "embedding", id_col: str = "doc_id",
             keep: str = "farthest", max_cell: int | None = 10_000,
             nbits: int = 10, seed: int = 42,
             dim: int | None = None) -> tuple[DataFrame, DataFrame]:
    """Returns ``(kept, dropped)``; ``dropped`` is a
    ``(id, reject_reason='semantic_dup')`` ledger frame.

    ``centroids`` — the trained quantizer: a list of centroid vectors
    from ``ann_index.mllib_centroids`` (distributed fit, the production
    path) or ``ann_index.seeded_kmeans`` (deterministic pure-Python
    twin for oracle replay).  Train on a sample; pass the SAME centers
    to every increment so cell boundaries don't drift between runs.

    ``threshold`` — ε-similarity: members of a duplicate group have
    pairwise cosine ≥ threshold (the paper sweeps 1−ε ∈ [0.94, 0.998]).

    ``keep`` — survivor rule per duplicate group: ``"farthest"`` (paper
    default: lowest cosine to the cell centroid; ties → min id),
    ``"closest"`` (most prototypical), or ``"min_id"`` (cheapest —
    skips the centroid-similarity pass entirely).
    """
    if keep not in ("farthest", "closest", "min_id"):
        raise ValueError(f"unknown keep rule: {keep!r}")
    from pyspark.sql import Window

    from khl_pdf_ocr_spark.operators.ann_index import ivf_cell_expr
    from khl_pdf_ocr_spark.operators.dedup import connected_components

    assigned = df.withColumn("_cell", ivf_cell_expr(F.col(vec_col),
                                                    centroids))
    pairs = embedding_near_dup_pairs(
        assigned, threshold=threshold, vec_col=vec_col, id_col=id_col,
        block_col="_cell", max_block=max_cell, nbits=nbits, seed=seed,
        dim=dim)
    comp = connected_components(pairs)

    if keep == "min_id":
        # component labels ARE min ids — everything else drops
        drop = comp.filter(F.col("id") != F.col("component")) \
                   .select("id")
    else:
        spark = df.sparkSession
        cdim = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            "_cell int, _centroid array<double>")
        members = (comp
                   .join(assigned.select(F.col(id_col).alias("id"),
                                         F.col(vec_col).alias("_v"),
                                         "_cell"), "id")
                   .join(F.broadcast(cdim), "_cell")
                   .withColumn("_csim", round_half_up(
                       cosine(_to_double(F.col("_v")), F.col("_centroid")),
                       6)))
        order = (F.col("_csim").asc() if keep == "farthest"
                 else F.col("_csim").desc())
        w = Window.partitionBy("component").orderBy(order,
                                                    F.col("id").asc())
        drop = (members.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") > 1).select("id"))

    dropped = drop.select(F.col("id"),
                          F.lit("semantic_dup").alias("reject_reason"))
    kept = df.join(drop.withColumnRenamed("id", id_col), id_col,
                   "left_anti")
    return kept, dropped


def prune_prototypes(df: DataFrame, centroids, *,
                     drop_fraction: float = 0.2,
                     vec_col: str = "embedding", id_col: str = "doc_id"
                     ) -> tuple[DataFrame, DataFrame]:
    """Per-cluster prototype pruning — the diversification half of D4
    (Tirumala et al. 2023, "D4: Improving LLM Pretraining via Document
    De-Duplication and Diversification", after Sorscher et al. 2022's
    SSL-prototypes): within each k-means cluster, drop the
    ``drop_fraction`` of documents MOST similar to the cluster centroid
    — the most prototypical, least informative examples — keeping the
    cluster's periphery.  Run after ``semdedup`` (the paper's pipeline:
    dedup first, then diversify the survivors).

    Returns ``(kept, ledger)``; the ledger is
    ``(id, reject_reason='prototype_prune')`` — the ``clean_corpus``
    ledger contract.  Deterministic: similarity is rounded to 6 places
    (the cross-engine rule), ties break on ascending id, and per-cell
    drop counts are ``floor(n_cell * drop_fraction)`` — so the output
    is a pure function of (rows, centroids, fraction), stable across
    partitionings and engines.

    Scale shape: cell assignment is the stateless ``ivf_cell_expr``
    projection; centroid similarity comes from one broadcast
    (cell, centroid) dim join; rank + cell size share ONE window
    shuffle on ``_cell`` (count reuses the rank's partitioning).  The
    corpus shuffles once, as (id, similarity, cell) narrow rows —
    the embedding never moves.
    """
    if not 0.0 <= drop_fraction < 1.0:
        raise ValueError(f"drop_fraction must be in [0, 1), got "
                         f"{drop_fraction}")
    from pyspark.sql import Window

    from khl_pdf_ocr_spark.operators.ann_index import ivf_cell_expr

    if drop_fraction == 0.0:
        empty = df.select(F.col(id_col).alias("id"),
                          F.lit("prototype_prune")
                          .alias("reject_reason")).limit(0)
        return df, empty
    spark = df.sparkSession
    cdim = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "_cell int, _centroid array<double>")
    # narrow projection BEFORE the window shuffle: (id, cell, csim)
    scored = (df.select(F.col(id_col).alias("id"),
                        ivf_cell_expr(F.col(vec_col), centroids)
                        .alias("_cell"),
                        _to_double(F.col(vec_col)).alias("_v"))
              .join(F.broadcast(cdim), "_cell")
              .select("id", "_cell",
                      round_half_up(cosine(F.col("_v"),
                                           F.col("_centroid")), 6)
                      .alias("_csim")))
    w = Window.partitionBy("_cell").orderBy(F.col("_csim").desc(),
                                            F.col("id").asc())
    wn = Window.partitionBy("_cell")
    ranked = scored.withColumn("_rk", F.row_number().over(w)) \
                   .withColumn("_n", F.count(F.lit(1)).over(wn))
    drop = (ranked
            .filter(F.col("_rk") <=
                    F.floor(F.col("_n") * F.lit(drop_fraction)))
            .select("id"))
    ledger = drop.select("id",
                         F.lit("prototype_prune").alias("reject_reason"))
    kept = df.join(drop.withColumnRenamed("id", id_col), id_col,
                   "left_anti")
    return kept, ledger


def cap_per_cluster(df: DataFrame, centroids, *, max_per_cluster: int,
                    vec_col: str = "embedding", id_col: str = "doc_id"
                    ) -> tuple[DataFrame, DataFrame]:
    """Keep at most ``max_per_cluster`` documents per k-means cluster —
    semantic-space diversity balancing (the embedding twin of
    ``domains.cap_per_domain``: that bounds any one PUBLISHER's share
    of the corpus, this bounds any one TOPIC's share; cluster-balanced
    selection per DataComp, Gadre et al. 2023).

    Survivor rule: the ``max_per_cluster`` smallest
    ``(xxhash64(id), id)`` keys per cell — the deterministic uniform
    lottery shared with ``cap_per_domain`` / ``deterministic_sample``,
    so membership is reproducible across runs, engines, and cluster
    widths.  Returns ``(kept, ledger='cluster_cap')``.

    Scale shape: one window shuffle of (id, cell) narrow rows (no
    under/over-cap split as in ``cap_per_domain`` — domains have a
    sort-skipping long tail of singletons, k-means cells are ~n/k rows
    each, so every cell sorts anyway).
    """
    if max_per_cluster < 1:
        raise ValueError(f"max_per_cluster must be >= 1, got "
                         f"{max_per_cluster}")
    from pyspark.sql import Window

    from khl_pdf_ocr_spark.operators.ann_index import ivf_cell_expr

    tagged = df.select(F.col(id_col).alias("id"),
                       ivf_cell_expr(F.col(vec_col), centroids)
                       .alias("_cell"))
    w = Window.partitionBy("_cell").orderBy(
        F.xxhash64(F.col("id")).asc(), F.col("id").asc())
    drop = (tagged.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") > max_per_cluster).select("id"))
    ledger = drop.select("id", F.lit("cluster_cap").alias("reject_reason"))
    kept = df.join(drop.withColumnRenamed("id", id_col), id_col,
                   "left_anti")
    return kept, ledger
