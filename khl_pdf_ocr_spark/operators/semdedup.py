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

__all__ = ["semdedup"]


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
