"""Deduplication operators — the scale-critical stages of a
training-data pipeline: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Shuffle discipline (the whole point at 100 TB):
- exact dedup     : ONE hash shuffle on the fingerprint (map-side
  partial aggregation applies);
- MinHash LSH     : explode→agg signature (1 shuffle), band-bucket join
  (1 shuffle on band key) — never an O(n²) cross join;
- SimHash         : 64 conditional aggregates in one pass, then banded
  candidate generation (pigeonhole: hamming ≤ k ⇒ one of k+1 bands
  equal);
- n-gram Jaccard  : pairwise verification ONLY within candidate buckets
  (blocking key), exact set intersection via sorted-distinct arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.functions import text as X
from khl_pdf_ocr_spark.functions.rounding import round_half_up

__all__ = ["exact_dedup", "shingles", "ngram_jaccard_pairs", "minhash_signatures",
           "minhash_lsh_pairs", "simhash", "simhash_pairs"]


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Shingling/hashing is CPU-bound per row; if the upstream scan has
    fewer splits than cores (single-file local tables, small Iceberg
    partitions), one task serializes the whole stage.  One cheap
    round-robin shuffle of the (small) text rows restores parallelism.

    The width probe uses ``inputFiles()`` (metadata-only) rather than
    ``df.rdd.getNumPartitions()`` — the latter finalizes the adaptive
    plan and can EXECUTE upstream stages just to count partitions.
    Non-file-backed frames (joins, in-memory) are left untouched."""
    sc = df.sparkSession.sparkContext
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if files and len(files) < max(2, sc.defaultParallelism // 2):
        return df.repartition(sc.defaultParallelism)
    return df


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
                ) -> DataFrame:
    """Keep the smallest id per normalized-text fingerprint.

    Returns (fingerprint, keep_id, n_dups). One shuffle; partial_count/
    partial_min happen map-side (verify: `explain` shows two
    HashAggregates around the Exchange).
    """
    return (df.select(F.col(id_col), X.fingerprint(F.col(text_col)).alias("fingerprint"))
            .groupBy("fingerprint")
            .agg(F.min(id_col).alias("keep_id"),
                 F.count(F.lit(1)).alias("n_dups")))


# ---------------------------------------------------------------------------
# word-shingle machinery (shared by Jaccard + MinHash)
# ---------------------------------------------------------------------------


def shingles(text_col: str, n: int = 3):
    """Distinct word n-grams of the normalized text, as an array column.

    Pure built-in expressions: split → sliding window via transform over
    an index sequence → concat. Documents shorter than n tokens get one
    shingle = the whole text.
    """
    toks = F.split(X.normalized_text(F.col(text_col)), r"\s+")
    n_sh = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(0), n_sh - F.lit(1))
    return F.array_distinct(F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))))


def ngram_jaccard_pairs(df: DataFrame, *, text_col: str = "text",
                        id_col: str = "doc_id", block_col: str = "source",
                        n: int = 3, threshold: float = 0.8) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard within a blocking key.

    |A∩B|/|A∪B| ≥ threshold; the self-join is keyed on the block column
    so the shuffle is by block, never all-pairs. Emits
    (id_a, id_b, jaccard) with id_a < id_b.
    """
    base = _ensure_parallelism(df).select(
        F.col(id_col).alias("id"), F.col(block_col).alias("blk"),
        shingles(text_col, n).alias("sh"))
    a = base.alias("a")
    b = base.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh"))).cast("double")
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh"))).cast("double")
    return (a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    round_half_up(inter / union, 6).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(df: DataFrame, *, text_col: str = "text",
                       id_col: str = "doc_id", num_perm: int = 64,
                       shingle_n: int = 3) -> DataFrame:
    """(id, sig array<long>[num_perm]) via per-permutation mins of
    re-hashed shingle hashes.

    Implementation notes (measured at sf0.1):
    - each shingle STRING is hashed exactly once (``xxhash64(sh)``);
      the per-permutation values re-hash that 8-byte long, not the
      string — 64 cheap long-hashes instead of 64 string-hashes;
    - a pure map-side nested-``transform`` formulation (zero shuffles)
      is NOT used: higher-order functions run interpreted without
      common-subexpression elimination, so the shingle array would be
      rebuilt per permutation (~10× slower end-to-end);
    - the explode→aggregate shuffle carries only (id, long) pairs and
      combines map-side.
    """
    exploded = (_ensure_parallelism(df)
                .select(F.col(id_col).alias("id"),
                        F.explode(shingles(text_col, shingle_n)).alias("sh"))
                .select("id", F.xxhash64("sh").alias("h")))
    mins = [F.min(F.xxhash64(F.col("h"), F.lit(i))).alias(f"h{i}")
            for i in range(num_perm)]
    agg = exploded.groupBy("id").agg(*mins)
    return agg.select("id", F.array(*[F.col(f"h{i}") for i in range(num_perm)]
                                    ).alias("sig"))


def minhash_lsh_pairs(df: DataFrame, *, text_col: str = "text",
                      id_col: str = "doc_id", num_perm: int = 64,
                      bands: int = 16, shingle_n: int = 3,
                      verify_threshold: float = 0.5) -> DataFrame:
    """Banded-LSH candidate pairs verified by exact shingle Jaccard.

    num_perm/bands rows per band; a pair is a candidate iff some band's
    sub-signature matches exactly (classic banding from MMDS ch.3).
    Candidates are then verified exactly, so the output has no false
    positives w.r.t. ``verify_threshold``.
    """
    if num_perm % bands:
        raise ValueError(f"bands ({bands}) must divide num_perm ({num_perm}); "
                         "trailing permutations would be silently unused")
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(df, text_col=text_col, id_col=id_col,
                              num_perm=num_perm, shingle_n=shingle_n)
    band_arr = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.xxhash64(F.concat_ws(
                     ",", *[F.col("sig")[b * rows_per_band + r].cast("string")
                            for r in range(rows_per_band)])).alias("bh"))
        for b in range(bands)])
    banded = sigs.select("id", F.explode(band_arr).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))

    la, lb = banded.alias("la"), banded.alias("lb")
    cand = (la.join(lb, (F.col("la.band") == F.col("lb.band"))
                    & (F.col("la.bh") == F.col("lb.bh"))
                    & (F.col("la.id") < F.col("lb.id")))
            .select(F.col("la.id").alias("id_a"), F.col("lb.id").alias("id_b"))
            .distinct())

    sh = _ensure_parallelism(df).select(F.col(id_col).alias("id"),
                                        shingles(text_col, shingle_n).alias("sh"))
    cand = (cand.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
            .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (cand.select("id_a", "id_b", round_half_up(inter / union, 6).alias("jaccard"))
            .filter(F.col("jaccard") >= verify_threshold))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 64) -> DataFrame:
    """64-bit SimHash of the token set: per bit, sign of Σ±1 over token
    hashes. One explode + one aggregate (64 conditional sums)."""
    def _bit_lit(b: int):
        # bit 63 is the sign bit of a JVM long — two's complement literal
        return F.lit(-(1 << 63) if b == 63 else (1 << b)).cast("long")

    toks = (_ensure_parallelism(df).select(F.col(id_col).alias("id"),
                      F.explode(F.array_distinct(
                          F.split(X.normalized_text(F.col(text_col)), r"\s+"))).alias("tok"))
            .withColumn("h", F.xxhash64("tok")))
    sums = [F.sum(F.when(F.col("h").bitwiseAND(_bit_lit(b)) != 0, 1)
                  .otherwise(-1)).alias(f"b{b}") for b in range(bits)]
    agg = toks.groupBy("id").agg(*sums)
    packed = F.lit(0).cast("long")
    for b in range(bits):
        packed = packed.bitwiseOR(
            F.when(F.col(f"b{b}") > 0, _bit_lit(b)).otherwise(F.lit(0).cast("long")))
    return agg.select("id", packed.alias("simhash"))


def simhash_pairs(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming.

    Pigeonhole banding: split 64 bits into (max_hamming+1) bands; any
    pair within distance k agrees exactly on ≥1 band → join per band,
    verify with bit_count(xor)."""
    n_bands = max_hamming + 1
    width = 64 // n_bands
    sh = simhash(df, text_col=text_col, id_col=id_col)
    bands = []
    for b in range(n_bands):
        shift = b * width
        w = width if b < n_bands - 1 else 64 - shift
        mask = (1 << w) - 1
        bands.append(F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col("simhash"), shift).bitwiseAND(F.lit(mask)).alias("bh")))
    banded = sh.select("id", "simhash", F.explode(F.array(*bands)).alias("bb")) \
        .select("id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    a, b_ = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (a.join(b_, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .distinct())
