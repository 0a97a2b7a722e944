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

__all__ = ["exact_dedup", "exact_dedup_incremental", "shingles",
           "ngram_jaccard_pairs", "minhash_signatures", "minhash_lsh_pairs",
           "minhash_lsh_incremental", "with_minhash_signature",
           "signature_jaccard_estimate",
           "simhash", "simhash_pairs", "simhash_incremental", "hot_band_buckets",
           "connected_components", "DEFAULT_MAX_BUCKET", "CHAIN_WINDOW"]

# Hot-bucket bound for banded LSH self-joins: a band bucket of k rows
# yields k(k-1)/2 candidates in ONE shuffle partition — k identical
# boilerplate docs at 100 TB would make that stage quadratic.  Buckets
# above this size fall back to windowed-chain candidates (each member
# pairs with its next CHAIN_WINDOW neighbors in sort order: ≤ k·W pairs).
# The chain preserves connected-component clusters ONLY when adjacent
# members verify pairwise (exact Jaccard / hamming runs on every
# candidate) — true for the homogeneous dup clusters that cause hot
# buckets under 64-bit MinHash band hashes, where every pair verifies;
# in a HETEROGENEOUS hot bucket chain edges can fail verification and
# split transitive clusters.  That is the documented trade-off vs the
# complete pair list; audit what got chained with ``hot_band_buckets``
# or the ``audit=`` hook (no-silent-caps rule).  SimHash's bands are
# only bits/(max_hamming+1) wide (16 bits at 64/3), so its hot buckets
# ARE heterogeneous by construction — there the chain orders by the
# full simhash value (sorted-neighborhood à la Manku et al., WWW'07),
# which keeps hamming-close members adjacent instead of id-random.
DEFAULT_MAX_BUCKET = 256
# neighbors each hot-bucket member is paired with in the chain fallback
CHAIN_WINDOW = 4


def _oversized_block_keys(df: DataFrame, block_col: str,
                          max_block: int) -> DataFrame:
    """Blocking values with more than ``max_block`` rows — a tiny
    one-column frame (hot keys are few by definition), computed with
    map-side partial counts; broadcast it into semi/anti joins instead
    of window-counting over the fat table."""
    return (df.groupBy(block_col)
            .agg(F.count(F.lit(1)).alias("_blk_n"))
            .filter(F.col("_blk_n") > max_block)
            .select(block_col))


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


def exact_dedup_incremental(df: DataFrame, seen_fp: DataFrame, *,
                            text_col: str = "text", id_col: str = "doc_id"
                            ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Dedup a NEW batch against itself AND a historical fingerprint
    ledger — the daily-increment shape of a crawl pipeline (a fresh
    WARC dump arrives; everything already ingested must not re-enter
    the corpus).

    ``seen_fp``: one-column frame ``fingerprint`` (md5 of normalized
    text) of everything kept so far — at scale a bucketed/Iceberg table
    partitioned by fingerprint prefix, so this join co-locates
    (operators.bucketing).

    Returns ``(kept, new_fingerprints, ledger)``:
    - ``kept``             — surviving NEW rows (original columns);
    - ``new_fingerprints`` — their fingerprints: append to the ledger
      table for the next increment (caller owns the write);
    - ``ledger``           — (id, reject_reason) with reasons
      ``exact_dup_batch`` (lost the min-id race within this batch) and
      ``exact_dup_history`` (already ingested in a prior increment).

    Shuffle budget: one hash shuffle of the batch on fingerprint (the
    grouping), one fingerprint equi-join against history — both on the
    same key, so a fingerprint-bucketed history table makes the second
    co-located.

    NULL text fingerprints to a PER-ROW sentinel (never NULL, never
    shared): an equi-join on a NULL key matches nothing, which would
    silently drop those rows from BOTH kept and ledger — and a shared
    sentinel would make every NULL-text document a mutual duplicate
    (one survivor per batch, all later increments blacklisted).
    NULL-text rows therefore pass through untouched; run quality
    filtering (clean_corpus) to reject them explicitly.  Sentinels are
    excluded from ``new_fingerprints`` so the ledger never bloats.
    """
    sentinel = F.concat(F.lit("\x00nulltext:"), F.col(id_col).cast("string"))
    fp = df.withColumn(
        "fingerprint",
        F.coalesce(X.fingerprint(F.col(text_col)), sentinel))
    mins = fp.groupBy("fingerprint").agg(F.min(F.col(id_col)).alias("_keep_id"))
    tagged = fp.join(mins, "fingerprint")
    batch_dup = (tagged.filter(F.col(id_col) != F.col("_keep_id"))
                 .select(F.col(id_col).alias("id"),
                         F.lit("exact_dup_batch").alias("reject_reason")))
    heads = tagged.filter(F.col(id_col) == F.col("_keep_id")).drop("_keep_id")
    seen = seen_fp.select("fingerprint")
    hist_dup = (heads.join(seen, "fingerprint", "left_semi")
                .select(F.col(id_col).alias("id"),
                        F.lit("exact_dup_history").alias("reject_reason")))
    kept = heads.join(seen, "fingerprint", "left_anti")
    new_fps = (kept.filter(~F.col("fingerprint").startswith("\x00nulltext:"))
               .select("fingerprint"))
    return (kept.drop("fingerprint"), new_fps,
            batch_dup.unionByName(hist_dup))


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


# -- numpy block-verify kernel (r6) -----------------------------------------
# Blocks up to this many docs verify through the co-occurrence kernel
# below (dense k×k float64 count matrix ≤ 134 MB transient at the cap);
# larger exact blocks (kernel cap < k ≤ max_block) keep the original
# JVM self-join form — same output, bounded worker memory.
KERNEL_MAX_BLOCK = 4096
# Shingles shared by more docs than this are counted via one BLAS
# matmul over a k×n_hot incidence slab instead of pair enumeration
# (their C(g,2) emission count grows quadratically with group size).
_HOT_GROUP_CUT = 32


def _ranges(counts):
    """Concatenated [arange(c) for c in counts], vectorized."""
    import numpy as np
    return (np.arange(int(counts.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(counts) - counts, counts))


def _block_intersections(sh_arrays, *, hot_cut: int = _HOT_GROUP_CUT):
    """Pairwise distinct-element intersection sizes for one block.

    ``sh_arrays``: sequence of 1-D int64 arrays (hashed shingle sets;
    duplicates tolerated — deduped here, matching ``array_intersect``'s
    set semantics).  Returns (ia, jb, inter): positional doc-index pairs
    with ia < jb and inter ≥ 1.  Work is proportional to the TRUE
    overlap structure (Σ_shingle C(group,2) emissions for rare shingles
    + one incidence matmul for common ones), never k² Python-side pair
    loops; counts accumulate in float64 (exact to 2^53).
    """
    import numpy as np
    k = len(sh_arrays)
    e = np.empty(0, np.int64)
    if k < 2:
        return e, e, e
    uniq = [np.unique(np.asarray(a, dtype=np.int64)) for a in sh_arrays]
    lens = np.fromiter((u.size for u in uniq), dtype=np.int64, count=k)
    if int(lens.sum()) == 0:
        return e, e, e
    di = np.repeat(np.arange(k, dtype=np.int64), lens)
    hv = np.concatenate(uniq)
    order = np.lexsort((di, hv))        # by shingle hash, then doc index
    hv, di = hv[order], di[order]
    starts = np.flatnonzero(np.r_[True, hv[1:] != hv[:-1]])
    sizes = np.diff(np.r_[starts, hv.size])
    M = np.zeros((k, k), dtype=np.float64)
    hot = sizes > hot_cut
    if hot.any():
        hs, hz = starts[hot], sizes[hot]
        memb = di[np.repeat(hs, hz) + _ranges(hz)]
        cols = np.repeat(np.arange(hs.size, dtype=np.int64), hz)
        chunk = max(1, (4 << 20) // k)  # ≤ ~32 MB float64 incidence slab
        for c0 in range(0, hs.size, chunk):
            lo = np.searchsorted(cols, c0)
            hi = np.searchsorted(cols, c0 + chunk)
            D = np.zeros((k, min(chunk, hs.size - c0)), dtype=np.float64)
            D[memb[lo:hi], cols[lo:hi] - c0] = 1.0
            M += D @ D.T                # symmetric + diagonal; triu read below
    cold = np.flatnonzero(~hot & (sizes >= 2))
    cs, cz = starts[cold], sizes[cold]
    for s in np.unique(cz):
        g = cs[cz == s]
        members = di[g[:, None] + np.arange(s)]   # rows ascend per group
        pi, qi = np.triu_indices(int(s), 1)
        flat = members[:, pi].ravel() * k + members[:, qi].ravel()
        if flat.size > (1 << 16):
            M += np.bincount(flat, minlength=k * k).reshape(k, k)
        else:
            np.add.at(M.reshape(-1), flat, 1.0)
    M = np.triu(M, 1)
    ia, jb = np.nonzero(M)
    return (ia.astype(np.int64), jb.astype(np.int64),
            M[ia, jb].astype(np.int64))


def _kernel_pairs(src: DataFrame, *, threshold: float, n: int) -> DataFrame:
    """All-pairs exact-Jaccard verification within each ``blk`` of
    ``src`` (id, blk, nt) via the numpy co-occurrence kernel — ONE
    shuffle (groupBy blk) instead of the self-join's two sides, no
    per-pair JVM hash-set build, and no interpreted higher-order
    shingle expressions (the transform/slice/array_distinct pipeline is
    the measured scale-killer: one pass of it alone over 50k ~3 kB docs
    exceeds 5 minutes on 32 cores, all JVM interpreted-expression time
    — same diagnosis as the r6 repetition-kernel change #1).

    ``nt`` is the JVM-normalized text (the exact ``X.normalized_text``
    expression), so normalization parity is by construction; the kernel
    replays only tokenize → n-gram → distinct: after trim+collapse the
    Java ``split("\\s+")`` equals Python ``split(" ")`` (pinned incl.
    the empty-string row), shingles are built as
    ``" ".join(toks[i:i+n]) for i in range(max(m-n+1, 1))`` — identical
    to ``concat_ws(" ", slice(toks, i+1, n))`` over
    ``sequence(0, greatest(m-n, 0))`` — and set identity uses EXACT
    strings via ``pd.factorize`` (the JVM form's xxhash64 step only
    ever existed to cheapen per-pair compares; exact strings remove
    even its 2^-64 collision budget).  Output-identical to the JVM join
    form (pinned by tests/test_ngram_kernel.py): same rounding formula,
    same NULL semantics (NULL id rows pair with nothing — a.id < b.id
    is strict; NULL TEXT gets the ``{""}`` shingle set exactly like
    empty text, because legacy ``size(NULL) = -1`` makes the JVM form
    emit one all-NULL-slice ``concat_ws`` shingle), same id ordering
    (UTF-8 byte order == code-point order).
    """
    from pyspark.sql.types import DoubleType, StructField, StructType

    id_field = src.schema["id"]
    out_schema = StructType([
        StructField("id_a", id_field.dataType, True),
        StructField("id_b", id_field.dataType, True),
        StructField("jaccard", DoubleType(), True)])
    integral_id = id_field.dataType.simpleString() in (
        "tinyint", "smallint", "int", "bigint")

    def _block(pdf):
        import numpy as np
        import pandas as pd
        pdf = pdf[pdf["id"].notna()]
        k = len(pdf)
        empty = pd.DataFrame({"id_a": pdf["id"].iloc[:0],
                              "id_b": pdf["id"].iloc[:0],
                              "jaccard": pd.Series([], dtype="float64")})
        if k < 2:
            return empty
        ids = pdf["id"].to_numpy()
        if integral_id and ids.dtype.kind == "f":
            ids = ids.astype(np.int64)   # pandas NaN-promotion undone
        lens = np.empty(k, dtype=np.int64)
        all_sh: list = []
        for r, t in enumerate(pdf["nt"]):
            # NULL text == empty text in the JVM form (see docstring)
            toks = (t if isinstance(t, str) else "").split(" ")
            m = len(toks)
            sset = {" ".join(toks[i:i + n])
                    for i in range(max(m - n + 1, 1))}
            lens[r] = len(sset)
            all_sh.extend(sset)
        codes, _ = pd.factorize(np.asarray(all_sh, dtype=object))
        bounds = np.cumsum(lens)[:-1]
        per_doc = np.split(codes.astype(np.int64), bounds)
        n_sh = lens.astype(np.float64)
        ia, jb, inter = _block_intersections(per_doc)
        if threshold <= 0:   # rounded jaccard 0.0 passes: need all pairs
            dense = np.zeros((k, k), dtype=np.float64)
            dense[ia, jb] = inter
            ia, jb = np.triu_indices(k, 1)
            inter = dense[ia, jb]
        if ia.size == 0:
            return empty
        # replays the JVM form bit-for-bit: int sums < 2^53 are exact in
        # float64, division and floor(x*1e6+0.5)/1e6 are IEEE-identical
        x = inter.astype(np.float64) / (n_sh[ia] + n_sh[jb] - inter)
        jacc = np.floor(x * 1e6 + 0.5) / 1e6      # round_half_up(·, 6)
        keep = jacc >= threshold
        id_i, id_j, jacc = ids[ia[keep]], ids[jb[keep]], jacc[keep]
        neq = id_i != id_j                        # a.id < b.id is strict
        id_i, id_j, jacc = id_i[neq], id_j[neq], jacc[neq]
        swap = id_i > id_j
        return pd.DataFrame({"id_a": np.where(swap, id_j, id_i),
                             "id_b": np.where(swap, id_i, id_j),
                             "jaccard": jacc})

    return (src.select("blk", "id", "nt")
            .groupBy("blk").applyInPandas(_block, out_schema))


def ngram_jaccard_pairs(df: DataFrame, *, text_col: str = "text",
                        id_col: str = "doc_id", block_col: str = "source",
                        n: int = 3, threshold: float = 0.8,
                        max_block: int | None = 10_000,
                        kernel_max_block: int | None = KERNEL_MAX_BLOCK
                        ) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard within a blocking key.

    |A∩B|/|A∪B| ≥ threshold; work is keyed on the block column so the
    shuffle is by block, never all-pairs. Emits (id_a, id_b, jaccard)
    with id_a < id_b.  "Exact" = exhaustive candidate generation and
    set-cardinality Jaccard over the distinct shingle sets; set elements
    are compared via xxhash64 (r6 — see the in-body note for the
    measured 2.5× and the 2^-64 collision budget).

    Blocks larger than ``max_block`` would make the stage quadratic (one
    hot domain at 100 TB); they are routed through the MinHash-LSH path
    instead (same exact-Jaccard verification, same output schema and
    threshold — only candidate *generation* switches from all-pairs to
    banding, trading provable completeness for bounded work on exactly
    the blocks where all-pairs is unpayable).  ``max_block=None``
    disables the guard.

    Blocks of at most ``kernel_max_block`` docs verify through a numpy
    co-occurrence kernel (r6, guide §4.2): the whole interpreted
    higher-order shingle pipeline (transform/slice/array_distinct —
    measured as essentially the ENTIRE cell cost on long docs) and the
    per-pair ``array_intersect`` hash-set build become one
    tokenize+factorize+shingle→docs inversion per block (bincount for
    rare shingles, one BLAS matmul for common ones), with the block's
    rows crossing the Arrow boundary once as JVM-normalized text.
    Output-identical to the JVM join form — which still handles blocks
    above the kernel cap and remains the parity oracle
    (``kernel_max_block=None`` disables the kernel).
    """
    sh = shingles(text_col, n)

    def _hashed_base(side: DataFrame) -> DataFrame:
        # r6 note kept for the retained JVM form: |sh| staged per side
        # once (union = |A|+|B|−|A∩B| — exact, shingles() is
        # array_distinct'ed) and set elements xxhash64'd so per-pair
        # intersection compares longs, not ~n-token strings (measured
        # 2.5× at 500-shingle docs; ~2^-64-per-pair collision budget).
        return _ensure_parallelism(side).select(
            F.col(id_col).alias("id"), F.col(block_col).alias("blk"),
            F.transform(sh, lambda g: F.xxhash64(g)).alias("sh"),
            F.size(sh).alias("n_sh"))

    small_docs = df
    if max_block is not None:
        # block sizes via groupBy (map-side partials, tiny result) and
        # the hot KEYS via broadcast semi/anti joins — NOT a
        # Window.partitionBy(block), which would shuffle the whole fat
        # table just to count rows.  Hot blocking values are by
        # definition few, so the broadcast side is trivially small.
        big_keys = _oversized_block_keys(df, block_col, max_block)
        big_docs = df.join(F.broadcast(big_keys), block_col, "left_semi")
        small_docs = df.join(F.broadcast(big_keys), block_col, "left_anti")
        big_pairs = minhash_lsh_pairs(
            big_docs, text_col=text_col, id_col=id_col, shingle_n=n,
            verify_threshold=threshold, block_col=block_col)

    def _jvm_pairs(side: DataFrame) -> DataFrame:
        a = side.alias("a")
        b = side.alias("b")
        inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh"))).cast("double")
        union = (F.col("a.n_sh") + F.col("b.n_sh")).cast("double") - inter
        return (
            a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    round_half_up(inter / union, 6).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))

    if kernel_max_block is None:
        small_pairs = _jvm_pairs(_hashed_base(small_docs))
    else:
        # split by block size: kernel for blocks ≤ kernel_max_block,
        # the JVM join for the (rare) mid-size exact blocks — and the
        # expensive shingle expressions are only built over the mid
        # docs.  NULL blk rows pair with nothing in the join form (NULL
        # never equi-joins); the kernel path filters them for the same
        # result.
        mid_keys = _oversized_block_keys(df, block_col, kernel_max_block)
        mid_docs = small_docs.join(F.broadcast(mid_keys), block_col, "left_semi")
        kern_docs = small_docs.join(F.broadcast(mid_keys), block_col, "left_anti")
        kern_src = (_ensure_parallelism(kern_docs)
                    .filter(F.col(block_col).isNotNull())
                    .select(F.col(id_col).alias("id"),
                            F.col(block_col).alias("blk"),
                            X.normalized_text(F.col(text_col)).alias("nt")))
        small_pairs = (_kernel_pairs(kern_src, threshold=threshold, n=n)
                       .unionByName(_jvm_pairs(_hashed_base(mid_docs))))
    if max_block is not None:
        return small_pairs.unionByName(big_pairs)
    return small_pairs


# ---------------------------------------------------------------------------
# banded-LSH candidate generation with a hot-bucket bound
# ---------------------------------------------------------------------------


def _band_candidates(banded: DataFrame, *, keys: tuple[str, ...] = ("band", "bh"),
                     extra: tuple[str, ...] = (),
                     max_bucket: int | None = DEFAULT_MAX_BUCKET,
                     chain_order: str | None = None,
                     chain_window: int = CHAIN_WINDOW) -> DataFrame:
    """Candidate id pairs from a banded frame (id, *keys, *extra).

    Buckets (groups sharing ``keys``) of size <= ``max_bucket`` emit all
    C(k,2) pairs via the band self-join; larger buckets emit WINDOWED
    CHAIN candidates: each member pairs with its ``chain_window``
    predecessors in sort order (≤ k·W pairs), so one hot bucket can
    never make the stage quadratic.  ``chain_order`` picks the sort
    column (default: id — right when hot buckets are homogeneous dup
    clusters; pass the sketch value, e.g. ``"simhash"``, to keep
    sketch-close members adjacent in heterogeneous buckets —
    sorted-neighborhood à la Manku et al., WWW'07).  NOTE the chain is a
    recall trade-off, not free: only pairs that VERIFY downstream
    survive, and non-adjacent similar members of a hot bucket are
    simply not generated.  ``extra`` columns are carried through as
    ``<c>_a``/``<c>_b`` (e.g. the simhash value for hamming
    verification).  ``max_bucket=None`` disables the bound.
    """
    from pyspark.sql import Window

    def _pairs(frame: DataFrame) -> DataFrame:
        a, b = frame.alias("la"), frame.alias("lb")
        cond = F.col("la.id") < F.col("lb.id")
        for k in keys:
            cond = (F.col(f"la.{k}") == F.col(f"lb.{k}")) & cond
        return (a.join(b, cond)
                .select(F.col("la.id").alias("id_a"), F.col("lb.id").alias("id_b"),
                        *[F.col(f"la.{c}").alias(f"{c}_a") for c in extra],
                        *[F.col(f"lb.{c}").alias(f"{c}_b") for c in extra]))

    if max_bucket is None:
        return _pairs(banded)

    sized = banded.withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy(*keys)))
    small_pairs = _pairs(sized.filter(F.col("_n") <= max_bucket).drop("_n"))
    order_cols = ([F.col(chain_order), F.col("id")] if chain_order
                  else [F.col("id")])
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    # all chain_window lags in ONE window pass, exploded to pair rows
    lag_structs = F.array(*[
        F.struct(F.lag("id", d).over(w).alias("pid"),
                 *[F.lag(c, d).over(w).alias(f"p_{c}") for c in extra])
        for d in range(1, chain_window + 1)])
    swap = F.col("p.pid") > F.col("id")  # normalize to id_a < id_b
    # window exprs and generators can't share a projection — stage them
    chained = (sized.filter(F.col("_n") > max_bucket)
               .select("id", *extra, lag_structs.alias("_lags"))
               .select("id", *extra, F.explode("_lags").alias("p"))
               .filter(F.col("p.pid").isNotNull())
               .select(
                   F.when(swap, F.col("id")).otherwise(F.col("p.pid")).alias("id_a"),
                   F.when(swap, F.col("p.pid")).otherwise(F.col("id")).alias("id_b"),
                   *[F.when(swap, F.col(c)).otherwise(F.col(f"p.p_{c}"))
                     .alias(f"{c}_a") for c in extra],
                   *[F.when(swap, F.col(f"p.p_{c}")).otherwise(F.col(c))
                     .alias(f"{c}_b") for c in extra]))
    return small_pairs.unionByName(chained)


def hot_band_buckets(banded: DataFrame, *, keys: tuple[str, ...] = ("band", "bh"),
                     max_bucket: int = DEFAULT_MAX_BUCKET) -> DataFrame:
    """Audit helper (the no-silent-caps rule): the buckets whose
    candidate generation was chain-bounded, with their sizes."""
    return (banded.groupBy(*[F.col(k) for k in keys])
            .agg(F.count(F.lit(1)).alias("bucket_size"))
            .filter(F.col("bucket_size") > max_bucket))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _shingle_stream(df: DataFrame, *, text_col: str, id_col: str,
                    n: int) -> DataFrame:
    """(id, h) rows — one per word-n-gram occurrence — with NO
    higher-order expressions (r6 change #14).

    ``explode(shingles(...))`` evaluated the
    transform/sequence/slice/concat_ws/array_distinct pipeline
    interpreted, per element, with no common-subexpression elimination —
    measured ~190 s for 50k ~550-token docs on 32 cores (Python workers
    idle, pure JVM expression time).  This form is measured-codegen-
    friendly: ``posexplode`` of the PLAIN token array (a bare-attribute
    generator — a Generate over a composite ``arrays_zip`` child
    measured 178 s where the plain explode takes 1.4 s), the token
    array carried alongside within the same WholeStageCodegen (a
    per-row reference, never materialized), successors fetched with
    null-safe ``get``, one row-level ``concat_ws``.  Same shape: 8.6 s.

    Value contract (pinned by tests): the emitted multiset of shingle
    strings per doc equals the HOF form's array MINUS its
    ``array_distinct`` — callers must be duplicate-insensitive, which
    both consumers are (``min`` aggregation; ``collect_set``).  Edge
    parity with ``shingles()``: docs with fewer than ``n`` tokens emit
    exactly one shingle (``concat_ws`` skips the NULL out-of-bounds
    ``get``s), empty text emits the ``""`` shingle, and NULL text ALSO
    emits the ``""`` shingle (the HOF form's legacy ``size(NULL) = -1``
    path — replayed here via ``coalesce``), so every input row is
    represented.
    """
    toks = F.split(
        F.coalesce(X.normalized_text(F.col(text_col)), F.lit("")),
        r"\s+")
    succ = [F.get(F.col("toks"), F.col("pos") + i) for i in range(1, n)]
    return (_ensure_parallelism(df)
            .select(F.col(id_col).alias("id"), toks.alias("toks"))
            .select("id", F.size("toks").alias("_m"), "toks",
                    F.posexplode("toks").alias("pos", "tok"))
            .filter(F.col("pos") <= F.greatest(F.col("_m") - n, F.lit(0)))
            .select("id", F.xxhash64(
                F.concat_ws(" ", F.col("tok"), *succ)).alias("h")))


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
      rebuilt per permutation (~10× slower end-to-end) — r6 change #14
      removed the last interpreted HOF from this path entirely
      (``_shingle_stream``; duplicates need no pre-``distinct`` because
      ``min`` is duplicate-insensitive, and output values are pinned
      identical to the per-row HOF twin ``with_minhash_signature``);
    - the explode→aggregate shuffle carries only (id, long) pairs and
      combines map-side.
    """
    exploded = _shingle_stream(df, text_col=text_col, id_col=id_col,
                               n=shingle_n)
    mins = [F.min(F.xxhash64(F.col("h"), F.lit(i))).alias(f"h{i}")
            for i in range(num_perm)]
    agg = exploded.groupBy("id").agg(*mins)
    return agg.select("id", F.array(*[F.col(f"h{i}") for i in range(num_perm)]
                                    ).alias("sig"))


def _band_signatures(sigs: DataFrame, *, num_perm: int, bands: int,
                     carry: tuple[str, ...] = ()) -> DataFrame:
    """(id, sig, …) → (id[, carry…], band, bh): per-band sub-signature
    hashes — a pure projection of the signature array, so a persisted
    signature store re-bands at read time without touching any text
    (and a STREAM re-bands statelessly; explode is a narrow op).
    ``carry`` columns pass through untouched (e.g. the event-time
    column a streaming watermark needs)."""
    rows_per_band = num_perm // bands
    band_arr = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.xxhash64(F.concat_ws(
                     ",", *[F.col("sig")[b * rows_per_band + r].cast("string")
                            for r in range(rows_per_band)])).alias("bh"))
        for b in range(bands)])
    return sigs.select("id", *carry, F.explode(band_arr).alias("bb")).select(
        "id", *carry, F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))


def with_minhash_signature(df: DataFrame, *, text_col: str = "text",
                           id_col: str = "doc_id", out_col: str = "sig",
                           num_perm: int = 64, shingle_n: int = 3) -> DataFrame:
    """Per-ROW minhash signature as stateless projections — the
    streaming-safe twin of ``minhash_signatures`` (no explode→groupBy
    aggregation, so it composes into a structured stream without
    watermarked state).  The hashed-shingle array is staged ONCE per
    row; each permutation is an ``array_min`` over a re-hash of that
    array.  Output values are identical to ``minhash_signatures``
    (test-asserted); the batch path keeps the explode→agg formulation
    because interpreted HOFs lose to codegen aggregates on throughput
    at corpus scale."""
    staged = df.withColumn(
        "_hsh", F.transform(shingles(text_col, shingle_n),
                            lambda s: F.xxhash64(s)))

    def perm_min(i: int):
        # NB: must be a ONE-arg lambda built in a closure — a two-param
        # lambda (e.g. `lambda v, i=i`) is interpreted by pyspark's HOF
        # translator as (element, index) and the permutation number gets
        # silently rebound to the array index column
        return F.array_min(F.transform(
            F.col("_hsh"), lambda v: F.xxhash64(v, F.lit(i))))

    sig = F.array(*[perm_min(i) for i in range(num_perm)])
    return staged.withColumn(out_col, sig).drop("_hsh")


def _truncate_hot_buckets(banded: DataFrame, max_bucket: int,
                          audit: dict | None = None,
                          audit_key: str = "hot_history_buckets") -> DataFrame:
    """Bound hot (band, bh) buckets to their ``max_bucket`` smallest
    ids WITHOUT shuffling the full frame: tiny grouped counts → the few
    hot keys broadcast into semi/anti joins → rank only the hot subset
    (the same discipline as the ngram/embedding block guards)."""
    counts = banded.groupBy("band", "bh").agg(
        F.count(F.lit(1)).alias("bucket_size"))
    hot = counts.filter(F.col("bucket_size") > max_bucket) \
                .select("band", "bh", "bucket_size")
    if audit is not None:
        audit[audit_key] = hot
    from pyspark.sql import Window

    hot_keys = F.broadcast(hot.select("band", "bh"))
    cold_part = banded.join(hot_keys, ["band", "bh"], "left_anti")
    hot_part = banded.join(hot_keys, ["band", "bh"], "left_semi")
    w = Window.partitionBy("band", "bh").orderBy("id")
    hot_trunc = (hot_part.withColumn("_rn", F.row_number().over(w))
                 .filter(F.col("_rn") <= max_bucket).drop("_rn"))
    return cold_part.unionByName(hot_trunc)


def signature_jaccard_estimate(sig_a, sig_b, *, num_perm: int = 64):
    """Column expr: fraction of agreeing permutations — the unbiased
    MinHash estimator of Jaccard similarity (MMDS ch.3)."""
    agree = F.size(F.filter(F.zip_with(sig_a, sig_b,
                                       lambda x, y: x == y), lambda v: v))
    return round_half_up(agree.cast("double") / F.lit(float(num_perm)), 6)


def minhash_lsh_pairs(df: DataFrame, *, text_col: str = "text",
                      id_col: str = "doc_id", num_perm: int = 64,
                      bands: int = 16, shingle_n: int = 3,
                      verify_threshold: float = 0.5,
                      max_bucket: int | None = DEFAULT_MAX_BUCKET,
                      block_col: str | None = None,
                      audit: dict | None = None,
                      sigs: DataFrame | None = None) -> DataFrame:
    """Banded-LSH candidate pairs verified by exact shingle Jaccard.

    num_perm/bands rows per band; a pair is a candidate iff some band's
    sub-signature matches exactly (classic banding from MMDS ch.3).
    Candidates are then verified exactly, so the output has no false
    positives w.r.t. ``verify_threshold``.

    ``max_bucket`` bounds hot band buckets (see ``DEFAULT_MAX_BUCKET``);
    ``block_col`` additionally restricts pairs to the same blocking key
    (used by the ``ngram_jaccard_pairs`` big-block fallback).

    ``audit`` (no-silent-caps rule): pass a dict and it gains a LAZY
    ``"hot_buckets"`` DataFrame — (band keys, bucket_size) of every
    bucket whose candidates were chain-bounded; count/collect it in run
    stats to see exactly what the cap touched.
    """
    if num_perm % bands:
        raise ValueError(f"bands ({bands}) must divide num_perm ({num_perm}); "
                         "trailing permutations would be silently unused")
    if sigs is None:  # ``sigs``: precomputed (id, sig) — MUST match
        # num_perm/shingle_n; lets incremental callers avoid a second
        # signature pass over the batch text (r4 review)
        sigs = minhash_signatures(df, text_col=text_col, id_col=id_col,
                                  num_perm=num_perm, shingle_n=shingle_n)
    banded = _band_signatures(sigs, num_perm=num_perm, bands=bands)

    keys = ("band", "bh")
    if block_col is not None:
        blocks = df.select(F.col(id_col).alias("id"), F.col(block_col).alias("blk"))
        banded = banded.join(blocks, "id")
        keys = ("band", "bh", "blk")
    if audit is not None and max_bucket is not None:
        # the banded frame is scanned twice (candidate join + hot-bucket
        # audit); without a persist, counting the audit AFTER the main
        # output is written re-runs the whole signature lineage (ADVICE
        # r3).  Narrow (id, band, bh[, blk]) rows — cheap to cache even
        # at scale.  Caller unpersists via audit["persisted"].
        banded = banded.persist()
        audit.setdefault("persisted", []).append(banded)
        audit["hot_buckets"] = hot_band_buckets(banded, keys=keys,
                                                max_bucket=max_bucket)
    cand = _band_candidates(banded, keys=keys, max_bucket=max_bucket).distinct()

    # exact verify over xxhash64-mapped distinct shingle sets with the
    # union derived from staged cardinalities (r6 — the same two
    # per-pair cuts as ngram_jaccard_pairs, same ~2^-64 collision
    # budget as the banding itself; long compares instead of ~n-token
    # strings were the sf1.0 straggler in this very join's predicate).
    # r6 change #14: the sets are aggregated from the HOF-free shingle
    # stream (collect_set — duplicate-insensitive) instead of a second
    # interpreted transform/array_distinct pass over every doc; n_sh
    # counts distinct HASHES rather than distinct strings, a difference
    # only an xxhash64 collision could expose — the identical ~2^-64
    # budget this verify already rides for the intersect itself.
    sh = (_shingle_stream(df, text_col=text_col, id_col=id_col,
                          n=shingle_n)
          .groupBy("id").agg(F.collect_set("h").alias("sh"))
          .withColumn("n_sh", F.size("sh")))
    cand = (cand.join(sh.withColumnRenamed("id", "id_a")
                      .withColumnRenamed("sh", "sh_a")
                      .withColumnRenamed("n_sh", "n_a"), "id_a")
            .join(sh.withColumnRenamed("id", "id_b")
                  .withColumnRenamed("sh", "sh_b")
                  .withColumnRenamed("n_sh", "n_b"), "id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.col("n_a") + F.col("n_b")).cast("double") - inter
    return (cand.select("id_a", "id_b", round_half_up(inter / union, 6).alias("jaccard"))
            .filter(F.col("jaccard") >= verify_threshold))


def minhash_lsh_incremental(df: DataFrame, seen_sigs: DataFrame, *,
                            text_col: str = "text", id_col: str = "doc_id",
                            num_perm: int = 64, bands: int = 16,
                            shingle_n: int = 3,
                            verify_threshold: float = 0.5,
                            max_bucket: int | None = DEFAULT_MAX_BUCKET,
                            audit: dict | None = None,
                            include_batch_pairs: bool = True
                            ) -> tuple[DataFrame, DataFrame]:
    """Near-dup detection for a NEW batch against itself AND a
    persisted signature store — the daily-increment twin of
    ``exact_dedup_incremental`` for NEAR duplicates (a fresh crawl
    arrives; docs near-identical to anything already ingested must be
    flagged without re-scanning a 100 TB corpus).

    ``seen_sigs``: the store — (id, sig array<long>[num_perm]) of every
    previously kept doc (append ``new_sigs`` each increment; at scale
    an Iceberg/bucketed table).  History TEXT is never read: band
    hashes are a pure projection of the stored signature
    (``_band_signatures``), and history matches are verified by the
    signature agreement fraction — the unbiased MinHash estimator of
    Jaccard — instead of exact shingle intersection (the classic
    store-the-sketch trade; the new-vs-new half still exact-verifies
    because the batch text is in hand).

    Returns ``(pairs, new_sigs)``:
    - ``pairs`` — (id_a, id_b, jaccard, match_kind): ``batch`` rows are
      exact-verified new×new pairs (id_a < id_b, both new); ``history``
      rows are new-id_a × stored-id_b with estimated jaccard ≥
      ``verify_threshold``;
    - ``new_sigs`` — (id, sig) of the batch, PERSISTED (it feeds both
      pair halves): append to the store, then ``new_sigs.unpersist()``.

    ``include_batch_pairs=False`` skips the new×new half entirely —
    for callers that already batch-deduped (e.g. after ``clean_corpus``,
    whose near-dup stage ran at the same threshold) the self-join and
    its exact verification would be pure duplicate work (r4 review).

    Scale budget: signatures computed for the BATCH only; the history
    side costs one (band, bh) equi-join against the store projection —
    partition/bucket the store by band for a co-located probe.  Hot
    history buckets (> ``max_bucket`` members) are truncated to their
    ``max_bucket`` smallest ids via the groupBy→broadcast-hot-keys
    pattern (no full-store window shuffle); ``audit`` gains the lazy
    ``"hot_history_buckets"`` frame (no-silent-caps).
    """
    if num_perm % bands:
        raise ValueError(f"bands ({bands}) must divide num_perm ({num_perm})")
    # fail fast on a store written with a different num_perm: mismatched
    # widths would silently band over NULL tail elements and divide the
    # agreement estimate by the wrong denominator — a true duplicate
    # could score ~0.5 and escape the threshold (r4 review).  One tiny
    # first() probe; this operator is not lazy-pure anyway (persist).
    probe = seen_sigs.select(F.size("sig").alias("n")).first()
    if probe is not None and probe["n"] != num_perm:
        raise ValueError(
            f"signature store width {probe['n']} != num_perm {num_perm}; "
            "probe with the num_perm the store was written with")
    # the batch's text→shingle→hash pass is the dominant cost of an
    # increment — compute it ONCE, persist, and feed both the batch
    # self-join and the history probe (r4 review: it ran 2-3×).  The
    # returned new_sigs IS the persisted handle; unpersist it after
    # appending to the store.
    new_sigs = minhash_signatures(df, text_col=text_col, id_col=id_col,
                                  num_perm=num_perm, shingle_n=shingle_n
                                  ).persist()
    batch_pairs = None
    if include_batch_pairs:
        batch_pairs = (minhash_lsh_pairs(df, text_col=text_col,
                                         id_col=id_col,
                                         num_perm=num_perm, bands=bands,
                                         shingle_n=shingle_n,
                                         verify_threshold=verify_threshold,
                                         max_bucket=max_bucket, audit=audit,
                                         sigs=new_sigs)
                       .withColumn("match_kind", F.lit("batch")))

    hist_sigs = seen_sigs.select(F.col("id"), F.col("sig"))
    banded_new = _band_signatures(new_sigs, num_perm=num_perm, bands=bands)
    banded_hist = _band_signatures(hist_sigs, num_perm=num_perm, bands=bands)

    if max_bucket is not None:
        banded_hist = _truncate_hot_buckets(banded_hist, max_bucket, audit)

    cand = (banded_new.select(F.col("id").alias("id_a"), "band", "bh")
            .join(banded_hist.select(F.col("id").alias("id_b"), "band", "bh"),
                  ["band", "bh"])
            .select("id_a", "id_b").distinct())

    a = new_sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    b = hist_sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = signature_jaccard_estimate(F.col("sig_a"), F.col("sig_b"),
                                     num_perm=num_perm)
    hist_pairs = (cand.join(a, "id_a").join(b, "id_b")
                  .select("id_a", "id_b", est.alias("jaccard"))
                  .filter(F.col("jaccard") >= verify_threshold)
                  .withColumn("match_kind", F.lit("history")))

    if batch_pairs is None:
        return hist_pairs, new_sigs
    return batch_pairs.unionByName(hist_pairs), new_sigs



def _band_simhash(sh: DataFrame, *, bits: int, max_hamming: int) -> DataFrame:
    """(id, simhash, …) → (id, simhash, band, bh): pigeonhole bit-slice
    bands — a pure projection of the stored 64-bit hash, so a persisted
    simhash store re-bands at read time (incremental path) exactly like
    the in-flight frame."""
    n_bands = max_hamming + 1
    width = bits // n_bands
    bands = []
    for b in range(n_bands):
        shift = b * width
        w = width if b < n_bands - 1 else bits - shift
        mask = (1 << w) - 1
        bands.append(F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col("simhash"), shift)
            .bitwiseAND(F.lit(mask)).alias("bh")))
    return sh.select("id", "simhash", F.explode(F.array(*bands)).alias("bb")) \
        .select("id", "simhash", F.col("bb.band").alias("band"),
                F.col("bb.bh").alias("bh"))


def simhash_incremental(df: DataFrame, seen_hashes: DataFrame, *,
                        text_col: str = "text", id_col: str = "doc_id",
                        max_hamming: int = 3, bits: int = 64,
                        token_hash=None,
                        max_bucket: int | None = DEFAULT_MAX_BUCKET,
                        audit: dict | None = None
                        ) -> tuple[DataFrame, DataFrame]:
    """SimHash near-dup detection for a NEW batch against a persisted
    hash store — the simhash twin of ``minhash_lsh_incremental``, with
    one upgrade: history verification is EXACT, because the stored
    64-bit hash is the complete similarity state (hamming distance on
    stored values), not a sketch estimate.

    ``seen_hashes``: (id, simhash) of everything previously kept.
    Returns ``(pairs, new_hashes)``:
    - ``pairs`` — (id_a, id_b, hamming, match_kind): ``batch`` =
      new×new via ``simhash_pairs``; ``history`` = new×stored with
      hamming ≤ ``max_hamming`` (exact);
    - ``new_hashes`` — (id, simhash) of the batch, PERSISTED: append
      to the store, then ``new_hashes.unpersist()``.

    Hot history buckets truncate exactly as in the minhash incremental
    (``audit["hot_history_buckets"]``); note simhash's narrow pigeonhole
    bands make hot buckets likelier at scale — raise ``bits`` or
    partition the store if the audit shows wide truncation.
    """
    # one simhash pass over the batch text, persisted and shared by the
    # self-join and the history probe; returned handle = the persisted
    # frame (unpersist after appending to the store)
    new_hashes = simhash(df, text_col=text_col, id_col=id_col, bits=bits,
                         token_hash=token_hash).persist()
    batch = (simhash_pairs(df, text_col=text_col, id_col=id_col,
                           max_hamming=max_hamming, bits=bits,
                           token_hash=token_hash, max_bucket=max_bucket,
                           audit=audit, hashes=new_hashes)
             .withColumn("match_kind", F.lit("batch")))
    b_new = _band_simhash(new_hashes, bits=bits, max_hamming=max_hamming)
    b_hist = _band_simhash(seen_hashes.select("id", "simhash"),
                           bits=bits, max_hamming=max_hamming)
    if max_bucket is not None:
        b_hist = _truncate_hot_buckets(b_hist, max_bucket, audit)
    cand = (b_new.select(F.col("id").alias("id_a"),
                         F.col("simhash").alias("simhash_a"), "band", "bh")
            .join(b_hist.select(F.col("id").alias("id_b"),
                                F.col("simhash").alias("simhash_b"),
                                "band", "bh"),
                  ["band", "bh"])
            .select("id_a", "id_b", "simhash_a", "simhash_b").distinct())
    ham = F.bit_count(F.col("simhash_a").bitwiseXOR(F.col("simhash_b")))
    hist = (cand.select("id_a", "id_b", ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .withColumn("match_kind", F.lit("history")))
    return batch.unionByName(hist), new_hashes


# ---------------------------------------------------------------------------
# connected components over near-dup pairs
# ---------------------------------------------------------------------------


def connected_components(pairs: DataFrame, *, id_a: str = "id_a",
                         id_b: str = "id_b", max_iter: int = 15) -> DataFrame:
    """(id_a, id_b) edges → (id, component); component = min id reachable.

    keep-one-per-COMPONENT dedup semantics: for pair sets like
    (A,C),(B,C) the per-pair drop-id_b policy keeps both A and B even
    though they are transitively duplicates; components keep exactly one
    representative per cluster.

    Distributed min-label propagation with POINTER DOUBLING
    (label ← label(label) each round), so convergence is
    O(log diameter) — the chain-bounded hot buckets (``DEFAULT_MAX_BUCKET``)
    produce path-shaped clusters whose diameter is the bucket size, and
    one-hop-only propagation would need that many rounds.  Each round is
    two small shuffles over the PAIR set (failure-rate-sized, not
    corpus-sized); an early-exit check runs one tiny action per round —
    inherent to any iterate-to-fixpoint algorithm.
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    edges = edges.persist()
    labels = (edges.select(F.col("src").alias("id")).distinct()
              .withColumn("label", F.col("id")).localCheckpoint(eager=True))
    try:
        for _ in range(max_iter):
            # hop: min label among neighbors
            neigh = (edges.join(labels, edges["src"] == labels["id"])
                     .groupBy("dst").agg(F.min("label").alias("nlabel")))
            hopped = (labels.join(neigh, labels["id"] == neigh["dst"], "left")
                      .select(labels["id"],
                              F.least("label", F.coalesce("nlabel", "label")
                                      ).alias("label"))
                      .persist())
            # shortcut (pointer doubling): label ← label(label)
            x, y = hopped.alias("x"), hopped.alias("y")
            doubled = (x.join(y, F.col("x.label") == F.col("y.id"), "left")
                       .select(F.col("x.id").alias("id"),
                               F.least(F.col("x.label"),
                                       F.coalesce(F.col("y.label"),
                                                  F.col("x.label"))
                                       ).alias("label"))
                       # TRUNCATE LINEAGE each round: without this the
                       # logical plan doubles per iteration (self-joins of
                       # self-joins) and Catalyst analysis time explodes
                       # even though caches shortcut execution
                       .localCheckpoint(eager=True))
            # convergence = no row changed its label this round.  The
            # diff join is type-agnostic (ids may be strings/longs/...)
            # and cheap: both sides are flat localCheckpoint'd frames of
            # the pair-node set.  (A sum-of-labels witness would break on
            # non-numeric ids: ANSI cast error, or NULL-sum false
            # convergence with ANSI off.)
            changed = (doubled.alias("n")
                       .join(labels.alias("o"), F.col("n.id") == F.col("o.id"))
                       .filter(F.col("n.label") != F.col("o.label"))
                       .limit(1).count())
            hopped.unpersist()
            labels.unpersist()
            labels = doubled
            if changed == 0:
                break
        return labels.select(F.col("id"), F.col("label").alias("component"))
    finally:
        edges.unpersist()


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def sql_token_hash(col):
    """Polynomial codepoint hash mod 2^31-1 — chosen because it is
    computable IDENTICALLY in ANSI SQL (DuckDB ``list_reduce`` over
    ``unicode(t[i])``), which lets the driver oracle recompute the whole
    simhash pipeline independently.  Weaker than xxhash64 (31 bits);
    production keeps the xxhash64 default.  One shared implementation
    with the winnowing fingerprint (functions.text)."""
    from khl_pdf_ocr_spark.functions.text import _poly_hash

    return _poly_hash(col)


def simhash(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 64, token_hash=None) -> DataFrame:
    """SimHash of the token set: per bit, sign of Σ±1 over token
    hashes. One explode + one aggregate (``bits`` conditional sums).

    ``token_hash`` (Column → Column) defaults to ``xxhash64`` (64-bit);
    pass ``sql_token_hash`` with ``bits=31`` for the SQL-reproducible
    variant the driver oracle checks."""
    def _bit_lit(b: int):
        # bit 63 is the sign bit of a JVM long — two's complement literal
        return F.lit(-(1 << 63) if b == 63 else (1 << b)).cast("long")

    hash_fn = token_hash if token_hash is not None else F.xxhash64
    toks = (_ensure_parallelism(df).select(F.col(id_col).alias("id"),
                      F.explode(F.array_distinct(
                          F.split(X.normalized_text(F.col(text_col)), r"\s+"))).alias("tok"))
            .withColumn("h", hash_fn(F.col("tok"))))
    sums = [F.sum(F.when(F.col("h").bitwiseAND(_bit_lit(b)) != 0, 1)
                  .otherwise(-1)).alias(f"b{b}") for b in range(bits)]
    agg = toks.groupBy("id").agg(*sums)
    packed = F.lit(0).cast("long")
    for b in range(bits):
        packed = packed.bitwiseOR(
            F.when(F.col(f"b{b}") > 0, _bit_lit(b)).otherwise(F.lit(0).cast("long")))
    return agg.select("id", packed.alias("simhash"))


def simhash_pairs(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3,
                  max_bucket: int | None = DEFAULT_MAX_BUCKET,
                  bits: int = 64, token_hash=None,
                  audit: dict | None = None,
                  hashes: DataFrame | None = None) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming.

    Pigeonhole banding: split ``bits`` bits into (max_hamming+1) bands;
    any pair within distance k agrees exactly on ≥1 band → join per
    band, verify with bit_count(xor).  Hot band buckets are
    chain-bounded via ``max_bucket`` (see ``DEFAULT_MAX_BUCKET``);
    with ``max_bucket=None`` the pigeonhole guarantees EXACT recall,
    which is what the driver oracle checks against exhaustive pairs.

    Narrow-band caveat (r2 ADVICE): bands are only bits/(max_hamming+1)
    wide — 16 bits at 64/3 — so beyond ~2^band_width·max_bucket docs
    (~16M at the defaults) EVERY bucket is hot and candidates come from
    the chain fallback.  The chain therefore orders by the full simhash
    value (``chain_order="simhash"``), keeping hamming-close members
    adjacent (sorted-neighborhood), so recall degrades gracefully
    instead of collapsing under an id-random chain; for exact recall at
    that scale raise ``bits``/``max_bucket`` or partition the corpus.
    ``audit``: as in ``minhash_lsh_pairs`` — a lazy ``"hot_buckets"``
    frame of every chain-bounded bucket."""
    sh = hashes if hashes is not None else simhash(
        df, text_col=text_col, id_col=id_col, bits=bits,
        token_hash=token_hash)
    banded = _band_simhash(sh, bits=bits, max_hamming=max_hamming)
    if audit is not None and max_bucket is not None:
        banded = banded.persist()  # see minhash_lsh_pairs: audit re-scan
        audit.setdefault("persisted", []).append(banded)
        audit["hot_buckets"] = hot_band_buckets(banded, max_bucket=max_bucket)
    cand = _band_candidates(banded, extra=("simhash",), max_bucket=max_bucket,
                            chain_order="simhash")
    ham = F.bit_count(F.col("simhash_a").bitwiseXOR(F.col("simhash_b")))
    return (cand.select("id_a", "id_b", ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .distinct())
