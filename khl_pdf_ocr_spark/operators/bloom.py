"""Sharded Bloom-filter membership store — memory-bounded incremental dedup.

The exact ledger (``dedup.exact_dedup_incremental``) is the precise
path: every increment joins the new batch's fingerprints against an
O(corpus) history table.  The Bloom store is the fixed-budget
alternative used by production crawl pipelines (Dolma's deduper is the
published example): membership state is ~1.2 bytes/document at 1 %
false-positive rate — ~1.2 TB for 10^12 documents — held as **shards**
so neither the driver nor any single task ever materializes more than
one shard's bitset.

Scale shape (the 100 TB story):

* **All hashing is JVM-side.**  Shard routing is
  ``pmod(xxhash64(fp), n_shards)``; the k bit positions are
  ``pmod(xxhash64(fp, seed_i), m)`` built as an array column inside
  whole-stage codegen.  Python sees only integer arrays.
* **Build** is one hash shuffle of ``(shard, positions)`` (≤ 8·k bytes
  per document) into ``applyInPandas`` per shard: numpy sets bits with
  one vectorized ``bitwise_or.at`` — one binary row out per shard.
* **Probe** is a *cogroup* on shard (``applyInPandas`` over
  ``cogroup``): each task receives one shard's probe rows AND that
  shard's single bitset row — the bitset is NEVER joined row-wise onto
  probe rows (a naive equi-join would copy megabytes of bitset onto
  every document).  One shuffle of the slim probe projection; the
  store moves at most once.
* **Merge** (the daily append) ORs bitsets shard-wise: a one-row-per-
  shard outer join, numpy OR — O(store), no history fingerprints read.
* Geometry ``(n_shards, m, k)`` is stamped on every shard row; merge
  and probe fail fast on mismatch (a store built for one geometry is
  meaningless under another).

Semantics: ``probably_seen == False`` is EXACT (no false negatives —
a Bloom filter never forgets an inserted key); ``True`` is wrong with
probability ≤ fpp.  The incremental policy below therefore drops
flagged docs (Dolma's policy — at 1 % fpp you lose 1 % of genuinely
novel docs, acceptable for web-scale corpora); callers needing
exactness route flagged docs through the exact ledger instead.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, BooleanType, IntegerType,
                               LongType, StructField, StructType)

from ..functions import text as X

_POS_SEED_BASE = 0x5EED_B100  # xxhash64 seeds for the k bit positions

STORE_SCHEMA = StructType([
    StructField("shard", IntegerType()),
    StructField("bits", BinaryType()),
    StructField("m", LongType()),
    StructField("k", IntegerType()),
    StructField("n_shards", IntegerType()),
    StructField("n_items", LongType()),
])


def bloom_geometry(expected_per_shard: int, fpp: float) -> Tuple[int, int]:
    """Optimal (m bits, k hashes) for n items at the target fpp.

    m = -n·ln p / ln²2, k = (m/n)·ln 2 — the standard formulas.  m is
    rounded up to a byte boundary.
    """
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    n = max(1, expected_per_shard)
    m = math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 7) // 8) * 8
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _shard(fp_col, n_shards: int):
    return F.pmod(F.xxhash64(fp_col), F.lit(n_shards)).cast("int")


def _positions(fp_col, m: int, k: int):
    return F.array(*[
        F.pmod(F.xxhash64(fp_col, F.lit(_POS_SEED_BASE + i)), F.lit(m))
        for i in range(k)])


def _geometry(store: DataFrame) -> Tuple[int, int, int] | None:
    """(m, k, n_shards) of a store; None for an empty store."""
    rows = store.select("m", "k", "n_shards").distinct().limit(2).collect()
    if len(rows) > 1:
        raise ValueError(f"bloom store has mixed geometry: {rows}")
    if not rows:
        return None
    return rows[0]["m"], rows[0]["k"], rows[0]["n_shards"]


def build_bloom_store(fp_df: DataFrame, *, fp_col: str = "fingerprint",
                      n_shards: int = 64,
                      expected_per_shard: int = 100_000,
                      fpp: float = 0.01,
                      _geometry_override: Tuple[int, int, int] | None = None
                      ) -> DataFrame:
    """Build a sharded Bloom store from a fingerprint column.

    Size for the TARGET corpus, not the first batch: ``m`` is fixed at
    build time, and a filter loaded beyond its ``expected_per_shard``
    exceeds the nominal fpp (monitor ``n_items`` per shard).  At
    10^12 docs: ``n_shards = 2**17``, ``expected_per_shard ≈ 8M``
    → ~9.6 MB/shard, ~1.2 TB total, no shard ever on the driver.
    """
    if _geometry_override is not None:
        m, k, n_shards = _geometry_override
    else:
        m, k = bloom_geometry(expected_per_shard, fpp)
    # NULL fingerprints are never inserted (ADVICE r5): xxhash64(NULL)
    # is a seed-derived constant, so raw NULL rows would all collide
    # onto one phantom membership while bloom_probe deliberately
    # treats NULL as unseen — build and probe must agree
    slim = fp_df.filter(F.col(fp_col).isNotNull()).select(
        _shard(F.col(fp_col), n_shards).alias("shard"),
        _positions(F.col(fp_col), m, k).alias("positions"))
    n_bytes = m // 8

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(n_bytes, dtype=np.uint8)
        if len(pdf):
            pos = np.concatenate(pdf["positions"].to_numpy()).astype(np.int64)
            np.bitwise_or.at(bits, pos >> 3,
                             np.left_shift(1, pos & 7).astype(np.uint8))
        return pd.DataFrame({
            "shard": [int(pdf["shard"].iloc[0])], "bits": [bits.tobytes()],
            "m": [m], "k": [k], "n_shards": [n_shards],
            "n_items": [len(pdf)]})

    return slim.groupBy("shard").applyInPandas(_build, STORE_SCHEMA)


def merge_bloom_stores(a: DataFrame, b: DataFrame, *,
                       geometry: Tuple[int, int, int] | None = None
                       ) -> DataFrame:
    """OR two stores shard-wise — the daily append.  Geometry must
    match exactly (fail-fast); shards present on one side pass
    through.  O(store) work, no fingerprints read.

    ``geometry``: pass the known ``(m, k, n_shards)`` to skip the
    discovery collects — each ``_geometry`` call is a Spark job over
    that side's LINEAGE, which re-executes an un-checkpointed build
    (the incremental path constructs the delta with the store's
    geometry, so it threads the value through instead).

    Each side must hold ≤1 row per shard (a raw multi-delta
    ``increment_id``-partitioned layout has several — reduce it with
    :func:`or_reduce_bloom_stores` first); a third row per (side,
    shard) fails the task rather than silently dropping memberships.
    """
    if geometry is None:
        ga, gb = _geometry(a), _geometry(b)
        if gb is None:
            return a
        if ga is None:
            return b
        if ga != gb:
            raise ValueError(f"bloom geometry mismatch: {ga} vs {gb}")

    def _or(key, la: pd.DataFrame, lb: pd.DataFrame) -> pd.DataFrame:
        if len(la) > 1 or len(lb) > 1:
            raise ValueError(
                f"merge_bloom_stores: shard {key} has multiple rows on "
                "one side (a multi-delta layout?) — reduce each side "
                "with or_reduce_bloom_stores first")
        rows = pd.concat([la, lb], ignore_index=True)
        if geometry is not None:
            # an explicit geometry kwarg skipped the discovery collects
            # — validate it against the actual rows (ADVICE r5: two
            # stores with equal m but different k would otherwise merge
            # silently and corrupt membership semantics).  One integer
            # compare per shard row.
            gm, gk, gn = geometry
            for _, r in rows.iterrows():
                if (int(r["m"]), int(r["k"]), int(r["n_shards"])) != \
                        (gm, gk, gn):
                    raise ValueError(
                        f"merge_bloom_stores: shard {key} row geometry "
                        f"({int(r['m'])}, {int(r['k'])}, "
                        f"{int(r['n_shards'])}) != supplied "
                        f"{(gm, gk, gn)}")
        if len(rows) == 1:
            return rows
        x = np.frombuffer(rows["bits"].iloc[0], dtype=np.uint8)
        y = np.frombuffer(rows["bits"].iloc[1], dtype=np.uint8)
        out = rows.iloc[[0]].copy()
        out["bits"] = [np.bitwise_or(x, y).tobytes()]
        out["n_items"] = [int(rows["n_items"].sum())]  # upper bound
        return out

    return (a.groupBy("shard").cogroup(b.groupBy("shard"))
            .applyInPandas(_or, STORE_SCHEMA))


def or_reduce_bloom_stores(deltas: DataFrame) -> DataFrame:
    """OR a UNION of delta stores down to one store — shard-wise, in a
    single ``groupBy(shard)`` pass.

    This is the idempotent-increment shape: persist one **delta**
    bloom per increment (``PARTITION BY increment_id``, exactly like
    the exact ledger), build the probe-time view as
    ``or_reduce(all foreign increments' deltas)``, and periodically
    compact old deltas into a single base partition so the reduce
    stays O(recent increments × shards).  A scheduler retry republishes
    its own delta partition (dynamic overwrite) and probes only
    foreign ones — OR being idempotent makes the compaction itself
    retry-safe too.
    """
    geo = _geometry(deltas)
    if geo is None:
        return deltas

    def _or_all(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = np.frombuffer(pdf["bits"].iloc[0], dtype=np.uint8).copy()
        for b in pdf["bits"].iloc[1:]:
            np.bitwise_or(acc, np.frombuffer(b, dtype=np.uint8), out=acc)
        out = pdf.iloc[[0]].copy()
        out["bits"] = [acc.tobytes()]
        out["n_items"] = [int(pdf["n_items"].sum())]  # upper bound
        return out

    return (deltas.select(*[f.name for f in STORE_SCHEMA.fields])
            .groupBy("shard").applyInPandas(_or_all, STORE_SCHEMA))


def bloom_probe(df: DataFrame, store: DataFrame, *,
                fp_col: str = "fingerprint",
                out_col: str = "probably_seen",
                geometry: Tuple[int, int, int] | None = None) -> DataFrame:
    """Flag rows whose fingerprint is (probably) in the store.

    Cogroup on shard: each task gets one shard's probe rows + that
    shard's single bitset — the bitset never fans out row-wise (a
    shard with MULTIPLE store rows — a raw multi-delta layout — fails
    the task; reduce with :func:`or_reduce_bloom_stores` first).  Rows
    whose shard has no store row are exactly-unseen, and a NULL
    fingerprint probes False (NULL is never inserted).  Returns the
    slim ``(fp, probably_seen)`` pairs joined back onto ``df`` (the
    probe shuffle moves only 8·k-byte position arrays, never document
    text).  ``geometry``: pass the known ``(m, k, n_shards)`` to skip
    the discovery collect (which re-executes an un-checkpointed
    store's lineage).
    """
    geo = geometry if geometry is not None else _geometry(store)
    if geo is None:  # empty store: everything is exactly-unseen
        return df.withColumn(out_col, F.lit(False))
    m, k, n_shards = geo
    # NULL fingerprints skip the probe outright (they are never
    # inserted — see build_bloom_store); the left join below leaves
    # their flag NULL and the final coalesce answers False
    slim = (df.select(F.col(fp_col).alias("_fp"))
            .filter(F.col("_fp").isNotNull()).distinct()
            .select("_fp", _shard(F.col("_fp"), n_shards).alias("shard"),
                    _positions(F.col("_fp"), m, k).alias("positions")))
    out_schema = StructType([StructField("_fp", slim.schema["_fp"].dataType),
                             StructField(out_col, BooleanType())])

    def _probe(key, probes: pd.DataFrame, shard_rows: pd.DataFrame
               ) -> pd.DataFrame:
        if len(shard_rows) > 1:
            raise ValueError(
                f"bloom_probe: shard {key} has {len(shard_rows)} store "
                "rows (a multi-delta layout?) — reduce the store with "
                "or_reduce_bloom_stores first")
        if not len(probes):
            return pd.DataFrame({"_fp": [], out_col: []})
        if not len(shard_rows):
            return pd.DataFrame({"_fp": probes["_fp"],
                                 out_col: False})
        bits = np.frombuffer(shard_rows["bits"].iloc[0], dtype=np.uint8)
        pos = np.stack(probes["positions"].to_numpy()).astype(np.int64)
        hit = (bits[pos >> 3] & np.left_shift(1, pos & 7).astype(np.uint8)
               ) != 0
        return pd.DataFrame({"_fp": probes["_fp"],
                             out_col: hit.all(axis=1)})

    flags = (slim.groupBy("shard").cogroup(store.groupBy("shard"))
             .applyInPandas(_probe, out_schema))
    joined = df.join(flags.withColumnRenamed("_fp", fp_col),
                     fp_col, "left")
    # a NULL fingerprint never equi-joins its flag row back, which
    # would surface as a NULL flag that BOTH filter(col) and
    # filter(~col) silently drop — coalesce to the exact answer (a
    # NULL key is never inserted, so it is unseen by definition)
    return joined.withColumn(out_col,
                             F.coalesce(F.col(out_col), F.lit(False)))


def bloom_dedup_incremental(df: DataFrame, store: DataFrame | None, *,
                            text_col: str = "text", id_col: str = "doc_id",
                            n_shards: int = 64,
                            expected_per_shard: int = 100_000,
                            fpp: float = 0.01
                            ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The Bloom twin of ``dedup.exact_dedup_incremental``.

    Within-batch dedup stays EXACT (min-id per fingerprint — the batch
    is in hand, no reason to be approximate about it); only the
    history check is probabilistic.  ``store=None`` starts a fresh
    corpus with the given geometry (later increments inherit it).

    Returns ``(kept, delta_store, ledger)``:
    - ``kept``        — surviving new rows (original columns);
    - ``delta_store`` — merged store including this batch's survivors:
      REPLACES the persisted store (O(store) bytes, fixed size —
      unlike the ledger, it does not grow with the corpus);
    - ``ledger``      — (id, reject_reason): ``exact_dup_batch`` /
      ``bloom_probable_dup`` (wrong with probability ≤ fpp).

    NULL-text rows pass through untouched (the per-row-sentinel
    contract of the exact twin) and are never inserted in the store.
    """
    sentinel = F.concat(F.lit("\x00nulltext:"), F.col(id_col).cast("string"))
    fp = df.withColumn("fingerprint",
                       F.coalesce(X.fingerprint(F.col(text_col)), sentinel))
    mins = fp.groupBy("fingerprint").agg(F.min(id_col).alias("_keep_id"))
    tagged = fp.join(mins, "fingerprint")
    batch_dup = (tagged.filter(F.col(id_col) != F.col("_keep_id"))
                 .select(F.col(id_col).alias("id"),
                         F.lit("exact_dup_batch").alias("reject_reason")))
    heads = tagged.filter(F.col(id_col) == F.col("_keep_id")).drop("_keep_id")

    real = ~F.col("fingerprint").startswith("\x00nulltext:")
    # ONE geometry discovery per increment — probe, delta build, and
    # merge all reuse it (each _geometry collect re-executes an
    # un-checkpointed store's lineage; callers should still persist
    # the store they pass in, as increment jobs naturally do)
    geo = _geometry(store) if store is not None else None
    if store is not None:
        probed = bloom_probe(heads, store, geometry=geo)
        hist_dup = (probed.filter(real & F.col("probably_seen"))
                    .select(F.col(id_col).alias("id"),
                            F.lit("bloom_probable_dup")
                            .alias("reject_reason")))
        kept = (probed.filter(~real | ~F.col("probably_seen"))
                .drop("probably_seen"))
    else:
        hist_dup = heads.limit(0).select(
            F.col(id_col).alias("id"),
            F.lit("bloom_probable_dup").alias("reject_reason"))
        kept = heads
    # an existing store's geometry wins — a delta built under different
    # knobs could not merge (and silently changing m/k would corrupt
    # membership semantics)
    delta = build_bloom_store(kept.filter(real).select("fingerprint"),
                              n_shards=n_shards,
                              expected_per_shard=expected_per_shard,
                              fpp=fpp, _geometry_override=geo)
    if store is None or geo is None:
        new_store = delta
    else:
        new_store = merge_bloom_stores(store, delta, geometry=geo)
    return (kept.drop("fingerprint"), new_store,
            batch_dup.unionByName(hist_dup))
