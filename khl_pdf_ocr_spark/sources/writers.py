"""Output-file sizing — the small-files defense for 100 TB outputs.

The reference writes nothing (app.py:376-419 returns JSON per request);
a cluster pipeline's outputs live or die by their file layout: a
1000-executor job that writes one file per task floods the namenode /
object store with KB-sized parquet (every downstream scan pays a
per-file open), while one giant file serializes downstream reads.
Production Spark practice targets a fixed file size (Iceberg's
``write.target-file-size-bytes`` table property is the same knob —
used natively when the Iceberg runtime is on the classpath; this
module is the parquet-path twin).

Two entry points:

* ``write_sized_parquet`` — size the write AT write time: estimate the
  frame's raw bytes with one column-pruned aggregation pass
  (``estimate_bytes``), derive the file count from a disclosed
  raw→parquet compression ratio, round-robin ``repartition`` to that
  width, and bound stragglers with ``maxRecordsPerFile`` (a skewed
  task splits its output instead of writing one oversized file).
  NOTE the estimation pass re-evaluates the frame's plan — persist an
  expensive frame first, or pass a precomputed ``est=(bytes, rows)``
  (the CLIs pass the counts they already materialized).
* ``compact_parquet`` — fix the layout AFTER the fact from the files'
  true on-disk sizes (no compression guess): list via the Hadoop
  FileSystem API (works on hdfs:// and s3a:// URIs, not just local
  paths), skip when the layout is already healthy, otherwise rewrite
  at the target width and swap directories.  The swap is two FS
  renames — atomic per rename on HDFS/local, NOT atomic on object
  stores (a reader racing the swap can see a missing directory; run
  compaction when the table is quiescent, the same operational rule
  Iceberg's rewrite-data-files action documents).

Scale shape: the estimation aggregate prunes to exactly the measured
columns; the repartition is ONE round-robin shuffle of the output rows
(unavoidable — file sizing IS a data-placement decision); compaction
reads footer-listed bytes only to DECIDE, and moves data only when it
rewrites.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["estimate_bytes", "write_sized_parquet", "compact_parquet"]

_MB = 1024 * 1024

# fixed-width in-memory estimates per atomic type (bytes/value);
# variable-width types are measured, not guessed
_FIXED = {T.BooleanType: 1, T.ByteType: 1, T.ShortType: 2,
          T.IntegerType: 4, T.FloatType: 4, T.DateType: 4,
          T.LongType: 8, T.DoubleType: 8, T.TimestampType: 8,
          T.TimestampNTZType: 8}


def _bytes_expr(field: T.StructField):
    """Per-row byte estimate for one column — pure codegen."""
    c = F.col(field.name)
    dt = field.dataType
    if isinstance(dt, (T.StringType, T.BinaryType)):
        return F.coalesce(F.octet_length(c).cast("long"), F.lit(0))
    if isinstance(dt, T.DecimalType):
        return F.when(c.isNull(), F.lit(0)).otherwise(F.lit(16)).cast("long")
    if type(dt) in _FIXED:
        w = _FIXED[type(dt)]
        return F.when(c.isNull(), F.lit(0)).otherwise(F.lit(w)).cast("long")
    if isinstance(dt, T.ArrayType):
        el = dt.elementType
        if isinstance(el, (T.StringType, T.BinaryType)):
            return F.coalesce(
                F.aggregate(c, F.lit(0).cast("long"),
                            lambda acc, x: acc + F.coalesce(
                                F.octet_length(x).cast("long"), F.lit(0))),
                F.lit(0))
        w = _FIXED.get(type(el), 16)
        return (F.coalesce(F.size(c), F.lit(0)).cast("long") * w)
    # struct/map/nested-array fallback: a disclosed flat guess — the
    # caller with a dominant nested column should pass est= instead
    return F.when(c.isNull(), F.lit(0)).otherwise(F.lit(32)).cast("long")


def estimate_bytes(df: DataFrame, *, cols: list[str] | None = None
                   ) -> tuple[int, int]:
    """One aggregation pass → ``(raw_bytes, n_rows)``.

    Variable-width columns (string/binary, arrays of them) are measured
    with ``octet_length``; fixed-width types use their storage width;
    nested fallbacks are disclosed in ``_bytes_expr``.  ``cols`` limits
    the measurement (and the scan, via column pruning) to a subset —
    useful when one text column dominates and the rest is noise.
    """
    fields = [f for f in df.schema.fields
              if cols is None or f.name in cols]
    if not fields:
        raise ValueError("estimate_bytes: no columns to measure")
    row = sum((_bytes_expr(f) for f in fields[1:]), _bytes_expr(fields[0]))
    r = df.select(F.sum(row).alias("b"),
                  F.count(F.lit(1)).alias("n")).collect()[0]
    return int(r["b"] or 0), int(r["n"])


def write_sized_parquet(df: DataFrame, path: str, *,
                        target_mb: int = 128,
                        compression_ratio: float = 0.4,
                        mode: str = "overwrite",
                        partition_by: tuple[str, ...] = (),
                        n_partition_values: int | None = None,
                        est: tuple[int, int] | None = None,
                        min_files: int = 1,
                        max_files: int = 100_000) -> dict:
    """Write ``df`` as parquet files of roughly ``target_mb`` each.

    ``est=(raw_bytes, n_rows)`` skips the estimation pass (pass the
    counts a CLI already materialized); otherwise ``estimate_bytes``
    runs — persist an expensive plan first.  ``compression_ratio`` is
    the disclosed raw→parquet guess (0.4 ≈ snappy on web text: 0.361
    documents / 0.347 events measured, BENCH.md §4.24); compaction
    afterwards corrects any drift from true sizes.

    With ``partition_by``, rows are co-located by (partition columns,
    content-hash salt bounded to files-per-value) so each partition
    directory gets ~its byte share of files instead of one file per
    (task × value); ``n_partition_values`` (the expected distinct
    partition-tuple count, e.g. ``len(split_weights)``) is required —
    counting it here would re-run the plan.

    Returns layout telemetry (no silent caps: hitting ``max_files``
    is reported in the dict, not swallowed).
    """
    if target_mb < 1:
        raise ValueError(f"target_mb must be >= 1, got {target_mb}")
    if partition_by and not n_partition_values:
        raise ValueError("partition_by requires n_partition_values "
                         "(counting distinct values here would re-run "
                         "the plan)")
    raw_bytes, n_rows = est if est is not None else estimate_bytes(df)
    out_bytes = raw_bytes * compression_ratio
    want = max(min_files, math.ceil(out_bytes / (target_mb * _MB)) or 1)
    n_files = min(want, max_files)
    rows_per_file = max(1, math.ceil(n_rows / n_files)) if n_rows else 1
    # 1.5x headroom: maxRecordsPerFile is the SKEW guard, not the
    # sizing mechanism — it only splits a task's output when round-
    # robin placement failed badly
    guard = int(rows_per_file * 1.5) or 1
    if partition_by:
        fpv = max(1, math.ceil(n_files / n_partition_values))
        rest = [c for c in df.columns if c not in partition_by]
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in rest]),
                      F.lit(fpv)) if rest else F.lit(0)
        out = df.repartition(n_files,
                             *[F.col(c) for c in partition_by], salt)
        (out.write.mode(mode).option("maxRecordsPerFile", guard)
         .partitionBy(*partition_by).parquet(path))
    else:
        (df.repartition(n_files).write.mode(mode)
         .option("maxRecordsPerFile", guard).parquet(path))
    return {"est_raw_bytes": raw_bytes, "n_rows": n_rows,
            "target_mb": target_mb, "n_files": n_files,
            "max_records_per_file": guard,
            "capped": want > max_files}


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, p, jvm


def _list_parquet_files(fs, p) -> list[tuple[str, int]]:
    out: list[tuple[str, int]] = []
    it = fs.listFiles(p, True)  # recursive
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            out.append((st.getPath().toString(), int(st.getLen())))
    return out


def compact_parquet(spark: SparkSession, path: str, *,
                    target_mb: int = 128,
                    small_fraction: float = 0.5,
                    partition_by: tuple[str, ...] = ()) -> dict:
    """Rewrite ``path`` in place when its average parquet file is
    smaller than ``small_fraction * target_mb`` — the post-hoc layout
    fix for accumulated small files (e.g. many daily increments).

    Decides from TRUE on-disk sizes (Hadoop FS listing — footer bytes
    only, no data read); healthy layouts return ``compacted=False``
    without touching data, so calling it after every increment is
    cheap.  The rewrite targets ``ceil(total / target)`` files and
    swaps directories with two FS renames (see module docstring for
    the object-store atomicity caveat).  ``partition_by`` re-applies
    partition columns that ``spark.read.parquet`` recovers from the
    directory layout (they must be re-declared on write or the dirs
    collapse).
    """
    if target_mb < 1:
        raise ValueError(f"target_mb must be >= 1, got {target_mb}")
    fs, p, jvm = _fs_and_path(spark, path)
    files = _list_parquet_files(fs, p)
    total = sum(b for _, b in files)
    stats = {"path": path, "n_files": len(files), "total_bytes": total,
             "target_mb": target_mb}
    if len(files) <= 1:
        return {**stats, "compacted": False, "reason": "<=1 file"}
    n_target = max(1, math.ceil(total / (target_mb * _MB)))
    if (total / len(files) >= small_fraction * target_mb * _MB
            or n_target >= len(files)):
        return {**stats, "compacted": False, "reason": "layout healthy"}
    df = spark.read.parquet(path).repartition(n_target)
    tmp = jvm.org.apache.hadoop.fs.Path(
        p.getParent(), p.getName() + "._compact_tmp")
    old = jvm.org.apache.hadoop.fs.Path(
        p.getParent(), p.getName() + "._compact_old")
    if fs.exists(tmp):
        fs.delete(tmp, True)  # crashed prior attempt — tmp is garbage
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp.toString())
    # swap: old data stays intact until the new layout fully exists
    if not fs.rename(p, old):
        raise IOError(f"compact_parquet: rename {path} -> {old} failed")
    if not fs.rename(tmp, p):
        fs.rename(old, p)  # roll back — original layout restored
        raise IOError(f"compact_parquet: rename {tmp} -> {path} failed "
                      "(original restored)")
    fs.delete(old, True)
    return {**stats, "compacted": True, "n_files_after": n_target}
