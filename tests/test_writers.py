"""Output-file sizing (sources/writers.py): estimation, sized writes,
skew guard, partitioned layout, and in-place compaction."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.sources.writers import (compact_parquet,
                                               estimate_bytes,
                                               write_sized_parquet)

pytestmark = pytest.mark.usefixtures("spark")

MB = 1024 * 1024


def _parts(path):
    return [f for f in glob.glob(os.path.join(path, "**", "*.parquet"),
                                 recursive=True)
            if not os.path.basename(f).startswith(("_", "."))]


def test_estimate_bytes_measures_text(spark):
    df = spark.createDataFrame(
        [(1, "a" * 100, b"\x00" * 50), (2, "b" * 300, None),
         (3, None, b"x")],
        "id long, text string, blob binary")
    raw, n = estimate_bytes(df)
    assert n == 3
    # 3 longs (24) + 400 text bytes + 51 blob bytes
    assert raw == 24 + 400 + 51
    raw_text, _ = estimate_bytes(df, cols=["text"])
    assert raw_text == 400
    with pytest.raises(ValueError, match="no columns"):
        estimate_bytes(df, cols=["nope"])


def test_estimate_bytes_arrays(spark):
    df = spark.createDataFrame(
        [(["ab", "cde"], [1.0, 2.0, 3.0]), (None, None)],
        "toks array<string>, emb array<double>")
    raw, n = estimate_bytes(df)
    assert n == 2
    assert raw == 5 + 3 * 8


def test_write_sized_splits_to_target(spark, tmp_path):
    # ~4 MB of raw text, 1 MB target, ratio 1.0 -> 4 files
    df = spark.range(400).select(
        F.col("id"), F.lit("x" * 10_000).alias("text"))
    out = str(tmp_path / "sized")
    stats = write_sized_parquet(df, out, target_mb=1,
                                compression_ratio=1.0)
    assert stats["n_files"] == 4 and not stats["capped"]
    assert len(_parts(out)) == 4
    back = spark.read.parquet(out)
    assert back.count() == 400
    assert back.agg(F.sum("id")).collect()[0][0] == sum(range(400))


def test_write_sized_precomputed_est_and_caps(spark, tmp_path):
    df = spark.range(100).select(F.col("id"),
                                 F.lit("y" * 1000).alias("text"))
    out = str(tmp_path / "capped")
    stats = write_sized_parquet(df, out, target_mb=1,
                                compression_ratio=1.0,
                                est=(100 * MB, 100), max_files=8)
    assert stats["capped"] and stats["n_files"] == 8
    assert len(_parts(out)) == 8
    with pytest.raises(ValueError, match="target_mb"):
        write_sized_parquet(df, out, target_mb=0)


def test_write_sized_records_guard_splits_skewed_tasks(spark, tmp_path):
    # force everything into 1 planned file but cap records/file: the
    # guard must split the oversized task output
    df = spark.range(1000).select(F.col("id"))
    out = str(tmp_path / "guarded")
    stats = write_sized_parquet(df, out, target_mb=1024,
                                compression_ratio=1.0, est=(1000, 1000))
    assert stats["n_files"] == 1
    per_file = (spark.read.parquet(out)
                .groupBy(F.input_file_name()).count().collect())
    assert all(r["count"] <= stats["max_records_per_file"]
               for r in per_file)


def test_write_sized_partitioned_layout(spark, tmp_path):
    df = spark.range(2000).select(
        F.col("id"), F.lit("z" * 1000).alias("text"),
        F.when(F.col("id") % 2 == 0, "train").otherwise("val")
        .alias("split"))
    out = str(tmp_path / "bysplit")
    stats = write_sized_parquet(df, out, target_mb=1,
                                compression_ratio=1.0,
                                partition_by=("split",),
                                n_partition_values=2)
    assert stats["n_files"] == 2
    assert os.path.isdir(os.path.join(out, "split=train"))
    assert os.path.isdir(os.path.join(out, "split=val"))
    # ~1 file per split directory (fpv = 1), not one per (task, value)
    for s in ("train", "val"):
        assert len(_parts(os.path.join(out, f"split={s}"))) == 1
    back = spark.read.parquet(out)
    assert back.count() == 2000
    assert back.filter("split = 'train'").count() == 1000
    with pytest.raises(ValueError, match="n_partition_values"):
        write_sized_parquet(df, out, partition_by=("split",))


def test_compact_merges_small_files_and_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "frag")
    df = spark.range(5000).select(F.col("id"),
                                  F.lit("w" * 200).alias("text"))
    df.repartition(64).write.parquet(out)
    assert len(_parts(out)) == 64
    total_before = df.count()
    sum_before = df.agg(F.sum("id")).collect()[0][0]
    stats = compact_parquet(spark, out, target_mb=64)
    assert stats["compacted"] and stats["n_files"] == 64
    assert len(_parts(out)) == stats["n_files_after"] == 1
    back = spark.read.parquet(out)
    assert back.count() == total_before
    assert back.agg(F.sum("id")).collect()[0][0] == sum_before
    assert not os.path.exists(out + "._compact_tmp")
    assert not os.path.exists(out + "._compact_old")
    again = compact_parquet(spark, out, target_mb=64)
    assert not again["compacted"] and again["reason"] == "<=1 file"


def test_compact_leaves_healthy_layout_alone(spark, tmp_path):
    out = str(tmp_path / "healthy")
    # ~4 MB of incompressible-ish hex across 2 files (~2 MB each);
    # at target 1 MB the rewrite would WIDEN the layout (n_target >=
    # n_files) — not compaction's business, left alone
    (spark.range(30_000)
     .select(F.sha2(F.col("id").cast("string"), 256).alias("h"))
     .repartition(2).write.parquet(out))
    before = sorted(_parts(out))
    stats = compact_parquet(spark, out, target_mb=1)
    assert not stats["compacted"] and stats["reason"] == "layout healthy"
    assert sorted(_parts(out)) == before


def test_compact_partitioned_preserves_dirs(spark, tmp_path):
    out = str(tmp_path / "part")
    df = spark.range(1000).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("split"))
    df.repartition(16).write.partitionBy("split").parquet(out)
    assert len(_parts(out)) == 32  # 16 tasks x 2 values
    stats = compact_parquet(spark, out, target_mb=64,
                            partition_by=("split",))
    assert stats["compacted"]
    assert os.path.isdir(os.path.join(out, "split=a"))
    assert os.path.isdir(os.path.join(out, "split=b"))
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert back.filter("split = 'a'").count() == 500


def _run_cli(mod, argv, timeout=300):
    import os
    import subprocess
    import sys
    p = subprocess.run(
        [sys.executable, "-m", mod, *argv],
        capture_output=True, text=True, timeout=timeout,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert p.returncode == 0, p.stderr[-2000:]
    import json
    return json.loads([ln for ln in p.stdout.splitlines()
                       if ln.startswith("{")][-1])


def test_extract_cli_target_file_mb(spark, tmp_path):
    docs = spark.createDataFrame(
        [(f"https://e{i}.example.com/", b"<html><body><p>"
          + (b"words of body text here " * 40) + b"</p></body></html>")
         for i in range(40)],
        "url string, html binary") \
        .withColumn("warc_ts", F.current_timestamp()) \
        .withColumn("text", F.lit(None).cast("string")) \
        .withColumn("lang", F.lit("en"))
    inp = str(tmp_path / "docs")
    docs.write.parquet(inp)
    out = str(tmp_path / "out")
    stats = _run_cli("khl_pdf_ocr_spark.cli",
                     ["--input", inp, "--output", out,
                      "--target-file-mb", "1", "--cpus", "4"])
    assert stats["file_layout"]["compacted"]
    assert len(_parts(os.path.join(out, "data"))) == 1
    assert spark.read.parquet(os.path.join(out, "data")).count() == 40


def test_clean_cli_target_file_mb(spark, tmp_path):
    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep green forest with friends")
    docs = spark.createDataFrame(
        [(i, f"{base} chapter {i} page {i * 7} line {i * 13}", "web")
         for i in range(200)],
        "doc_id long, text string, source string")
    inp = str(tmp_path / "docs")
    docs.write.parquet(inp)
    out = str(tmp_path / "cleaned")
    stats = _run_cli("khl_pdf_ocr_spark.clean_cli",
                     ["--input", inp, "--output", out,
                      "--langs", "en", "--min-quality", "0.1",
                      "--near-dup-threshold", "0.99",
                      "--split", "train=0.8,val=0.2",
                      "--target-file-mb", "1", "--cpus", "4"])
    fl = stats["file_layout"]
    # kept (many tiny task files across 2 split dirs) compacts; the
    # ledger's layout is reported either way (it may be empty/1-file)
    assert fl["kept"]["compacted"] and fl["kept"]["n_files"] >= 2
    assert "ledger" in fl
    kept = spark.read.parquet(f"{out}/kept")
    assert kept.count() == stats["n_kept"] > 100
    # split partition dirs survive the compaction
    assert os.path.isdir(os.path.join(out, "kept", "split=train"))
    assert os.path.isdir(os.path.join(out, "kept", "split=val"))
    assert "split" in kept.columns


def test_clean_cli_target_file_mb_rejects_iceberg(tmp_path):
    import subprocess
    import sys
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", "x", "--output", "y", "--format", "iceberg",
         "--target-file-mb", "64"],
        capture_output=True, text=True, timeout=60)
    assert p.returncode == 2
    assert "write.target-file-size-bytes" in p.stderr


def test_increment_cli_target_file_mb(spark, tmp_path):
    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep green forest with friends")
    inp1 = str(tmp_path / "day1")
    spark.createDataFrame(
        [(i, f"{base} chapter {i} page {i * 7} line {i * 13}", "web")
         for i in range(50)],
        "doc_id long, text string, source string").write.parquet(inp1)
    state = str(tmp_path / "state")
    stats = _run_cli("khl_pdf_ocr_spark.increment_cli",
                     ["--input", inp1, "--state", state,
                      "--output", str(tmp_path / "inc1"),
                      "--increment-id", "day1",
                      "--langs", "en", "--min-quality", "0.1",
                      "--near-dup-threshold", "0.99",
                      "--target-file-mb", "1", "--cpus", "4"])
    fl = stats["file_layout"]
    # wiring: outputs AND all four-or-fewer state stores report layout
    # telemetry (compaction physics is unit-tested above; a tiny run
    # may legitimately already be 1 file per dir -> no-op)
    for key in ("kept", "ledger", "fingerprints", "signatures"):
        assert "compacted" in fl[key] and "n_files" in fl[key]
    # the increment_id partition layout survives whatever compaction did
    assert os.path.isdir(os.path.join(state, "fingerprints",
                                      "increment_id=day1"))
    fp = spark.read.parquet(os.path.join(state, "fingerprints"))
    assert fp.count() == stats["state_fingerprints"] > 0
    assert set(r["increment_id"] for r in
               fp.select("increment_id").distinct().collect()) == {"day1"}
