"""Stateful streaming: gap sessionization (applyInPandasWithState) and
watermarked tumbling windows, driven through real micro-batches."""

import os
from datetime import datetime, timedelta

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from khl_pdf_ocr_spark.streaming.sessionize import (streaming_sessionize,
                                                    streaming_windowed_counts)

EVENTS_PA = pa.schema([
    ("event_id", pa.int64()), ("ts", pa.timestamp("us")), ("user_id", pa.int64()),
    ("event_type", pa.string()), ("value", pa.float64()), ("props", pa.string()),
])

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _write_events(path, rows):
    pq.write_table(pa.Table.from_pylist(
        [{"event_id": i, "ts": ts, "user_id": uid, "event_type": et,
          "value": 1.0, "props": "{}"}
         for i, (ts, uid, et) in enumerate(rows)], schema=EVENTS_PA), path)


@pytest.fixture()
def stream_dir(tmp_path):
    d = tmp_path / "events_in"
    d.mkdir()
    # batch 1: user 1 has two sessions separated by a 2h gap; user 2 one session
    _write_events(str(d / "b1.parquet"), [
        (T0, 1, "click"), (T0 + timedelta(minutes=5), 1, "click"),
        (T0 + timedelta(hours=2), 1, "click"),
        (T0, 2, "view"), (T0 + timedelta(minutes=10), 2, "view"),
    ])
    # batch 2: user 1 event far after → closes the 2h-session; plus a
    # LATE event for hour 0 arriving after the watermark passed — the
    # windowed agg must drop it (no update to the finalized window)
    _write_events(str(d / "b2.parquet"), [
        (T0 + timedelta(hours=6), 1, "click"),
        (T0 + timedelta(minutes=30), 9, "late"),
    ])
    return str(d)


def test_streaming_sessionize_emits_closed_sessions(spark, stream_dir, tmp_path):
    import time

    stream = (spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
        .option("maxFilesPerTrigger", "1").parquet(stream_dir))
    out = streaming_sessionize(stream, gap_sec=1800, idle_timeout_ms=5_000)
    q = (out.writeStream.format("memory").queryName("sessions")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    # state timeouts keep scheduling micro-batches, so the query may not
    # self-terminate — poll until the deterministic sessions appear
    deadline = time.time() + 120
    want = {(1, 2, T0), (1, 1, T0 + timedelta(hours=2))}
    got = set()
    while time.time() < deadline and not want.issubset(got):
        got = {(r["user_id"], r["n_events"], r["session_start"])
               for r in spark.sql("select * from sessions").collect()}
        time.sleep(2)
    q.stop()
    # closed by gap within batch 1: user 1's first session (2 events);
    # closed by batch 2's event: user 1's 1-event session at T0+2h
    assert want.issubset(got), got
    # no duplicate session emissions
    all_rows = spark.sql("select * from sessions").collect()
    assert len(all_rows) == len(set((r["user_id"], r["session_start"])
                                    for r in all_rows))


def test_streaming_windowed_counts_with_watermark(spark, tmp_path):
    """Two separate availableNow drains over a shared checkpoint: the
    watermark persists between runs, so run 2's late hour-0 event is
    unambiguously beyond-watermark and must be dropped."""
    in_dir = tmp_path / "wm_in"
    in_dir.mkdir()
    ckpt = str(tmp_path / "ckpt2")
    out_dir = str(tmp_path / "wm_out")

    def drain(_):
        stream = (spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string").parquet(str(in_dir)))
        out = streaming_windowed_counts(stream, window="1 hour",
                                        watermark="30 minutes")
        q = (out.writeStream.format("parquet").option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()

    _write_events(str(in_dir / "b1.parquet"), [
        (T0, 1, "click"), (T0 + timedelta(minutes=5), 1, "click"),
        (T0, 2, "view"), (T0 + timedelta(minutes=10), 2, "view"),
        (T0 + timedelta(hours=2), 1, "click"),
    ])
    drain("hourly1")
    # after run 1 the checkpointed watermark = T0+2h − 30min = T0+1.5h
    _write_events(str(in_dir / "b2.parquet"), [
        (T0 + timedelta(hours=6), 1, "click"),
        (T0 + timedelta(minutes=30), 9, "late"),  # beyond watermark → drop
    ])
    drain("hourly2")

    rows = {}
    for r in spark.read.parquet(out_dir).collect():
        key = (r["window_start"].hour, r["event_type"])
        rows[key] = rows.get(key, 0) + r["n_events"]
    assert rows.get((0, "click")) == 2
    assert rows.get((0, "view")) == 2
    assert rows.get((2, "click")) == 1  # finalized in run 2 (watermark 5.5h)
    assert not any(et == "late" for _, et in rows), rows
