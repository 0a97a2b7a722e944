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
    # batch 2: user 1 event far after → closes the 2h-session
    _write_events(str(d / "b2.parquet"), [
        (T0 + timedelta(hours=6), 1, "click"),
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


def test_streaming_windowed_counts_with_watermark(spark, stream_dir, tmp_path):
    stream = (spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
        .option("maxFilesPerTrigger", "1").parquet(stream_dir))
    out = streaming_windowed_counts(stream, window="1 hour", watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("hourly")
         .option("checkpointLocation", str(tmp_path / "ckpt2"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = {(r["window_start"].hour, r["event_type"]): r["n_events"]
            for r in spark.sql("select * from hourly").collect()}
    # hour 0 finalized once the watermark passed (batch 2 at T0+6h):
    assert rows.get((0, "click")) == 2
    assert rows.get((0, "view")) == 2
    assert rows.get((2, "click")) == 1
