"""Canonical schemas: pipeline input, extraction output, metrics.

The extraction output struct mirrors the reference's JSON response shape
(``app.py:356-363``; SURVEY.md §1.4) plus pipeline columns: the
byte-identity payload ``extracted_text``, the golden-diff ``result_json``,
error-envelope fields, and the size/lineage fields the scale machinery
keys on.
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import types as T

INPUT_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), True),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
])

MATCH_T = T.StructType([
    T.StructField("season", T.StringType(), True),
    T.StructField("uid", T.StringType(), True),
    T.StructField("date", T.StringType(), True),
    T.StructField("time_msk", T.StringType(), True),
    T.StructField("teams", T.StructType([
        T.StructField("home", T.StringType(), True),
        T.StructField("away", T.StringType(), True),
    ]), True),
])

GOALIE_T = T.StructType([
    T.StructField("name", T.StringType(), True),
    T.StructField("flag", T.StringType(), True),
])

EXTRACT_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("ok", T.BooleanType(), False),
    T.StructField("engine", T.StringType(), True),
    T.StructField("error", T.StringType(), True),
    T.StructField("detail", T.StringType(), True),
    T.StructField("extracted_text", T.StringType(), True),
    T.StructField("result_json", T.StringType(), True),
    T.StructField("match", MATCH_T, True),
    T.StructField("referees", T.StructType([
        T.StructField("main", T.ArrayType(T.StringType()), True),
        T.StructField("linesmen", T.ArrayType(T.StringType()), True),
    ]), True),
    T.StructField("goalies", T.StructType([
        T.StructField("home", T.ArrayType(GOALIE_T), True),
        T.StructField("away", T.ArrayType(GOALIE_T), True),
    ]), True),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("n_lines", T.IntegerType(), True),
    T.StructField("kernel_us", T.LongType(), True),
])

# Arrow twin of EXTRACT_SCHEMA (mapInArrow produces RecordBatches directly)
MATCH_PA = pa.struct([
    ("season", pa.string()), ("uid", pa.string()), ("date", pa.string()),
    ("time_msk", pa.string()),
    ("teams", pa.struct([("home", pa.string()), ("away", pa.string())])),
])
GOALIE_PA = pa.struct([("name", pa.string()), ("flag", pa.string())])
EXTRACT_PA = pa.schema([
    ("url", pa.string()),
    ("ok", pa.bool_()),
    ("engine", pa.string()),
    ("error", pa.string()),
    ("detail", pa.string()),
    ("extracted_text", pa.string()),
    ("result_json", pa.string()),
    ("match", MATCH_PA),
    ("referees", pa.struct([("main", pa.list_(pa.string())),
                            ("linesmen", pa.list_(pa.string()))])),
    ("goalies", pa.struct([("home", pa.list_(GOALIE_PA)),
                           ("away", pa.list_(GOALIE_PA))])),
    ("n_bytes", pa.int64()),
    ("n_lines", pa.int32()),
    ("kernel_us", pa.int64()),
])

# debug variants: + debug_json (the reference's debug=1 payload rendered
# as raw-UTF-8 JSON, app.py:364-365)
EXTRACT_SCHEMA_DEBUG = T.StructType(
    EXTRACT_SCHEMA.fields + [T.StructField("debug_json", T.StringType(), True)])
EXTRACT_PA_DEBUG = pa.schema(
    list(EXTRACT_PA) + [pa.field("debug_json", pa.string())])

METRICS_SCHEMA = T.StructType([
    T.StructField("run_id", T.StringType(), False),
    T.StructField("partition_id", T.IntegerType(), False),
    T.StructField("n_docs", T.LongType(), False),
    T.StructField("n_ok", T.LongType(), False),
    T.StructField("n_failed", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("kernel_s", T.DoubleType(), True),
    T.StructField("docs_per_sec", T.DoubleType(), True),
])
