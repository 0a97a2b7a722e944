"""Crawl-snapshot operators: URL revisit handling across crawls.

A Common-Crawl-style corpus captures the same url in MANY crawls
(distinct ``warc_ts``): roughly a quarter of each monthly crawl's
records are revisits of urls seen in earlier crawls, most of them
byte-identical recaptures.  The reference is a one-shot fetcher —
``http_get`` (app.py:61-64) pulls whichever bytes the server returns
at request time, so "the document for this url" implicitly means "the
newest capture".  At corpus scale that contract needs explicit
operators; these four are the standard snapshot policies:

* :func:`latest_snapshot` — the serving view: newest capture per url
  (what ``http_get`` would have fetched today).
* :func:`dedup_revisits` — one row per distinct ``(url, content)``:
  byte-identical recaptures are dropped (keeping the EARLIEST, the
  original publication), genuine content changes all survive.  This is
  the training-corpus policy — re-crawling a static page must not
  multiply its weight.
* :func:`revisit_stats` — the per-url capture/change profile
  (capture count, distinct versions, first/last seen, changed flag).
* :func:`crawl_diff` — url-level ``added / removed / changed /
  unchanged`` between two crawl snapshots (the incremental-ingest
  planning view: only ``added`` + ``changed`` need extraction).

Scale shape (the 100 TB story):

* Every operator is ONE hash shuffle on ``url`` (or on the 8-byte
  ``(url, content-hash)`` pair; the one exception is
  :func:`revisit_stats`' exact distinct-version count — see its
  docstring) expressed as ``groupBy().agg()`` with
  ``max_by``/``min_by``/``count`` — all map-side-partial aggregates,
  never a ``row_number`` window (a window must sort every capture
  inside the shuffle; ``max_by`` keeps ONE candidate row per url per
  map task before anything moves).  Common Crawl segments are
  url-sorted, so the map-side combine collapses most revisits before
  the exchange.
* Content equality is ``xxhash64`` of the payload column computed
  BEFORE any shuffle; :func:`crawl_diff` and :func:`revisit_stats`
  project to ``(url, hash, ts)`` first so document bytes never cross
  an exchange at all.  Only :func:`latest_snapshot` /
  :func:`dedup_revisits` move payload bytes — exactly once, because
  their OUTPUT is the payload.
* Per-url groups are capture counts (tens at most), so no skew
  defense is needed beyond AQE; there is no driver-side state.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _order_key(ts_col: str, tie_cols: Sequence[str]):
    """Capture-ordering key: timestamp, then caller tie-breakers.

    ``max_by``/``min_by`` on a struct compares lexicographically, so
    appending tie columns makes winner election deterministic even
    when two captures share a timestamp.
    """
    return F.struct(F.col(ts_col), *[F.col(c) for c in tie_cols])


def _unpack(grouped: DataFrame, row_col: str, cols: Sequence[str],
            extra: Sequence[str] = ()) -> DataFrame:
    sel = [F.col(f"{row_col}.{c}").alias(c) for c in cols]
    sel += [F.col(c) for c in extra]
    return grouped.select(*sel)


def latest_snapshot(df: DataFrame, url_col: str = "url",
                    ts_col: str = "warc_ts",
                    tie_cols: Sequence[str] = ()) -> DataFrame:
    """Newest capture per url — the serving view.

    One ``groupBy(url).agg(max_by(row, (ts, *tie_cols)))``: map-side
    partial keeps one candidate per url per task, the shuffle moves at
    most one payload row per (url, map task), and there is no sort.
    Output schema == input schema.
    """
    row = F.struct(*[F.col(c) for c in df.columns])
    grouped = (df.groupBy(url_col)
               .agg(F.max_by(row, _order_key(ts_col, tie_cols))
                    .alias("_row")))
    return _unpack(grouped, "_row", df.columns)


def dedup_revisits(df: DataFrame, url_col: str = "url",
                   ts_col: str = "warc_ts",
                   content_col: str = "html",
                   tie_cols: Sequence[str] = ()) -> DataFrame:
    """One row per distinct ``(url, content)`` — the corpus policy.

    Byte-identical recaptures collapse onto their EARLIEST capture
    (``min_by`` — the original publication date survives, so document
    age stays honest); every genuine content change is kept as its own
    row.  Adds ``n_dup_captures`` (long): how many captures collapsed
    into this row (1 = never recaptured identically).

    The group key is ``(url, xxhash64(content))`` — the hash is
    computed before the shuffle, and the only payload movement is the
    surviving row itself.
    """
    keyed = df.withColumn("_h", F.xxhash64(F.col(content_col)))
    row = F.struct(*[F.col(c) for c in df.columns])
    grouped = (keyed.groupBy(url_col, "_h")
               .agg(F.min_by(row, _order_key(ts_col, tie_cols))
                    .alias("_row"),
                    F.count(F.lit(1)).alias("n_dup_captures")))
    return _unpack(grouped, "_row", df.columns, extra=["n_dup_captures"])


def revisit_stats(df: DataFrame, url_col: str = "url",
                  ts_col: str = "warc_ts",
                  content_col: str = "html",
                  approx: bool = False) -> DataFrame:
    """Per-url capture/change profile.

    Returns one row per url: ``n_captures`` (long), ``n_versions``
    (long, distinct content hashes), ``first_ts`` / ``last_ts`` (the
    capture-timestamp range), and ``changed`` (boolean, content ever
    differed between captures).  Projects to ``(url, hash, ts)``
    before the shuffle — payload bytes never move.

    Shuffle cost: the exact distinct (default) is Spark's two-phase
    expansion — an exchange on ``(url, h)`` then on ``url``, both
    fed by map-side partials.  ``approx=True`` swaps in the HLL++
    sketch (``approx_count_distinct``, rsd 1 %): ONE exchange, the
    sketch merges map-side — the 10^12-row shape when ``changed``
    may tolerate sketch error near a version count of 1-2 boundary
    (it rarely can: prefer exact unless the profile is advisory).
    """
    slim = df.select(F.col(url_col).alias("url"),
                     F.col(ts_col).alias("ts"),
                     F.xxhash64(F.col(content_col)).alias("h"))
    nv = (F.approx_count_distinct("h", 0.01) if approx
          else F.count_distinct("h"))
    return (slim.groupBy("url")
            .agg(F.count(F.lit(1)).alias("n_captures"),
                 nv.alias("n_versions"),
                 F.min("ts").alias("first_ts"),
                 F.max("ts").alias("last_ts"))
            .withColumn("changed", F.col("n_versions") > 1))


def crawl_diff(old: DataFrame, new: DataFrame, url_col: str = "url",
               ts_col: str = "warc_ts",
               content_col: str = "html") -> DataFrame:
    """Url-level diff between two crawl snapshots.

    Each side is first reduced to its newest capture's content hash
    per url (same ``max_by`` shape as :func:`latest_snapshot`, but on
    the ``(url, ts, hash)`` projection — no payload moves), then a
    single full-outer equi-join on url labels every url:

    * ``added`` — in ``new`` only (extract it),
    * ``removed`` — in ``old`` only,
    * ``changed`` — in both, newest content differs (re-extract),
    * ``unchanged`` — in both, newest content identical (skip).

    Returns ``(url, status, old_ts, new_ts)`` — the incremental-ingest
    work list is ``status IN ('added', 'changed')``.
    """
    def newest(df: DataFrame, pfx: str) -> DataFrame:
        slim = df.select(F.col(url_col).alias("url"),
                         F.col(ts_col).alias("ts"),
                         F.xxhash64(F.col(content_col)).alias("h"))
        picked = F.max_by(F.struct("ts", "h"), F.struct("ts", "h"))
        return (slim.groupBy("url").agg(picked.alias("_r"))
                .select("url", F.col("_r.ts").alias(f"{pfx}_ts"),
                        F.col("_r.h").alias(f"{pfx}_h")))

    o, n = newest(old, "old"), newest(new, "new")
    joined = o.join(n, "url", "full_outer")
    status = (F.when(F.col("old_h").isNull(), F.lit("added"))
              .when(F.col("new_h").isNull(), F.lit("removed"))
              .when(F.col("old_h") != F.col("new_h"), F.lit("changed"))
              .otherwise(F.lit("unchanged")))
    return joined.select("url", status.alias("status"),
                         "old_ts", "new_ts")
