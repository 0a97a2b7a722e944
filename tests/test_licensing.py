"""License-aware corpus construction (operators/licensing.py): tag
detection, the allow-list filter's NULL policy, and the clean_cli
--allow-licenses surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.operators.licensing import (filter_by_license,
                                                   license_tag,
                                                   with_license_tag)

PAGES = [
    (0, b'<a rel="license" href="https://creativecommons.org/'
        b'licenses/by/4.0/">CC BY</a>', "cc-by"),
    (1, b'<a href="http://creativecommons.org/licenses/by-nc-nd/3.0/">'
        b'x</a>', "cc-by-nc-nd"),
    (2, b'<a rel=license href="https://example.com/terms">terms</a>',
     "other-license"),
    (3, b'<a href="https://creativecommons.org/publicdomain/zero/1.0/">'
        b'CC0</a>', "cc0"),
    (4, b'<a href="https://CREATIVECOMMONS.ORG/publicdomain/mark/1.0/">'
        b'PD</a>', "public-domain-mark"),
    (5, b"<html><body>all rights reserved</body></html>", None),
    (6, None, None),
]


def test_license_tag_detection(spark):
    df = spark.createDataFrame([(i, h) for i, h, _ in PAGES],
                               "doc_id long, html binary")
    got = {r["doc_id"]: r["license"]
           for r in with_license_tag(df).collect()}
    assert got == {i: want for i, _, want in PAGES}


def test_filter_by_license_policies(spark):
    df = spark.createDataFrame(
        [(0, "cc-by"), (1, "cc-by-nc-nd"), (2, None), (3, "cc0")],
        "doc_id long, license string")
    kept, ledger = filter_by_license(df, ("cc-by", "cc0"))
    assert {r["doc_id"] for r in kept.collect()} == {0, 3}
    led = {(r["id"], r["reject_reason"]) for r in ledger.collect()}
    assert led == {(1, "license"), (2, "license")}   # NULL drops

    kept2, ledger2 = filter_by_license(df, ("cc-by", "cc0"),
                                       keep_untagged=True)
    assert {r["doc_id"] for r in kept2.collect()} == {0, 2, 3}
    assert {r["id"] for r in ledger2.collect()} == {1}
    # conservation under both policies
    assert kept.count() + ledger.count() == 4
    assert kept2.count() + ledger2.count() == 4

    with pytest.raises(ValueError, match="empty"):
        filter_by_license(df, ("", "  "))


def test_clean_cli_allow_licenses(spark, tmp_path):
    import json
    import os
    import subprocess
    import sys

    base = ("the quick brown fox jumps over the lazy dog and it was a "
            "good day for all of them in the field near the old house")
    html = {
        "cc-by": b'<a href="https://creativecommons.org/licenses/by/4.0/">l</a>',
        "cc0": b'<a href="https://creativecommons.org/publicdomain/zero/1.0/">l</a>',
        "cc-by-nc": b'<a href="https://creativecommons.org/licenses/by-nc/4.0/">l</a>',
        None: b"<p>no declaration</p>",
    }
    rows = [(i, base + f" extra {i}", "s", h)
            for i, h in enumerate(html.values())]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, html binary")
    inp = str(tmp_path / "docs")
    # tag at ingest, while the html is in hand (the operator's contract)
    with_license_tag(docs).drop("html").write.parquet(inp)

    out = str(tmp_path / "cleaned")
    cardp = str(tmp_path / "card.json")
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", inp, "--output", out,
         "--langs", "en", "--min-quality", "0.1",
         "--near-dup-threshold", "0.95",
         "--allow-licenses", "cc-by,cc0",
         "--datacard", cardp, "--cpus", "4"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    # cc-by-nc and the untagged page drop; cc-by + cc0 survive cleaning
    assert stats["rejected"].get("license") == 2
    assert stats["n_kept"] == 2
    kept = spark.read.parquet(f"{out}/kept")
    assert {r["license"] for r in kept.collect()} == {"cc-by", "cc0"}
    card = json.load(open(cardp))
    assert set(card["composition"]["license"]["groups"]) \
        == {"cc-by", "cc0"}
    assert card["funnel"]["rejected"]["license"]["docs"] == 2

    # --keep-untagged flips the NULL policy
    q = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", inp, "--output", str(tmp_path / "c2"),
         "--langs", "en", "--min-quality", "0.1",
         "--near-dup-threshold", "0.95",
         "--allow-licenses", "cc-by,cc0", "--keep-untagged",
         "--cpus", "4"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert q.returncode == 0, q.stderr[-2000:]
    qs = json.loads([ln for ln in q.stdout.splitlines()
                     if ln.startswith("{")][-1])
    assert qs["rejected"].get("license") == 1 and qs["n_kept"] == 3
    # flag pairing
    r = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", inp, "--output", str(tmp_path / "c3"),
         "--keep-untagged"],
        capture_output=True, text=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 2 and "allow-licenses" in r.stderr


def test_robots_noindex_detection_and_filter(spark):
    from khl_pdf_ocr_spark.operators.licensing import (filter_noindex,
                                                       robots_noindex)

    rows = [
        (0, b'<meta name="robots" content="noindex, nofollow">'),
        (1, b"<meta name=robots content=noindex>"),
        (2, b'<META NAME="ROBOTS" CONTENT="NOINDEX">'),
        (3, b'<meta content="noindex" name="robots">'),   # reversed
        (4, b'<meta name="robots" content="index, follow">'),
        (5, b'<meta name="viewport" content="noindex-lookalike">'),
        (6, b"<p>no meta at all</p>"),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html binary")
    got = {r["doc_id"]: r["f"]
           for r in df.select("doc_id",
                              robots_noindex(F.col("html")).alias("f"))
           .collect()}
    assert got == {0: True, 1: True, 2: True, 3: True,
                   4: False, 5: False, 6: False, 7: None}
    kept, ledger = filter_noindex(df)
    assert {r["doc_id"] for r in kept.collect()} == {4, 5, 6, 7}
    assert {(r["id"], r["reject_reason"]) for r in ledger.collect()} \
        == {(i, "robots_noindex") for i in (0, 1, 2, 3)}


def test_increment_cli_allow_licenses(spark, tmp_path):
    import json
    import os
    import subprocess
    import sys

    base = ("the quick brown fox jumps over the lazy dog and it was a "
            "good day for all of them in the field near the old house")
    rows = [(0, base + " alpha", "cc-by"), (1, base + " beta", "cc-by-nc"),
            (2, base + " gamma", None), (3, base + " delta", "cc0")]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string, license string") \
        .write.parquet(inp)
    out, state = str(tmp_path / "inc"), str(tmp_path / "state")
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.increment_cli",
         "--input", inp, "--state", state, "--output", out,
         "--increment-id", "d1", "--langs", "en", "--min-quality", "0.1",
         "--near-dup-threshold", "0.95",
         "--allow-licenses", "cc-by,cc0", "--cpus", "4"],
        capture_output=True, text=True, timeout=420,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert p.returncode == 0, p.stderr[-3000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["rejected"].get("license") == 2
    assert stats["n_kept"] == 2
    kept = spark.read.parquet(f"{out}/kept")
    assert {r["license"] for r in kept.collect()} == {"cc-by", "cc0"}
