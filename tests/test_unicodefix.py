"""Unicode fixing (operators/unicodefix.py): the mojibake-repair
kernel against an independently-constructed byte model, the Spark
``fix_unicode`` projection (schema, NULLs, control strip), DuckDB
``nfc_normalize`` oracle parity for the NFC layer, and the clean_cli
``--fix-unicode`` surface (dedup-before/after interaction + stats)."""

from __future__ import annotations

import random
import unicodedata

import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.operators.unicodefix import (_MOJIBAKE_RE,
                                                    _byte_char,
                                                    fix_mojibake_text,
                                                    fix_unicode,
                                                    strip_control_chars)


def sloppy_cp1252(bs: bytes) -> str:
    """Independent model of a wrong-codec read: per-byte cp1252 with
    latin-1 passthrough on the 5 holes — built here from the codec
    table, NOT from the operator's internals."""
    out = []
    for b in bs:
        try:
            out.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(b))
    return "".join(out)


# ---------------------------------------------------------------- kernel

def test_classic_mojibake_cases():
    assert fix_mojibake_text("CafÃ©") == "Café"
    assert fix_mojibake_text("donâ€™t") == "don’t"
    assert fix_mojibake_text("aÂ\xa0b") == "a\xa0b"          # nbsp
    ru = "Привет мир"
    assert fix_mojibake_text(sloppy_cp1252(ru.encode("utf-8"))) == ru


def test_double_encoded_resolves_to_fixpoint():
    s = "Café — ok"
    once = sloppy_cp1252(s.encode("utf-8"))
    twice = sloppy_cp1252(once.encode("utf-8"))
    assert fix_mojibake_text(once) == s
    assert fix_mojibake_text(twice) == s


def test_clean_text_untouched_beyond_nfc():
    for t in ["plain ascii", "ИВАНОВ Сергей +2 10 23 45", "naïve café — x",
              "Звено 1: Вратари С Р", "score 3:2 (1:0, 2:2)"]:
        assert fix_mojibake_text(t) == unicodedata.normalize("NFC", t)


def test_nfc_composition():
    decomposed = "é"                      # e + combining acute
    assert fix_mojibake_text(decomposed) == "é"


def test_null_and_idempotence():
    assert fix_mojibake_text(None) is None
    for t in ["CafÃ©", "donâ€™t", "", "Ã", "â€", "aÂ b", "x́y"]:
        once = fix_mojibake_text(t)
        assert fix_mojibake_text(once) == once


def test_ascii_space_after_lead_char_is_not_mojibake():
    # 'Â' + ASCII space = bytes C2 20, invalid UTF-8 — must stay as-is
    assert fix_mojibake_text("aÂ b") == "aÂ b"


def test_mixed_content_genuine_bullet_does_not_veto():
    out = fix_mojibake_text("• item one\nCafÃ© menu")
    assert out == "• item one\nCafé menu"


def test_seeded_fuzz_round_trip_vs_byte_model():
    """fix(sloppy(utf8(t))) == t for any t without its own mojibake
    signature — the repair inverts the wrong-codec read exactly."""
    random.seed(20260818)
    alpha = "abc ÀàÉé— •…«»Привет мир! 123\n\tÊ™"
    checked = 0
    for _ in range(400):
        t = unicodedata.normalize(
            "NFC", "".join(random.choice(alpha)
                           for _ in range(random.randint(1, 60))))
        got = fix_mojibake_text(sloppy_cp1252(t.encode("utf-8")))
        if _MOJIBAKE_RE.search(t):      # t itself looks mojibake'd —
            continue                    # un-repairing is out of scope
        assert got == t, repr((t, got))
        checked += 1
    # the alphabet is rich in U+00C2-F4 chars, so many samples carry a
    # (legitimate) signature and are skipped; keep a meaningful floor
    assert checked > 150


def test_byte_char_model_agreement():
    # the operator's byte table IS the codec table (incl. the 5 holes)
    for b in range(0x80, 0x100):
        assert _byte_char(b) == sloppy_cp1252(bytes([b]))


# ------------------------------------------------------------- DataFrame

def test_fix_unicode_frame(spark):
    rows = [(0, "CafÃ©"), (1, "donâ€™t stop"), (2, None),
            (3, "ok text"), (4, "ctl\x00here\x1f!"), (5, "é")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text"]
           for r in fix_unicode(df, text_col="text").collect()}
    assert out[0] == "Café"
    assert out[1] == "don’t stop"
    assert out[2] is None
    assert out[3] == "ok text"
    assert out[4] == "ctlhere!"          # C0 controls stripped
    assert out[5] == "é"            # NFC composed


def test_fix_unicode_out_col_preserves_original(spark):
    df = spark.createDataFrame([(0, "CafÃ©")], "doc_id long, text string")
    row = fix_unicode(df, text_col="text", out_col="fixed").first()
    assert row["text"] == "CafÃ©" and row["fixed"] == "Café"
    # schema: original columns + appended one, order preserved
    assert [f.name for f in fix_unicode(df, text_col="text",
                                        out_col="fixed").schema.fields] \
        == ["doc_id", "text", "fixed"]


def test_strip_control_chars_keeps_tab_lf_cr(spark):
    df = spark.createDataFrame([(0, "a\tb\nc\rd\x07e\x9ff")],
                               "doc_id long, text string")
    assert strip_control_chars(df).first()["text"] == "a\tb\nc\rdef"


def test_nfc_duckdb_oracle_parity(spark):
    """The NFC layer against DuckDB's independent nfc_normalize over
    signature-free strings (where fix_unicode IS plain NFC)."""
    duckdb = pytest.importorskip("duckdb")
    texts = ["éclair", "Ångström", "already-NFC é ø Å",
             "Приве́т", "mixed é and é", "ASCII only"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {r["doc_id"]: r["text"]
           for r in fix_unicode(df, text_col="text").collect()}
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want = con.execute("select nfc_normalize(?)", [t]).fetchone()[0]
        assert got[i] == want, (t, got[i], want)


def test_map_only_no_shuffle(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = fix_unicode(df, text_col="text")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


# ------------------------------------------------------------------ CLI

def test_clean_cli_fix_unicode_e2e(spark, tmp_path):
    """--fix-unicode runs FIRST: a mojibake'd twin of a clean doc must
    be caught by exact dedup (identical fingerprints after repair),
    and the stats line reports the fixed-row count."""
    import json
    import subprocess
    import sys

    clean = "the quick brown fox jumps café over the lazy dog " * 8
    moji = sloppy_cp1252(clean.encode("utf-8"))
    assert moji != clean
    # the mojibake twin gets the SMALLER id so exact dedup (keep-min-id)
    # keeps the repaired row — proving the repair happened pre-dedup and
    # landing unicode_fixed=1 in the kept output's stats
    rows = [(0, moji, "en", "s"), (1, clean, "en", "s"),
            (2, "another perfectly ordinary document body here " * 8,
             "en", "s")]
    df = spark.createDataFrame(rows, "doc_id long, text string, "
                                     "lang string, source string")
    inp = str(tmp_path / "in.parquet")
    df.write.parquet(inp)
    out = str(tmp_path / "out")
    res = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", inp, "--output", out, "--fix-unicode",
         "--min-quality", "0", "--cpus", "4"],
        capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-4000:]
    stats = json.loads(res.stdout.strip().splitlines()[-1])
    # the mojibake twin was repaired, then exact-dedup'd away
    assert stats["rejected"].get("exact_dup") == 1
    assert stats["unicode_fixed"] >= 1
    kept = spark.read.parquet(f"{out}/kept")
    texts = {r["doc_id"]: r["text"] for r in kept.collect()}
    assert 0 in texts or 1 in texts
    surviving = texts.get(0, texts.get(1))
    assert surviving == clean            # repaired byte-identical
