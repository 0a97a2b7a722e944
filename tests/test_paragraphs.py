"""CCNet-style paragraph-level dedup: planted cross-doc/within-doc
cases, exemption rules, byte-identity when nothing is removed, a full
DuckDB oracle recomputation grouping by the literal normalized
paragraph string, the generator-shape plan assertion, and the
incremental (persisted hash store) twin."""

import duckdb
import pandas as pd

from khl_pdf_ocr_spark.operators.paragraphs import (
    paragraph_dedup, paragraph_dedup_incremental, paragraph_occurrences)

BANNER = "Accept cookies to continue reading."
FOOTER = "Copyright 2020 Example News Network"


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_cross_doc_paragraph_removed_from_later_doc_only(spark):
    df = _docs(spark, [
        (1, f"{BANNER}\nUnique story one about rivers."),
        (2, f"{BANNER}\nUnique story two about harbors."),
        (3, "No banner here at all today.")])
    out = {r["doc_id"]: r for r in paragraph_dedup(df).collect()}
    assert out[1]["text"] == f"{BANNER}\nUnique story one about rivers."
    assert out[2]["text"] == "Unique story two about harbors."
    assert out[3]["text"] == "No banner here at all today."
    assert out[1]["n_paras_removed"] == 0
    assert out[2]["n_paras_removed"] == 1


def test_normalized_match_case_and_punct_insensitive(spark):
    # CCNet hashes the NORMALIZED paragraph: case/punctuation variants
    # of the banner are the same paragraph
    df = _docs(spark, [(1, f"{BANNER}\nStory A text here."),
                       (2, "accept cookies to continue reading\nStory B.")])
    out = {r["doc_id"]: r["text"] for r in paragraph_dedup(df).collect()}
    assert out[1] == f"{BANNER}\nStory A text here."
    assert out[2] == "Story B."


def test_within_doc_repeat_second_occurrence_removed(spark):
    df = _docs(spark, [(1, f"Alpha beta gamma.\nMiddle part.\nAlpha, beta gamma")])
    out = paragraph_dedup(df).collect()[0]
    assert out["text"] == "Alpha beta gamma.\nMiddle part."
    assert (out["n_paras"], out["n_paras_removed"]) == (3, 1)


def test_blank_and_short_paragraphs_exempt(spark):
    # blank lines appear in every doc; they must all survive (structure
    # preserved), and with min_chars raised, short headers are exempt
    df = _docs(spark, [(1, "Intro\n\nBody text one here."),
                       (2, "Intro\n\nBody text two here.")])
    out = {r["doc_id"]: r["text"]
           for r in paragraph_dedup(df, min_chars=6).collect()}
    assert out[1] == "Intro\n\nBody text one here."
    assert out[2] == "Intro\n\nBody text two here."   # "Intro" exempt
    # default min_chars=1: "Intro" now dedups, blanks still exempt
    out1 = {r["doc_id"]: r["text"] for r in paragraph_dedup(df).collect()}
    assert out1[1] == "Intro\n\nBody text one here."
    assert out1[2] == "\nBody text two here."


def test_null_text_and_no_removal_byte_identity(spark):
    wild = "  leading spaces\n\ttab\tpara\n\n\ntrailing  "
    df = _docs(spark, [(1, wild), (2, None)])
    out = {r["doc_id"]: r for r in paragraph_dedup(df).collect()}
    assert out[1]["text"] == wild                  # untouched bit-for-bit
    assert out[2]["text"] is None
    assert (out[2]["n_paras"], out[2]["n_paras_removed"]) == (0, 0)


def test_full_duckdb_oracle_equality(spark):
    """Independent recomputation in DuckDB grouping by the literal
    normalized paragraph STRING (no shared hash function — the xxhash64
    collision assumption is checked, not assumed)."""
    stories = [f"Genuine article {i} body mentioning topic {i % 7} in detail."
               for i in range(40)]
    rows = []
    for i in range(40):
        parts = [BANNER, stories[i]]
        if i % 3 == 0:
            parts.append(FOOTER)
        if i % 5 == 0:
            parts.append(stories[(i + 10) % 40])   # cross-doc story dup
        rows.append((i, "\n".join(parts)))
    rows.append((98, None))
    rows.append((99, ""))
    df = _docs(spark, rows)
    got = {r["doc_id"]: (r["text"], r["n_paras"], r["n_paras_removed"])
           for r in paragraph_dedup(df).collect()}

    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    exp = con.execute(r"""
        WITH paras AS (
          SELECT doc_id, u.s['idx'] AS idx, u.s['p'] AS p,
                 trim(regexp_replace(regexp_replace(lower(u.s['p']),
                      '[.,!?;:]', '', 'g'), '\s+', ' ', 'g')) AS np
          FROM (SELECT doc_id,
                       unnest(list_transform(
                           string_split(text, chr(10)),
                           (p, i) -> struct_pack(idx := i - 1,
                                                 p := p))) AS s
                FROM docs WHERE text IS NOT NULL) u
        ), ranked AS (
          SELECT doc_id, idx,
                 row_number() OVER (PARTITION BY np
                                    ORDER BY doc_id, idx) AS rn
          FROM paras WHERE length(np) >= 1
        ), kept AS (
          SELECT pa.doc_id, pa.idx, pa.p
          FROM paras pa
          LEFT JOIN ranked r USING (doc_id, idx)
          WHERE r.rn IS NULL OR r.rn = 1
        )
        SELECT d.doc_id,
               CASE WHEN d.text IS NULL THEN NULL
                    ELSE coalesce((SELECT string_agg(p, chr(10)
                                                     ORDER BY idx)
                                   FROM kept k
                                   WHERE k.doc_id = d.doc_id), '') END AS text,
               CASE WHEN d.text IS NULL THEN 0
                    ELSE len(string_split(d.text, chr(10))) END AS n_paras,
               (SELECT count(*) FROM ranked r
                WHERE r.doc_id = d.doc_id AND r.rn > 1) AS n_removed
        FROM docs d
    """).fetchall()
    assert len(exp) == len(got)
    for doc_id, text, n_paras, n_removed in exp:
        g_text, g_n, g_rm = got[doc_id]
        assert g_text == text, f"doc {doc_id}"
        assert g_n == n_paras and g_rm == n_removed, f"doc {doc_id}"


def test_generator_emits_prehashed_structs_not_paragraph_text(spark):
    """The 100-TB shape assertion: paragraph hashing happens INSIDE the
    generator element — neither the paragraph array nor paragraph text
    crosses the Generate."""
    df = _docs(spark, [(1, "para one here\npara two here")])
    occ = paragraph_occurrences(df)
    plan = occ._jdf.queryExecution().optimizedPlan().toString()
    gen_lines = [ln for ln in plan.splitlines() if "Generate" in ln]
    assert len(gen_lines) == 1
    gen = gen_lines[0]
    assert "xxhash64(" in gen, (
        "paragraph hash must be computed inside the generator:\n" + gen)
    assert "split(" not in gen.rsplit("[", 1)[-1], gen


def _py_paragraph_dedup(rows, min_chars=1):
    """Independent pure-Python model: same winner rule, dict/set
    arithmetic, no Spark or DuckDB."""
    import re

    def norm(p):
        return re.sub(r"\s+", " ", re.sub(r"[.,!?;:]", "",
                                          p.lower())).strip()

    first = {}
    for doc_id, text in sorted(rows):
        if text is None:
            continue
        for i, p in enumerate(text.split("\n")):
            np_ = norm(p)
            if len(np_) >= min_chars and np_ not in first:
                first[np_] = (doc_id, i)
    out = {}
    for doc_id, text in rows:
        if text is None:
            out[doc_id] = (None, 0, 0)
            continue
        paras = text.split("\n")
        kept, rm = [], 0
        for i, p in enumerate(paras):
            np_ = norm(p)
            if len(np_) >= min_chars and first[np_] != (doc_id, i):
                rm += 1
            else:
                kept.append(p)
        out[doc_id] = ("\n".join(kept), len(paras), rm)
    return out


def test_seeded_fuzz_matches_python_model(spark):
    """200 random docs built from a small paragraph pool (high
    collision rate, random blanks/short lines/NULLs, 1-8 paras each):
    Spark output must equal the pure-Python model doc-for-doc."""
    import random

    rng = random.Random(1234)
    pool = [f"Sentence about topic {i} with words." for i in range(25)]
    pool += ["", " ", "x", "!!", "Short."]
    rows = []
    for d in range(200):
        if rng.random() < 0.03:
            rows.append((d, None))
            continue
        n = rng.randint(1, 8)
        rows.append((d, "\n".join(rng.choice(pool) for _ in range(n))))
    df = _docs(spark, rows)
    got = {r["doc_id"]: (r["text"], r["n_paras"], r["n_paras_removed"])
           for r in paragraph_dedup(df, min_chars=2).collect()}
    exp = _py_paragraph_dedup(rows, min_chars=2)
    assert got == exp


def test_paragraph_dedup_is_idempotent(spark):
    """After one pass every duplicate occurrence is gone, so a second
    pass over the rewritten corpus must be a byte-identical no-op with
    zero removals (the fuzz corpus gives a high collision rate)."""
    import random

    rng = random.Random(99)
    pool = [f"Sentence about topic {i} with words." for i in range(15)]
    rows = [(d, "\n".join(rng.choice(pool)
                          for _ in range(rng.randint(1, 6))))
            for d in range(80)]
    once = paragraph_dedup(_docs(spark, rows), min_chars=2) \
        .select("doc_id", "text")
    again = paragraph_dedup(once, min_chars=2).collect()
    first = {r["doc_id"]: r["text"] for r in once.collect()}
    for r in again:
        assert r["text"] == first[r["doc_id"]]
        assert r["n_paras_removed"] == 0


def test_long_fully_duplicated_doc_completes_quickly(spark):
    """2 x 50k-paragraph identical docs: every one of doc 2's
    paragraphs is removed.  The reassembly must be O(paras + removed)
    per doc (array_except hash-set), not O(paras x removed) — the
    naive membership filter would do 2.5e9 comparisons here."""
    n = 50_000
    doc = "\n".join(f"paragraph number {i} with some words" for i in range(n))
    df = _docs(spark, [(1, doc), (2, doc)])
    out = {r["doc_id"]: r for r in paragraph_dedup(df).collect()}
    assert out[1]["text"] == doc
    assert (out[1]["n_paras"], out[1]["n_paras_removed"]) == (n, 0)
    assert out[2]["text"] == ""
    assert (out[2]["n_paras"], out[2]["n_paras_removed"]) == (n, n)


def test_incremental_first_run_equals_batch(spark):
    df = _docs(spark, [(1, f"{BANNER}\nStory one."),
                       (2, f"{BANNER}\nStory two.")])
    batch = {r["doc_id"]: r["text"] for r in paragraph_dedup(df).collect()}
    res, new_h = paragraph_dedup_incremental(df, None)
    inc = {r["doc_id"]: r["text"] for r in res.collect()}
    assert inc == batch
    # store gains every surviving distinct paragraph
    assert new_h.count() == 3   # banner, story one, story two


def test_incremental_history_wins_over_batch_order(spark):
    day1 = _docs(spark, [(1, f"{BANNER}\nDay one story.")])
    _, h1 = paragraph_dedup_incremental(day1, None)
    store = h1.localCheckpoint()
    # day 2: doc 10 carries the banner FIRST in its batch — history
    # must still strip it from every occurrence
    day2 = _docs(spark, [(10, f"{BANNER}\nDay two story."),
                         (11, f"Fresh opener.\n{BANNER}")])
    res, h2 = paragraph_dedup_incremental(day2, store)
    out = {r["doc_id"]: r["text"] for r in res.collect()}
    assert out[10] == "Day two story."
    assert out[11] == "Fresh opener."
    # only genuinely-new paragraphs enter the store delta
    new = {r["h"] for r in h2.collect()}
    old = {r["h"] for r in store.collect()}
    assert new.isdisjoint(old)
    assert len(new) == 2    # "Day two story." + "Fresh opener."


def test_incremental_within_batch_dedup_still_applies(spark):
    day = _docs(spark, [(1, "Shared new para.\nUnique A."),
                        (2, "Shared new para.\nUnique B.")])
    res, _ = paragraph_dedup_incremental(day, None)
    out = {r["doc_id"]: r["text"] for r in res.collect()}
    assert out[1] == "Shared new para.\nUnique A."
    assert out[2] == "Unique B."
