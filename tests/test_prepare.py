"""Training-data preparation operators (operators/prepare.py)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.operators.prepare import (chunk_documents, hash_split,
                                                 redact_pii,
                                                 repetition_filter,
                                                 repetition_stats)

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


def test_chunk_documents_matches_duckdb(docs):
    """Full-corpus equality against an independent DuckDB list-slicing
    implementation (the pytest-level oracle discipline)."""
    got = (chunk_documents(docs, max_tokens=50, overlap=10)
           .orderBy("doc_id", "chunk_id").toPandas())
    want = duckdb.sql(f"""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
          FROM read_parquet('{DOCS}')
          WHERE text IS NOT NULL AND length(trim(text)) > 0
        ), counted AS (
          SELECT doc_id, t,
                 CASE WHEN len(t) <= 50 THEN 1
                      ELSE ceil((len(t) - 50) / 40.0)::int + 1 END AS nc
          FROM toks
        )
        SELECT doc_id, k AS chunk_id,
               array_to_string(t[k*40 + 1 : k*40 + 50], ' ') AS chunk_text,
               len(t[k*40 + 1 : k*40 + 50]) AS n_tokens
        FROM counted, unnest(generate_series(0, nc - 1)) AS u(k)
        ORDER BY doc_id, chunk_id
    """).df()
    assert len(got) == len(want) > 0
    assert got["chunk_text"].tolist() == want["chunk_text"].tolist()
    assert got["n_tokens"].tolist() == want["n_tokens"].tolist()


def test_chunk_documents_shapes(spark):
    rows = [(1, " ".join(f"w{i}" for i in range(130))),  # 130 tokens
            (2, "short doc"),
            (3, None), (4, "   "), (5, "\n\t \n"),   # whitespace-only
            (6, "\n\nleading newlines here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {(r["doc_id"], r["chunk_id"]): r for r in
           chunk_documents(df, max_tokens=64, overlap=16).collect()}
    # 130 tokens, stride 48: chunks at 0,48,96 → 3 chunks; doc 5 is
    # whitespace-only (newlines/tabs — NOT just spaces) → zero chunks;
    # doc 6's leading newlines must not create a phantom empty token
    assert {k for k in out} == {(1, 0), (1, 1), (1, 2), (2, 0), (6, 0)}
    assert out[(6, 0)]["chunk_text"] == "leading newlines here"
    assert out[(6, 0)]["n_tokens"] == 3
    assert out[(1, 0)]["n_tokens"] == 64
    assert out[(1, 2)]["n_tokens"] == 130 - 96
    assert out[(1, 0)]["chunk_text"].split()[0] == "w0"
    assert out[(1, 1)]["chunk_text"].split()[0] == "w48"  # overlap honored
    assert out[(2, 0)]["chunk_text"] == "short doc"
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=10, overlap=10)


def test_chunk_documents_long_doc_shape(spark):
    """The 100-TB shape assertion (r4 verdict #1, amended by r6 change
    #15): a book-length doc must never materialize O(tokens × chunks)
    bytes.  The r6 form explodes only the tiny chunk-id sequence and
    slices ABOVE the Generate, inside the same codegen stage, where the
    carried token array is a per-input-row reference — measured 48×
    faster than the r4 in-generator transform on this very doc (0.59 s
    vs 28.3 s) with identical rows.  Zero Exchanges in the plan is the
    no-serialization evidence: nothing wide ever leaves the stage.
    """
    import math

    n_tok = 200_000
    doc = " ".join(f"t{i}" for i in range(n_tok))
    df = spark.createDataFrame([(1, doc)], ["doc_id", "text"])
    out = chunk_documents(df, max_tokens=512, overlap=64)

    # plan shape: the generator emits chunk ids only (no transform
    # lambda, no struct build); slice/concat_ws sit above it and the
    # pipeline holds no Exchange, so the carried array never serializes
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    gen_lines = [ln for ln in plan.splitlines() if "Generate" in ln]
    assert len(gen_lines) == 1
    assert "transform(" not in gen_lines[0], gen_lines[0]
    assert "slice(" not in gen_lines[0], (
        "slicing must happen above the generator now:\n" + gen_lines[0])
    assert "slice(" in plan and "concat_ws(" in plan
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in phys, phys

    # functional: correct chunk count + per-chunk token accounting on
    # the long doc (completes in seconds; the quadratic form would
    # churn through ~90 GB of array copies here)
    stride = 512 - 64
    n_chunks = math.ceil((n_tok - 512) / stride) + 1
    agg = out.agg(F.count(F.lit(1)).alias("c"),
                  F.sum("n_tokens").alias("s")).collect()[0]
    assert agg["c"] == n_chunks
    last = n_tok - (n_chunks - 1) * stride
    assert agg["s"] == (n_chunks - 1) * 512 + last
    first, second = (out.orderBy("chunk_id").limit(2)
                     .select("chunk_text").collect())
    assert first["chunk_text"].split()[0] == "t0"
    assert second["chunk_text"].split()[0] == f"t{stride}"


def test_redact_pii_planted(spark):
    df = spark.createDataFrame(
        [(1, "write to john.doe+x@example.co.uk or call +7 (495) 123-45-67"),
         (2, "server at 192.168.0.1 responded"),
         (3, "no pii here at all"),
         (4, None)],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[1]["text_redacted"] == "write to <EMAIL> or call <PHONE>"
    assert out[1]["n_pii_email"] == 1 and out[1]["n_pii_phone"] == 1
    assert out[2]["text_redacted"] == "server at <IP> responded"
    assert out[2]["n_pii_ipv4"] == 1
    assert out[3]["text_redacted"] == "no pii here at all"
    assert out[3]["n_pii_email"] == 0
    assert out[4]["text_redacted"] is None  # NULL passes through
    # original column untouched
    assert out[1]["text"].startswith("write to john.doe")


def test_redact_pii_leaves_dates_and_numeric_tables(spark):
    """The phone pattern requires an explicit marker (+ or a
    parenthesized area code): ISO dates and numeric stat runs —
    pervasive in this corpus — must survive in-place redaction
    (r4 review finding)."""
    df = spark.createDataFrame(
        [(1, "released on 2024-05-06 in build 10 20 30 40 50"),
         (2, "score line 12-34-56-78-90 stays"),
         (3, "call (495) 123-45-67 or +7 495 1234567")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[1]["text_redacted"] == out[1]["text"]
    assert out[1]["n_pii_phone"] == 0
    assert out[2]["text_redacted"] == out[2]["text"]
    assert out[3]["n_pii_phone"] == 2
    assert out[3]["text_redacted"] == "call <PHONE> or <PHONE>"


def test_redact_pii_leaves_plus_minus_stat_rows(spark):
    """A leading + is ALSO the plus-minus marker of hockey stat rows —
    the phone pattern must demand phone-like grouping (a 3-5 digit
    area code after the country code), not any +-prefixed digit run,
    or game-sheet stat lines are shredded corpus-wide when
    --redact-pii rewrites in place (r4 ADVICE, medium)."""
    df = spark.createDataFrame(
        [(1, "IVANOV +2 10 23 45 67 89"),          # plus-minus +2
         (2, "PETROV +10 5 12 34 56 78 90 12"),    # double-digit +/-
         (3, "stats +3 21-43-65 and a real +7 (812) 555-12-34 after")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[1]["text_redacted"] == out[1]["text"]
    assert out[1]["n_pii_phone"] == 0
    assert out[2]["text_redacted"] == out[2]["text"]
    assert out[2]["n_pii_phone"] == 0
    # the stat prefix survives while the genuine phone is redacted
    assert out[3]["text_redacted"] == "stats +3 21-43-65 and a real <PHONE> after"
    assert out[3]["n_pii_phone"] == 1


def test_repetition_stats_hand_checked(spark):
    df = spark.createDataFrame(
        [(1, "a b\na b\nc d"),                     # 3 lines, 1 dup
         (2, "buy now buy now buy now"),           # top 2-gram 'buy now' x3 of 5
         (3, "all distinct lines\nno repeats here"),
         (4, "solo")],                             # <2 tokens
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert out[1]["n_lines"] == 3
    assert out[1]["dup_line_fraction"] == pytest.approx(1 - 2 / 3)
    assert out[2]["top_2gram_fraction"] == pytest.approx(3 / 5)
    assert out[3]["dup_line_fraction"] == 0.0
    assert out[4]["top_2gram_fraction"] == 0.0


def test_repetition_filter_split(spark):
    df = spark.createDataFrame(
        [(1, "x y\nx y\nx y\nx y"),        # dup lines → rep_lines
         (2, "spam spam spam spam spam"),  # top 2-gram 4/4 → rep_2gram
         (3, "a perfectly normal sentence with varied words")],
        ["doc_id", "text"])
    kept, ledger = repetition_filter(df)
    assert {r["doc_id"] for r in kept.collect()} == {3}
    reasons = {r["id"]: r["reject_reason"] for r in ledger.collect()}
    assert reasons == {1: "rep_lines", 2: "rep_2gram"}
    assert kept.columns == df.columns  # no stat columns leak


def test_hash_split_deterministic_and_proportioned(spark):
    df = spark.range(20_000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, weights={"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 20_000 - 0.8) < 0.02
    assert abs(counts["val"] / 20_000 - 0.1) < 0.01
    # deterministic across runs AND partitionings
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {r["doc_id"]: r["split"] for r in
         hash_split(df.repartition(17), weights={"train": 0.8, "val": 0.1,
                                                 "test": 0.1}).collect()}
    assert a == b
    # different seed → different assignment (not a constant function)
    c = {r["doc_id"]: r["split"] for r in
         hash_split(df, weights={"train": 0.8, "val": 0.1, "test": 0.1},
                    seed=99).collect()}
    assert a != c
    with pytest.raises(ValueError):
        hash_split(df, weights={"train": 0.5, "val": 0.1})


def test_chunk_then_split_compose(docs):
    """Pipeline shape: chunk → hash_split on the PARENT doc id keeps
    every chunk of one document in the same split (no train/val leak
    through overlapping chunks)."""
    chunks = chunk_documents(docs, max_tokens=40, overlap=8)
    split = hash_split(chunks, id_col="doc_id",
                       weights={"train": 0.9, "val": 0.1})
    leak = (split.groupBy("doc_id")
            .agg(F.countDistinct("split").alias("k"))
            .filter(F.col("k") > 1).count())
    assert leak == 0


def test_pack_sequences_ffd_invariants(docs, spark):
    from pyspark.sql.utils import PythonException

    from khl_pdf_ocr_spark.operators.prepare import (chunk_documents,
                                                     pack_sequences)

    chunks = chunk_documents(docs, max_tokens=48, overlap=8)
    packed = pack_sequences(chunks, capacity=128, n_buckets=16).cache()
    try:
        # every chunk assigned exactly once
        assert packed.count() == chunks.count() > 0
        assert packed.select("doc_id", "chunk_id").distinct().count() \
            == chunks.count()
        loads = (packed.groupBy("pack_id")
                 .agg(F.sum("n_tokens").alias("load")).cache())
        assert loads.filter(F.col("load") > 128).count() == 0
        # FFD guarantee: ≤1 pack per bucket ends at most half full
        half = (loads.withColumn("bucket",
                                 (F.col("pack_id") / (1 << 32)).cast("long"))
                .filter(F.col("load") <= 64)
                .groupBy("bucket").agg(F.count(F.lit(1)).alias("k")))
        assert half.filter(F.col("k") > 1).count() == 0
        # all chunks of one doc share a bucket (co-packable)
        spread = (packed.withColumn("bucket",
                                    (F.col("pack_id") / (1 << 32)).cast("long"))
                  .groupBy("doc_id")
                  .agg(F.countDistinct("bucket").alias("nb"))
                  .filter(F.col("nb") > 1).count())
        assert spread == 0
        # deterministic across input partitioning
        a = {(r["doc_id"], r["chunk_id"]): r["pack_id"]
             for r in packed.collect()}
        b = {(r["doc_id"], r["chunk_id"]): r["pack_id"]
             for r in pack_sequences(chunks.repartition(13), capacity=128,
                                     n_buckets=16).collect()}
        assert a == b
    finally:
        packed.unpersist()

    # oversized chunk → loud failure, never silent truncation
    big = chunk_documents(docs, max_tokens=48, overlap=8)
    with pytest.raises(PythonException, match="exceeds pack capacity"):
        pack_sequences(big, capacity=32).count()


def test_pack_sequences_corpus_scaled_buckets(spark):
    """Default bucket count scales with the CORPUS, not the cluster
    (r4 verdict #6): at fixed cluster width, buckets must stay bounded
    at ~max_bucket_rows as the data grows, or FFD's first-fit scan
    (O(chunks x open packs) per bucket) balloons.  audit surfaces the
    chosen n_buckets so run telemetry shows it."""
    from khl_pdf_ocr_spark.operators.prepare import pack_sequences

    # 1000 docs x 4 chunks — far more rows than 4 x parallelism buckets
    rows = [(f"d{i}", j, 10 + (i * 7 + j * 3) % 40)
            for i in range(1000) for j in range(4)]
    chunks = spark.createDataFrame(rows, ["doc_id", "chunk_id", "n_tokens"])
    audit: dict = {}
    packed = pack_sequences(chunks, capacity=64, max_bucket_rows=10,
                            audit=audit)
    floor_ = spark.sparkContext.defaultParallelism * 4
    assert audit["pack_n_rows"] == 4000
    assert audit["pack_n_buckets"] == max(floor_, 400)
    # per-bucket rows bounded near the target (hash variance + whole
    # docs co-bucketing allow a small factor, never linear growth)
    sizes = (packed.withColumn("bucket",
                               (F.col("pack_id") / (1 << 32)).cast("long"))
             .groupBy("bucket").agg(F.count(F.lit(1)).alias("n")))
    assert sizes.agg(F.max("n")).first()[0] <= 60
    assert packed.count() == 4000

    # explicit n_buckets skips the sizing count entirely (no action on
    # the input lineage — the contract expensive callers rely on)
    audit2: dict = {}
    pack_sequences(chunks, capacity=64, n_buckets=16, audit=audit2)
    assert audit2 == {"pack_n_buckets": 16}


def test_decontaminate_flags_benchmark_overlap(spark):
    from khl_pdf_ocr_spark.operators.prepare import decontaminate

    bench_q = ("what is the capital of france and which river flows "
               "through the city of paris on its way to the sea")
    corpus = spark.createDataFrame(
        [(1, "students often ask " + bench_q + " during geography class"),
         (2, "Students often ask, WHAT IS THE CAPITAL OF FRANCE and which "
             "river flows through the city of Paris on its way to the sea?"),
         (3, "a completely clean document about cooking pasta with garlic "
             "and olive oil in a large pan over medium heat tonight"),
         (4, "france paris river sea capital city")],   # words, no 13-gram
        ["doc_id", "text"])
    benchmark = spark.createDataFrame([(0, bench_q)], ["qid", "text"])
    kept, flagged = decontaminate(corpus, benchmark, n=13)
    assert {r["doc_id"] for r in kept.collect()} == {3, 4}
    hits = {r["id"]: r["n_hits"] for r in flagged.collect()}
    # doc 2 differs only in case/punctuation — normalization catches it
    assert set(hits) == {1, 2} and all(v >= 1 for v in hits.values())


def test_gopher_quality_filter_rule_by_rule(spark):
    from khl_pdf_ocr_spark.operators.prepare import gopher_quality_filter

    fluent = ("the quick brown fox jumps over the lazy dog and it is "
              "known that many of the animals have been seen with the "
              "birds near the river while the people walk to the town "
              "and back again every day of the long warm summer season "
              "to be sure of the light ") * 2            # ~70 fluent words
    rows = [
        (1, fluent),                                      # passes all
        (2, "too short to pass."),                        # word count
        (3, " ".join(["antidisestablishmentarianism"] * 60)),  # mean len
        (4, fluent + " " + " ".join(["#"] * 20)),         # symbol ratio
        (5, "\n".join(["- " + fluent[:40]] * 10)),        # bullets (also
                                                          # short — count
                                                          # fires first?)
        (6, " ".join(["12345"] * 80)),                    # alpha words
        (7, "zebra quokka lemur " * 30),                  # stopwords
        (8, None),                                        # NULL
    ]
    kept, ledger = gopher_quality_filter(
        spark.createDataFrame(rows, ["doc_id", "text"]))
    kept_ids = {r["doc_id"] for r in kept.collect()}
    reasons = {r["id"]: r["reject_reason"] for r in ledger.collect()}
    assert kept_ids == {1}
    assert reasons[2] == "gopher_word_count"
    assert reasons[3] == "gopher_word_length"
    assert reasons[4] == "gopher_symbol_ratio"
    assert reasons[6] == "gopher_alpha_words"
    assert reasons[7] == "gopher_stopwords"
    assert reasons[8] == "gopher_word_count"      # NULL never vanishes
    assert kept_ids | set(reasons) == {d for d, _ in rows}
    assert 5 in reasons                           # rejected (some rule)


def test_gopher_kernel_parity(spark):
    """r6 change #17: the Arrow-batched gopher reason kernel must equal
    the retained expression oracle verdict-for-verdict, incl. the
    Java-regex parity corners: NBSP inside tokens and as the only
    'content' of a line (ASCII \\s), unicode letters (\\p{L} ==
    isalpha), \\r\\n endings, symbol-count overlaps, stopword
    punctuation stripping, boundary ratios, NULL/empty text."""
    import random

    from khl_pdf_ocr_spark.operators.prepare import (_gopher_reason_expr,
                                                     gopher_quality_filter)

    fluent = ("the quick brown fox jumps over the lazy dog and it is "
              "known that many of the animals have been seen with the ")
    rng = random.Random(23)
    vocab = ("the of and to be river жизнь zebra # ... … 12345 x - "
             "antidisestablishmentarianism").split(" ")
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(0, 120))))
            for i in range(60)]
    rows += [
        (200, fluent * 3),
        (201, None), (202, ""), (203, "   \n \n\t"),
        (204, " \n" + fluent * 3),            # NBSP-only line is a line
        (205, (fluent * 3).replace(" ", "  ", 5)),  # NBSP in tokens
        (206, "\r\n".join(["- " + fluent] * 10)),  # CRLF bullets
        (207, "\n".join([fluent + "...\r"] * 10)), # ellipsis before \r
        (208, "жизнь прекрасна и удивительна " * 20),   # Unicode letters
        (209, fluent * 3 + " ...." * 30),          # overlapping dots
        (210, ("...the, " + fluent) * 3),          # stopword punct strip
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    defaults = (50, 100_000, 3.0, 10.0, 0.1, 0.9, 0.3, 0.8, 2)
    expr = {r["doc_id"]: r["r"] for r in df.select(
        "doc_id", _gopher_reason_expr("text", *defaults).alias("r")
    ).collect()}
    kept, ledger = gopher_quality_filter(df)
    kern = {r["id"]: r["reject_reason"] for r in ledger.collect()}
    for d in kept.select("doc_id").collect():
        kern[d["doc_id"]] = None
    assert kern == expr


def test_gopher_bullet_and_ellipsis_line_rules(spark):
    from khl_pdf_ocr_spark.operators.prepare import gopher_quality_filter

    base_line = ("the quick brown fox jumps over the lazy dog and that "
                 "is to be seen with many of the birds here")
    bullets = "\n".join(["- " + base_line] * 10)          # 100% bullets
    ellipses = "\n".join([base_line + " ..."] * 10)       # 100% ellipsis
    clean = "\n".join([base_line] * 10)
    df = spark.createDataFrame(
        [(1, bullets), (2, ellipses), (3, clean)], ["doc_id", "text"])
    _, ledger = gopher_quality_filter(df)
    reasons = {r["id"]: r["reject_reason"] for r in ledger.collect()}
    assert reasons.get(1) == "gopher_bullet_lines"
    assert reasons.get(2) == "gopher_ellipsis_lines"
    assert 3 not in reasons


def _py_c4(rows, min_words=5, min_sentences=3):
    """Independent pure-Python model of the C4 heuristics."""
    import re

    out, ledger = {}, {}
    for doc_id, text in rows:
        raw = text or ""
        low = raw.lower()
        lines = raw.split("\n")
        kept = [ln for ln in lines
                if re.search(r'[.!?"]$', ln.rstrip())
                and len(ln.split()) >= min_words
                and "javascript" not in ln.lower()]
        new = "\n".join(kept)
        if "{" in low:
            ledger[doc_id] = "c4_brace"
        elif "lorem ipsum" in low:
            ledger[doc_id] = "c4_lorem"
        elif len(re.findall(r"[.!?]", new)) < min_sentences:
            ledger[doc_id] = "c4_few_sentences"
        else:
            out[doc_id] = (new, len(lines), len(lines) - len(kept))
    return out, ledger


def test_c4_filters_match_python_model(spark):
    from khl_pdf_ocr_spark.operators.prepare import c4_filters

    good = ("The quick brown fox jumps over the lazy dog.\n"
            "Menu Home About\n"                       # no terminal punct
            "It was a bright cold day in April, and clocks struck.\n"
            "Enable javascript to view this content please now.\n"  # js
            "Yes.\n"                                  # < 5 words
            "The old cat watched from the warm windowsill quietly!")
    rows = [
        (1, good),
        (2, "function() { return 1; } and a very long sentence here."),
        (3, "This page contains Lorem Ipsum filler text for the layout. "
            "It repeats. It repeats again."),
        (4, "Short page.\nOnly one good sentence survives here today."),
        (5, None),
        (6, "First full sentence with enough words stands here.\n"
            "Second full sentence with enough words stands here.\n"
            "Third full sentence with enough words stands here."),
    ]
    kept, ledger = c4_filters(spark.createDataFrame(rows,
                                                    ["doc_id", "text"]))
    got = {r["doc_id"]: (r["text"], r["n_lines"], r["n_lines_removed"])
           for r in kept.collect()}
    got_led = {r["id"]: r["reject_reason"] for r in ledger.collect()}
    exp, exp_led = _py_c4(rows)
    assert got == exp
    assert got_led == exp_led
    # sanity on the planted cases
    assert got_led[2] == "c4_brace"
    assert got_led[3] == "c4_lorem"
    assert got_led[4] == "c4_few_sentences"
    assert got_led[5] == "c4_few_sentences"   # NULL never vanishes
    assert "javascript" not in got[1][0]
    assert "Menu Home About" not in got[1][0]


def test_c4_filters_seeded_fuzz(spark):
    import random

    from khl_pdf_ocr_spark.operators.prepare import c4_filters

    rng = random.Random(42)
    frag = ["The fox runs over the hill today.",
            "menu home about contact",
            "A full sentence with plenty of words right here!",
            "Enable javascript to continue reading this page now.",
            'He said "stop right there or else."',
            "short one.", "", "   ", "No punct but many words here now"]
    rows = []
    for d in range(120):
        n = rng.randint(1, 6)
        rows.append((d, "\n".join(rng.choice(frag) for _ in range(n))))
    kept, ledger = c4_filters(spark.createDataFrame(rows,
                                                    ["doc_id", "text"]))
    got = {r["doc_id"]: (r["text"], r["n_lines"], r["n_lines_removed"])
           for r in kept.collect()}
    got_led = {r["id"]: r["reject_reason"] for r in ledger.collect()}
    exp, exp_led = _py_c4(rows)
    assert got == exp and got_led == exp_led
    assert set(got) | set(got_led) == {d for d, _ in rows}   # conservation


def test_decontaminate_fuzzy_catches_paraphrase_exact_misses(spark):
    """The paraphrase net: an eval passage edited every ~8 tokens keeps
    no exact 13-gram (the exact rule passes it) but keeps most of its
    3-shingles — the fuzzy pass must catch it.  Clean docs and
    NULL/blank docs survive; the audit frame reports the match."""
    from khl_pdf_ocr_spark.operators.prepare import (decontaminate,
                                                     decontaminate_fuzzy)

    bench_q = ("the quick brown fox jumps over the lazy dog while the "
               "old cat watches from the warm windowsill in the pale "
               "afternoon sun and the small birds sing in the tall "
               "green trees beside the quiet house near the river")
    toks = bench_q.split()
    # one substitution every 12 tokens: the longest unedited run is 11
    # tokens, so no 13-gram survives; measured shingle-agreement
    # estimate vs the original is 0.547 (deterministic)
    edited = list(toks)
    for i in range(0, len(edited), 12):
        edited[i] = "EDIT%d" % i
    paraphrased = " ".join(edited)
    corpus = spark.createDataFrame(
        [(1, paraphrased),
         (2, "a completely clean document about cooking pasta with "
             "garlic and olive oil in a large pan over medium heat"),
         (3, None), (4, "   ")],
        ["doc_id", "text"])
    benchmark = spark.createDataFrame([(0, bench_q)], ["qid", "text"])

    kept_exact, _ = decontaminate(corpus, benchmark, n=13)
    assert 1 in {r["doc_id"] for r in kept_exact.collect()}  # exact misses

    kept, flagged = decontaminate_fuzzy(corpus, benchmark, threshold=0.5)
    assert {r["doc_id"] for r in kept.collect()} == {2, 3, 4}
    f = {r["id"]: r for r in flagged.collect()}
    assert set(f) == {1}
    assert f[1]["n_bench_matches"] == 1
    assert f[1]["max_jaccard"] >= 0.5

    import pytest as _pytest
    with _pytest.raises(ValueError):
        decontaminate_fuzzy(corpus, benchmark, threshold=0.0)


def test_decontaminate_fuzzy_precomputed_sigs_equivalent(spark):
    """sigs= (the clean_corpus shared-signature path) must produce the
    same drops as the internal computation, reject a width mismatch,
    and never flag an id that is not in the frame (superset store)."""
    from khl_pdf_ocr_spark.operators.dedup import minhash_signatures
    from khl_pdf_ocr_spark.operators.prepare import decontaminate_fuzzy

    bench_q = ("the quick brown fox jumps over the lazy dog while the "
               "old cat watches from the warm windowsill in the pale "
               "afternoon sun and the small birds sing in the trees")
    corpus = spark.createDataFrame(
        [(1, bench_q + " and a small tail"),
         (2, "a clean document about cooking pasta with garlic and "
             "olive oil in a large pan over medium heat tonight")],
        ["doc_id", "text"])
    benchmark = spark.createDataFrame([(0, bench_q)], ["qid", "text"])
    k_default, f_default = decontaminate_fuzzy(corpus, benchmark,
                                               threshold=0.5)
    sigs = minhash_signatures(corpus)
    k_sigs, f_sigs = decontaminate_fuzzy(corpus, benchmark,
                                         threshold=0.5, sigs=sigs)
    assert {r["doc_id"] for r in k_default.collect()} \
        == {r["doc_id"] for r in k_sigs.collect()} == {2}
    assert {r["id"] for r in f_default.collect()} \
        == {r["id"] for r in f_sigs.collect()} == {1}
    # superset store: sigs carry an id absent from the frame — it must
    # not be flagged (double-ledger hazard)
    sub = corpus.filter("doc_id = 2")
    k3, f3 = decontaminate_fuzzy(sub, benchmark, threshold=0.5,
                                 sigs=sigs)
    assert f3.count() == 0 and k3.count() == 1
    # width fail-fast
    import pytest as _pytest
    with _pytest.raises(ValueError):
        decontaminate_fuzzy(corpus, benchmark,
                            sigs=minhash_signatures(corpus, num_perm=32))


def test_decontaminate_fuzzy_broadcasts_eval_side(spark, docs):
    """Plan check: the eval signatures broadcast; the corpus reaches
    the candidate join without a corpus-wide shuffle and the drop-list
    join-back is never a cartesian."""
    from khl_pdf_ocr_spark.operators.prepare import decontaminate_fuzzy

    bench = docs.limit(3).select("doc_id", "text")
    kept, _ = decontaminate_fuzzy(docs, bench)
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_decontaminate_never_shuffles_corpus_payload(spark, docs):
    """Plan check: the corpus side must reach the join via broadcast,
    never a corpus-wide exchange of the flagged-id side."""
    from khl_pdf_ocr_spark.operators.prepare import decontaminate

    bench = docs.limit(3).select("doc_id", "text")
    kept, _ = decontaminate(docs, bench)
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_deterministic_sample_mixture(spark):
    from khl_pdf_ocr_spark.operators.prepare import deterministic_sample

    rows = [(i, "web" if i % 2 else "books") for i in range(40_000)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = deterministic_sample(df, {"web": 0.5, "books": 1.0})
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["books"] == 20_000                      # fraction 1.0 = all
    assert abs(counts["web"] / 20_000 - 0.5) < 0.02
    # stable under repartitioning; strata not named are dropped
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in
         deterministic_sample(df.repartition(9), {"web": 0.5, "books": 1.0}
                              ).collect()}
    assert a == b
    only_web = deterministic_sample(df, {"web": 0.5})
    assert only_web.filter(F.col("source") == "books").count() == 0
    with pytest.raises(ValueError):
        deterministic_sample(df, {"web": 1.5})


def test_chunk_reconstruction_fuzz(spark):
    """Seeded fuzz over messy whitespace: concatenating chunk 0 with
    each later chunk minus its overlap must reproduce the stripped
    token stream exactly, every chunk is <= max_tokens, and each
    chunk's first `overlap` tokens equal the previous chunk's last
    `overlap` (when the previous chunk is full)."""
    import random

    from khl_pdf_ocr_spark.operators.prepare import chunk_documents

    rng = random.Random(1234)
    ws = [" ", "  ", "\n", "\t", " \n "]
    rows = []
    for i in range(150):
        n = rng.randrange(0, 220)
        toks = [f"t{i}_{j}" for j in range(n)]
        body = "".join(t + rng.choice(ws) for t in toks)
        lead = rng.choice(["", " ", "\n\n", "\t"])
        rows.append((i, lead + body))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    mt, ov = 32, 8
    out = chunk_documents(df, max_tokens=mt, overlap=ov)
    by_doc: dict = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r
    for i, text in rows:
        want = text.split()
        got_chunks = by_doc.get(i, {})
        if not want:
            assert got_chunks == {}, i
            continue
        ordered = [got_chunks[k] for k in sorted(got_chunks)]
        assert all(c["n_tokens"] <= mt for c in ordered)
        rebuilt = ordered[0]["chunk_text"].split()
        for prev, cur in zip(ordered, ordered[1:]):
            cur_toks = cur["chunk_text"].split()
            if prev["n_tokens"] == mt:
                assert cur_toks[:ov] == prev["chunk_text"].split()[-ov:]
            rebuilt += cur_toks[ov:]
        assert rebuilt == want, i


def test_canonical_url_idempotent_fuzz(spark):
    """canonical(canonical(u)) == canonical(u) — a dedup key that moves
    on re-canonicalization corrupts incremental ledgers."""
    import random

    from khl_pdf_ocr_spark.functions.urls import canonical_url

    rng = random.Random(77)
    hosts = ["Example.com", "SUB.site.ORG:443", "x.io:8080", "a.b.c.de:80"]
    paths = ["", "/", "/p", "/p/q/", "/p//q", "/Case/Path"]
    queries = ["", "?b=2&a=1", "?utm_source=x", "?a=1&a=1&fbclid=z",
               "?z=9&y=8&", "?lone"]
    urls = []
    for i in range(200):
        scheme = rng.choice(["http", "HTTPS", "ftp"])
        u = (f"{scheme}://{rng.choice(hosts)}{rng.choice(paths)}"
             f"{rng.choice(queries)}" + rng.choice(["", "#frag", "#a#b"]))
        urls.append((i, u))
    urls += [(900, "no scheme here #x"), (901, "")]
    df = spark.createDataFrame(urls, ["i", "u"])
    out = df.select("i", canonical_url(F.col("u")).alias("c1"),
                    canonical_url(canonical_url(F.col("u"))).alias("c2"))
    bad = out.filter(F.col("c1") != F.col("c2")).collect()
    assert bad == [], bad


def test_shard_cli_end_to_end(spark, tmp_path):
    """chunk → split → pack → partitioned shards, with measured fill
    rate; packs never mix splits and every chunk lands exactly once."""
    import json
    import os
    import subprocess
    import sys

    inp = str(tmp_path / "kept")
    spark.read.parquet(DOCS).write.parquet(inp)
    out = str(tmp_path / "shards")
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.shard_cli",
         "--input", inp, "--output", out,
         "--max-tokens", "48", "--overlap", "8", "--capacity", "128",
         "--split", "train=0.8,val=0.2", "--cpus", "4"],
        capture_output=True, text=True, timeout=420,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert p.returncode == 0, p.stderr[-3000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert set(stats["splits"]) == {"train", "val"}
    assert all(v["n_packs"] == 0 or 0 < v["fill_rate"] <= 1.0
               for v in stats["splits"].values())
    assert stats["n_buckets"] >= 1  # bucket telemetry surfaced

    rb = spark.read.parquet(out)
    want = chunk_documents(spark.read.parquet(inp),
                           max_tokens=48, overlap=8).count()
    assert rb.count() == stats["n_chunks"] == want
    # pack key is (split, pack_id); within it, no doc crosses splits
    # (chunks split by PARENT doc id) and capacity holds on read-back
    leak = (rb.groupBy("doc_id")
            .agg(F.countDistinct("split").alias("k"))
            .filter(F.col("k") > 1).count())
    assert leak == 0
    over = (rb.groupBy("split", "pack_id")
            .agg(F.sum("n_tokens").alias("load"))
            .filter(F.col("load") > 128).count())
    assert over == 0


def test_shard_cli_reports_empty_split(spark, tmp_path):
    """A requested split that receives zero docs must still appear in
    the stats with n_packs 0 — never silently vanish (r4 review)."""
    import json
    import os
    import subprocess
    import sys

    inp = str(tmp_path / "kept")
    spark.createDataFrame([(1, "just one tiny document with words")],
                          ["doc_id", "text"]).write.parquet(inp)
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.shard_cli",
         "--input", inp, "--output", str(tmp_path / "shards"),
         "--max-tokens", "48", "--overlap", "8", "--capacity", "128",
         "--split", "train=0.999,val=0.001", "--cpus", "2"],
        capture_output=True, text=True, timeout=420,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert set(stats["splits"]) == {"train", "val"}
    empties = [v for v in stats["splits"].values() if v["n_packs"] == 0]
    assert len(empties) == 1 and empties[0]["fill_rate"] is None


def test_parse_split_weights():
    from khl_pdf_ocr_spark.operators.prepare import parse_split_weights

    assert parse_split_weights("train=0.98,val=0.01,test=0.01") == {
        "train": 0.98, "val": 0.01, "test": 0.01}
    with pytest.raises(ValueError, match="duplicate split name"):
        parse_split_weights("train=0.5,train=0.5")
    with pytest.raises(ValueError, match="bad split spec"):
        parse_split_weights("train=0.5,oops")


def test_pack_sequences_carries_array_payload_columns(spark):
    """Complex-typed payload columns (token_ids from bpe_encode) ride
    through packing untouched: pandas cannot hash/sort ndarray cells,
    so they must not join the in-bucket ordering key — and the result
    must stay deterministic via the scalar key columns alone."""
    from khl_pdf_ocr_spark.operators.prepare import pack_sequences

    rows = [(f"d{i}", j, 10 + (i * 7 + j * 3) % 40,
             list(range(j, j + 3)))
            for i in range(50) for j in range(3)]
    chunks = spark.createDataFrame(
        rows, "doc_id string, chunk_id int, n_tokens int, "
              "token_ids array<int>")
    packed = pack_sequences(chunks, capacity=64, n_buckets=8)
    got = {(r["doc_id"], r["chunk_id"]): (r["pack_id"],
                                          list(r["token_ids"]))
           for r in packed.collect()}
    assert len(got) == 150
    for (d, j), (_, ids) in got.items():
        assert ids == list(range(j, j + 3))      # payload untouched
    again = {(r["doc_id"], r["chunk_id"]): r["pack_id"]
             for r in pack_sequences(chunks.repartition(7), capacity=64,
                                     n_buckets=8).collect()}
    assert again == {k: v[0] for k, v in got.items()}


def test_c4_badwords_whole_token_semantics(spark):
    import pytest as _pytest

    from khl_pdf_ocr_spark.operators.prepare import (C4_BADWORDS_SEED,
                                                     c4_badwords_filter)

    rows = [
        (0, "a perfectly clean page about hockey and weather"),
        (1, "this page links to porn sites all day"),        # seed hit
        (2, "the essex XXX-classic marathon report"),        # 'xxx' token hit
        (3, "Essex classics and maXXXimum effort are fine"), # substrings only
        (4, None),                                           # NULL passes
        (5, "ВИАГРА со скидкой сегодня"),                    # cyrillic vs custom list
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    kept, ledger = c4_badwords_filter(df)
    assert {r["doc_id"] for r in kept.collect()} == {0, 3, 4, 5}
    assert {(r["id"], r["reject_reason"]) for r in ledger.collect()} \
        == {(1, "c4_badwords"), (2, "c4_badwords")}
    assert kept.count() + ledger.count() == 6          # conservation

    # custom (non-ASCII) list: unicode tokenization must match it
    kept2, ledger2 = c4_badwords_filter(df, words=["виагра"])
    assert {r["id"] for r in ledger2.collect()} == {5}
    assert kept2.count() == 5

    with _pytest.raises(ValueError, match="empty"):
        c4_badwords_filter(df, words=["  ", ""])
    assert "porn" in C4_BADWORDS_SEED  # the disclosed default is real


def test_clean_cli_badwords_gate(spark, tmp_path):
    import json
    import os
    import subprocess
    import sys

    base = ("the quick brown fox jumps over the lazy dog and it was a "
            "good day for all of them in the field near the old house")
    rows = [(0, base + " alpha", "s"),
            (1, base + " gambling jackpot bonus", "s"),
            (2, base + " gamma", "s")]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string, source string") \
        .write.parquet(inp)
    lst = tmp_path / "badwords.txt"
    lst.write_text("# casino spam\njackpot\n")
    out = str(tmp_path / "cleaned")
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.clean_cli",
         "--input", inp, "--output", out,
         "--langs", "en", "--min-quality", "0.1",
         "--near-dup-threshold", "0.95",
         "--badwords", str(lst), "--cpus", "4"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["rejected"].get("c4_badwords") == 1
    assert stats["n_kept"] == 2
    led = spark.read.parquet(f"{out}/ledger")
    assert {(r["id"], r["reject_reason"]) for r in led.collect()} \
        >= {(1, "c4_badwords")}
