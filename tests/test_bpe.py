"""BPE tokenizer training (operators/bpe.py): the Sennrich reference
example, determinism, the cap audit, and the Spark encode path."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.operators.bpe import (END, bpe_segment, encode_word,
                                             train_bpe,
                                             word_frequency_table)

# the worked example from Sennrich et al. 2016 §3.2
SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_sennrich_reference_merges():
    merges, audit = train_bpe(SENNRICH, n_merges=6, min_pair_count=1)
    # hand-traced rounds (word-final </w> fused onto the last char):
    # 1 ('e','s') 9 [newest 6 + widest 3]; 2 ('es','t</w>') 9;
    # 3 ('l','o') 7 [low 5 + lower 2]; 4 ('e','w') 6 [newest] — NOT
    #   ('lo','w'): "low" is now (lo, w</w>) so that pair counts only
    #   lower's 2, and ('lo','w</w>') counts 5 < 6;
    # 5 tie at 6 between ('n','ew') and ('ew','est</w>') → lexicographic
    #   tie-break picks ('ew','est</w>'); 6 ('n','ewest</w>') 6.
    assert merges == [("e", "s"), ("es", "t" + END), ("l", "o"),
                      ("e", "w"), ("ew", "est" + END),
                      ("n", "ewest" + END)]
    assert audit["n_merges"] == 6
    assert audit["coverage"] == 1.0
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("lowest", ranks) == ["lo", "w", "est" + END]
    assert encode_word("low", ranks) == ["lo", "w" + END]  # 'w</w>' != 'w'
    assert encode_word("newest", ranks) == ["newest" + END]  # merge 6 applies
    assert encode_word("widest", ranks) == ["w", "i", "d", "est" + END]


def test_training_is_input_order_insensitive():
    import random

    shuffled = SENNRICH[:]
    random.Random(3).shuffle(shuffled)
    assert train_bpe(shuffled, n_merges=10, min_pair_count=1)[0] \
        == train_bpe(SENNRICH, n_merges=10, min_pair_count=1)[0]


def test_min_pair_count_stops_early():
    merges, audit = train_bpe([("ab", 1), ("cd", 1)], n_merges=50,
                              min_pair_count=2)
    assert merges == [] and audit["n_merges"] == 0


def test_max_words_cap_is_audited():
    merges, audit = train_bpe(SENNRICH, n_merges=2, min_pair_count=1,
                              max_words=2)
    # kept: newest (6) + low (5) of 16 total occurrences
    assert audit["n_words"] == 2
    assert audit["coverage"] == pytest.approx(11 / 16)


def test_encode_roundtrip_property():
    merges, _ = train_bpe(SENNRICH, n_merges=10, min_pair_count=1)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["low", "lower", "newest", "widest", "lowest", "news",
              "wide", "zzz", "a"]:
        pieces = encode_word(w, ranks, cache={})
        assert "".join(pieces) == w + END     # lossless segmentation
        assert pieces[-1].endswith(END)


def test_word_frequency_table_matches_duckdb(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {r["word"]: r["n"] for r in word_frequency_table(docs).collect()}
    want = {w: n for w, n in duckdb.sql("""
        SELECT word, count(*) AS n FROM (
          SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))
                 AS word
          FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
          WHERE text IS NOT NULL)
        WHERE length(word) > 0 GROUP BY word
    """).fetchall()}
    # the synthetic corpus has a deliberately small vocabulary (~31
    # distinct words at sf0.001) — the equality is the oracle
    assert got == want and len(got) > 20


def test_bpe_segment_matches_driver_encode(spark):
    """The Spark Arrow path and the plain driver encode agree per doc —
    and pieces_per_word exposes the whitespace-undercount the packing
    stages care about."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .limit(60)
    wf = word_frequency_table(docs)
    merges, audit = train_bpe(wf, n_merges=200)
    assert audit["coverage"] == 1.0           # no cap at this scale
    out = {r["doc_id"]: r for r in
           bpe_segment(docs, merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    cache: dict = {}
    for r in docs.select("doc_id", "text").collect():
        toks = (r["text"] or "").lower().split()
        want_pieces = sum(len(encode_word(w, ranks, cache)) for w in toks)
        row = out[r["doc_id"]]
        assert row["n_words"] == len(toks)
        assert row["n_pieces"] == want_pieces
        if toks:
            assert row["pieces_per_word"] >= 1.0
        else:
            assert row["pieces_per_word"] is None
    assert len(out) == 60


def test_save_load_merges_roundtrip(spark, tmp_path):
    from khl_pdf_ocr_spark.operators.bpe import load_merges, save_merges

    merges, _ = train_bpe(SENNRICH, n_merges=6, min_pair_count=1)
    save_merges(spark, merges, str(tmp_path / "m"))
    assert load_merges(spark, str(tmp_path / "m")) == merges
    # overwrite semantics: a retried job must not crash
    save_merges(spark, merges[:3], str(tmp_path / "m"))
    assert load_merges(spark, str(tmp_path / "m")) == merges[:3]


def test_shard_cli_packs_on_bpe_pieces(spark, tmp_path):
    """--bpe-merges: capacity is enforced in MODEL TOKENS — a pack may
    exceed the capacity in whitespace words' piece-inflated count never
    exceeds it in pieces; stats disclose the len_col."""
    import json
    import os
    import subprocess
    import sys

    from khl_pdf_ocr_spark.operators.bpe import (save_merges,
                                                 word_frequency_table)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    inp = str(tmp_path / "kept")
    docs.write.parquet(inp)
    merges, _ = train_bpe(word_frequency_table(docs), n_merges=50)
    merges_path = str(tmp_path / "merges")
    save_merges(spark, merges, merges_path)

    out = str(tmp_path / "shards")
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.shard_cli",
         "--input", inp, "--output", out,
         "--max-tokens", "32", "--overlap", "4", "--capacity", "256",
         "--split", "train=1.0", "--bpe-merges", merges_path,
         "--cpus", "4"],
        capture_output=True, text=True, timeout=420,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert p.returncode == 0, p.stderr[-3000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["len_col"] == "n_pieces"
    rb = spark.read.parquet(out)
    assert "n_pieces" in rb.columns
    # capacity holds in PIECES on read-back; pieces >= whitespace tokens
    over = (rb.groupBy("split", "pack_id")
            .agg(F.sum("n_pieces").alias("load"))
            .filter(F.col("load") > 256).count())
    assert over == 0
    infl = rb.filter(F.col("n_pieces") < F.col("n_tokens")).count()
    assert infl == 0
    assert rb.filter(F.col("n_pieces") > F.col("n_tokens")).count() > 0


def test_build_vocab_numbering_and_duplicate_surfaces():
    from khl_pdf_ocr_spark.operators.bpe import UNK, build_vocab

    # two merge paths to the same surface string "abc" — first keeps
    # its id, second is skipped, ids stay dense
    merges = [("a", "b"), ("ab", "c"), ("b", "c"), ("a", "bc")]
    vocab = build_vocab(merges, ["b", "a", "a" + END])
    assert vocab[UNK] == 0
    # sorted base alphabet next
    assert vocab["a"] == 1 and vocab["a" + END] == 2 and vocab["b"] == 3
    # merges in rank order; "abc" (rank 1) keeps id, rank-3 dup skipped
    assert vocab["ab"] == 4 and vocab["abc"] == 5 and vocab["bc"] == 6
    assert len(vocab) == 7 and len(set(vocab.values())) == 7


def test_corpus_alphabet_both_forms(spark):
    from khl_pdf_ocr_spark.operators.bpe import corpus_alphabet

    wf = spark.createDataFrame([("low", 5), ("cab", 2)], "word string, n long")
    alpha = corpus_alphabet(wf)
    chars = set("lowcab")
    assert set(alpha) == chars | {c + END for c in chars}
    assert alpha == sorted(alpha)          # deterministic order


def test_save_load_vocab_roundtrip(spark, tmp_path):
    from khl_pdf_ocr_spark.operators.bpe import (build_vocab, load_vocab,
                                                 save_vocab)

    merges, _ = train_bpe(SENNRICH, n_merges=6, min_pair_count=1)
    vocab = build_vocab(merges, ["l", "o", "w" + END])
    save_vocab(spark, vocab, str(tmp_path / "v"))
    assert load_vocab(spark, str(tmp_path / "v")) == vocab
    save_vocab(spark, {"<unk>": 0}, str(tmp_path / "v"))  # overwrite
    assert load_vocab(spark, str(tmp_path / "v")) == {"<unk>": 0}


def test_bpe_encode_matches_driver_and_handles_oov(spark):
    """token_ids per doc == the driver's per-word encode mapped through
    the vocabulary; NULL text → empty array; a character never seen at
    training time → <unk> (id 0); decode(ids) is lossless back to the
    normalized text."""
    from khl_pdf_ocr_spark.operators.bpe import (UNK, bpe_encode,
                                                 build_vocab,
                                                 corpus_alphabet,
                                                 word_frequency_table)

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(40)
    extra = spark.createDataFrame(
        [(900001, None), (900002, "low ß zzz")],
        "doc_id long, text string")
    docs = docs.select("doc_id", "text").unionByName(extra)

    wf = word_frequency_table(docs)
    merges, _ = train_bpe(wf, n_merges=120)
    vocab = build_vocab(merges, corpus_alphabet(wf))
    out = {r["doc_id"]: list(r["token_ids"])
           for r in bpe_encode(docs, merges, vocab,
                               text_col="text").collect()}
    assert set(out) == {r["doc_id"] for r in docs.collect()}

    ranks = {p: i for i, p in enumerate(merges)}
    id2p = {i: p for p, i in vocab.items()}
    cache: dict = {}
    for r in docs.collect():
        ids = out[r["doc_id"]]
        if r["text"] is None:
            assert ids == []
            continue
        want = []
        for w in r["text"].lower().split():
            want.extend(vocab.get(p, 0) for p in encode_word(w, ranks, cache))
        assert ids == want
        if 0 not in ids:   # no <unk>: decode is exactly lossless
            dec = "".join(id2p[i] for i in ids).replace(END, " ").strip()
            assert dec == " ".join(r["text"].lower().split())
    # the planted doc trains too, so its words are in-vocab — but ß
    # lowercases identically and IS seen; verify true OOV via a vocab
    # built WITHOUT it
    poor = build_vocab(merges, [c for c in corpus_alphabet(wf)
                                if "ß" not in c])
    row = {r["doc_id"]: list(r["token_ids"])
           for r in bpe_encode(docs.filter(F.col("doc_id") == 900002),
                               merges, poor, text_col="text").collect()}
    assert 0 in row[900002] and poor[UNK] == 0


def test_shard_cli_emit_token_ids(spark, tmp_path):
    """--emit-token-ids: shard rows carry model-ready ids; n_pieces ==
    size(token_ids) (one encode pass serves both); flag validation."""
    import json
    import os
    import subprocess
    import sys

    from khl_pdf_ocr_spark.operators.bpe import (build_vocab,
                                                 corpus_alphabet,
                                                 save_merges, save_vocab,
                                                 word_frequency_table)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    inp = str(tmp_path / "kept")
    docs.write.parquet(inp)
    wf = word_frequency_table(docs)
    merges, _ = train_bpe(wf, n_merges=50)
    mp, vp = str(tmp_path / "merges"), str(tmp_path / "vocab")
    save_merges(spark, merges, mp)
    save_vocab(spark, build_vocab(merges, corpus_alphabet(wf)), vp)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "shards")
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.shard_cli",
         "--input", inp, "--output", out,
         "--max-tokens", "32", "--overlap", "4", "--capacity", "256",
         "--split", "train=1.0", "--bpe-merges", mp, "--bpe-vocab", vp,
         "--emit-token-ids", "--cpus", "4"],
        capture_output=True, text=True, timeout=420, cwd=repo)
    assert p.returncode == 0, p.stderr[-3000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["len_col"] == "n_pieces"
    rb = spark.read.parquet(out)
    assert "token_ids" in rb.columns
    assert rb.filter(F.size("token_ids") != F.col("n_pieces")).count() == 0
    assert rb.filter(F.size("token_ids") > 0).count() == rb.count()
    over = (rb.groupBy("split", "pack_id")
            .agg(F.sum("n_pieces").alias("load"))
            .filter(F.col("load") > 256).count())
    assert over == 0

    # flag validation: both halves required, each direction
    for argv in ([ "--emit-token-ids", "--bpe-merges", mp],
                 ["--bpe-vocab", vp]):
        q = subprocess.run(
            [sys.executable, "-m", "khl_pdf_ocr_spark.shard_cli",
             "--input", inp, "--output", str(tmp_path / "x"),
             "--max-tokens", "32", "--split", "train=1.0"] + argv,
            capture_output=True, text=True, timeout=120, cwd=repo)
        assert q.returncode == 2
        assert "emit-token-ids" in q.stderr
