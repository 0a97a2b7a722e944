"""The full product chain a reference user would run, end to end:

    raw WARC crawl archive
      → extraction CLI  (--format warc: archive → extracted text)
      → cleaning CLI    (url dedup, lang/quality, near-dup, paragraph
                         dedup, deterministic splits — keyed on the
                         extraction output's own columns: --id-col url
                         --text-col extracted_text, no bridging step)
      → shard CLI       (chunk → split-by-parent → FFD packing)

with row conservation asserted at every boundary."""

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

import duckdb

from khl_pdf_ocr_spark.sources.warc import write_warc

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TS = datetime(2026, 3, 1, 12, 0, 0, tzinfo=timezone.utc)


def _run(mod, argv, timeout=420):
    p = subprocess.run([sys.executable, "-m", mod, *argv],
                       capture_output=True, text=True, timeout=timeout,
                       cwd=REPO)
    assert p.returncode == 0, f"{mod}: {p.stderr[-3000:]}"
    return json.loads([ln for ln in p.stdout.splitlines()
                       if ln.startswith("{")][-1])


def test_warc_to_shards_chain(spark, tmp_path, fixture_tables):
    docs_path, _ = fixture_tables
    sample = duckdb.sql(
        f"SELECT url, html FROM read_parquet('{docs_path}') LIMIT 12"
    ).fetchall()
    (tmp_path / "crawl.warc.gz").write_bytes(
        write_warc([(u, TS, bytes(h)) for u, h in sample], gzipped=True))

    # 1. extraction straight off the archive
    ex_out = str(tmp_path / "extracted")
    ex = _run("khl_pdf_ocr_spark.cli",
              ["--input", str(tmp_path / "crawl.warc.gz"),
               "--output", ex_out, "--format", "warc",
               "--mode", "all", "--cpus", "4"])
    assert ex["n_docs"] == 12

    # 2. cleaning keyed on the extraction output's own columns
    cl_out = str(tmp_path / "cleaned")
    cl = _run("khl_pdf_ocr_spark.clean_cli",
              ["--input", f"{ex_out}/data",
               "--output", cl_out,
               "--id-col", "url", "--text-col", "extracted_text",
               "--url-col", "url",
               "--langs", "en", "ru", "other",
               "--min-quality", "0.05",
               "--near-dup-threshold", "0.95",
               "--dedup-paragraphs",
               "--split", "train=0.8,val=0.2", "--cpus", "4"])
    n_rejected = sum(cl["rejected"].values())
    assert cl["n_kept"] + n_rejected == 12        # conservation
    assert cl["n_kept"] >= 1
    assert sum(cl["splits"].values()) == cl["n_kept"]
    # kept rows still carry the extraction payload columns
    kept = spark.read.parquet(f"{cl_out}/kept")
    assert {"url", "extracted_text", "split",
            "n_paras", "n_paras_removed"} <= set(kept.columns)

    # 3. shard building over the cleaned corpus
    sh_out = str(tmp_path / "shards")
    sh = _run("khl_pdf_ocr_spark.shard_cli",
              ["--input", f"{cl_out}/kept",
               "--output", sh_out,
               "--id-col", "url", "--text-col", "extracted_text",
               "--max-tokens", "64", "--overlap", "8",
               "--capacity", "256",
               "--split", "train=0.8,val=0.2", "--cpus", "4"])
    assert sh["n_chunks"] > 0
    assert sum(s["n_packs"] for s in sh["splits"].values()) >= 1
    # every pack respects capacity on read-back, and chunk rows are
    # conserved through packing
    packs = spark.read.parquet(sh_out)
    from pyspark.sql import functions as F

    assert packs.count() == sh["n_chunks"]
    over = packs.groupBy("split", "pack_id") \
        .agg(F.sum(sh["len_col"]).alias("n")) \
        .filter(F.col("n") > 256).count()
    assert over == 0


def test_chain_with_model_ready_token_ids(spark, tmp_path,
                                          fixture_tables):
    """The chain's last hop upgraded to model-ready output: train the
    tokenizer on the CLEANED corpus (exactly what a real run does),
    then the shard step packs in model tokens AND writes token ids —
    ids decode losslessly back to each chunk's normalized text."""
    docs_path, _ = fixture_tables
    sample = duckdb.sql(
        f"SELECT url, html FROM read_parquet('{docs_path}') LIMIT 10"
    ).fetchall()
    (tmp_path / "crawl.warc.gz").write_bytes(
        write_warc([(u, TS, bytes(h)) for u, h in sample], gzipped=True))

    ex_out = str(tmp_path / "extracted")
    _run("khl_pdf_ocr_spark.cli",
         ["--input", str(tmp_path / "crawl.warc.gz"),
          "--output", ex_out, "--format", "warc",
          "--mode", "all", "--cpus", "4"])
    cl_out = str(tmp_path / "cleaned")
    cl = _run("khl_pdf_ocr_spark.clean_cli",
              ["--input", f"{ex_out}/data", "--output", cl_out,
               "--id-col", "url", "--text-col", "extracted_text",
               "--langs", "en", "ru", "other",
               "--min-quality", "0.05",
               "--near-dup-threshold", "0.95", "--cpus", "4"])
    assert cl["n_kept"] >= 1

    from khl_pdf_ocr_spark.operators.bpe import (build_vocab,
                                                 corpus_alphabet,
                                                 encode_word,
                                                 save_merges, save_vocab,
                                                 train_bpe,
                                                 word_frequency_table)

    kept = spark.read.parquet(f"{cl_out}/kept")
    wf = word_frequency_table(kept, text_col="extracted_text")
    merges, _ = train_bpe(wf, n_merges=60)
    vocab = build_vocab(merges, corpus_alphabet(wf))
    mp, vp = str(tmp_path / "merges"), str(tmp_path / "vocab")
    save_merges(spark, merges, mp)
    save_vocab(spark, vocab, vp)

    sh_out = str(tmp_path / "shards")
    sh = _run("khl_pdf_ocr_spark.shard_cli",
              ["--input", f"{cl_out}/kept", "--output", sh_out,
               "--id-col", "url", "--text-col", "extracted_text",
               "--max-tokens", "48", "--overlap", "8",
               "--capacity", "4096", "--split", "train=1.0",
               "--bpe-merges", mp, "--bpe-vocab", vp,
               "--emit-token-ids", "--cpus", "4"])
    assert sh["len_col"] == "n_pieces"

    from pyspark.sql import functions as F

    packs = spark.read.parquet(sh_out)
    assert packs.count() == sh["n_chunks"] > 0
    assert packs.filter(
        F.size("token_ids") != F.col("n_pieces")).count() == 0
    # lossless decode: ids → pieces → text == the chunk's own
    # lowercased whitespace-normalized words (training on the same
    # corpus ⇒ no <unk>)
    id2p = {i: p for p, i in vocab.items()}
    for r in packs.select("chunk_text", "token_ids").collect():
        dec = "".join(id2p[i] for i in r["token_ids"]) \
            .replace("</w>", " ").strip()
        assert dec == " ".join(r["chunk_text"].lower().split())


def test_clean_cli_all_rejected_split_emits_zero_stats(spark, tmp_path):
    """r6 regression: a PARTITIONED (--split) write of an all-rejected
    corpus emits no data files, and the stats read-back used to crash
    on schema inference — it must report n_kept 0 instead."""
    docs = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, "far too short to pass the gopher gate", "s")
         for i in range(6)],
        ["doc_id", "text", "source"]).write.parquet(docs)
    out = _run("khl_pdf_ocr_spark.clean_cli",
               ["--input", docs, "--output", str(tmp_path / "cleaned"),
                "--gopher-rules", "--langs", "en", "ru", "other",
                "--min-quality", "0.0",
                "--split", "train=0.8,val=0.2", "--cpus", "2"])
    assert out["n_kept"] == 0
    assert out["rejected"].get("gopher_word_count", 0) >= 1
    assert out["splits"] == {}
