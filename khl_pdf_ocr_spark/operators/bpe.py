"""BPE tokenizer training over a document corpus — the vocabulary-
construction stage of a training-data pipeline (Sennrich et al. 2016,
the public byte-pair-encoding algorithm used by the GPT-2/RoBERTa
family of tokenizers).

Scale shape (the part that matters at 100 TB): the ONLY corpus-scale
work is ``word_frequency_table`` — one explode → groupBy(word) with
map-side combine, a single shuffle over (word) keys.  Everything after
operates on the *frequency table*, which Zipf's law keeps tiny
relative to the corpus (10^7–10^8 distinct normalized words for a
web-scale crawl — MBs, not TBs).  ``train_bpe`` therefore runs
driver-side over the top-``max_words`` rows (exactly how industrial
trainers work: frequency-capped vocab, with the dropped tail's mass
REPORTED as ``coverage`` — no silent cap), and the learned merge table
(a few 10k pairs) broadcasts back into ``bpe_segment`` for
Arrow-batched encoding.

Determinism: merges tie-break on (count desc, pair lexicographic) and
the trainer is insensitive to input-row order — the same corpus yields
the same tokenizer on any cluster, any partitioning (the same property
hash_split gives splits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["word_frequency_table", "train_bpe", "bpe_segment",
           "encode_word", "with_bpe_piece_counts", "save_merges",
           "load_merges", "corpus_alphabet", "build_vocab",
           "save_vocab", "load_vocab", "bpe_encode"]

END = "</w>"  # word-final marker (Sennrich): "est" mid-word != "est</w>"


def word_frequency_table(df: DataFrame, *, text_col: str = "text",
                         lowercase: bool = True) -> DataFrame:
    """(word, n) over the corpus — the one corpus-scale pass.

    Whitespace tokenization of (optionally lowercased) text; empty
    tokens and NULL docs drop.  One explode → groupBy with map-side
    combine; the result is Zipf-small.
    """
    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    toks = df.select(F.explode(F.split(F.trim(c), r"\s+")).alias("word")) \
        .filter(F.length("word") > 0)
    return toks.groupBy("word").agg(F.count(F.lit(1)).alias("n"))


def train_bpe(word_freqs, *, n_merges: int = 1000, min_pair_count: int = 2,
              max_words: int = 1_000_000) -> tuple[list[tuple[str, str]], dict]:
    """Learn BPE merges from a (word, n) table.

    ``word_freqs`` is the DataFrame from ``word_frequency_table`` (or a
    plain ``[(word, n), ...]`` list in tests).  Only the top
    ``max_words`` words by (n desc, word asc) train; the audit dict
    reports ``coverage`` — the kept words' share of total token
    occurrences — so a capped run is visible, never silent.

    Returns ``(merges, audit)``: merges in learned order (their index
    IS the merge rank ``encode_word`` uses), audit =
    {n_words, total_occurrences, coverage, n_merges}.

    Incremental pair-count maintenance (the standard efficient
    trainer): a merge only touches the words that contain its pair, so
    a round costs O(words containing pair × word length), not a full
    vocabulary rescan.
    """
    if isinstance(word_freqs, DataFrame):
        rows = (word_freqs.orderBy(F.col("n").desc(), F.col("word").asc())
                .limit(max_words + 1).collect())
        pairs_in = [(r["word"], int(r["n"])) for r in rows]
        total = int(word_freqs.agg(F.sum("n")).first()[0] or 0)
    else:
        pairs_in = sorted(word_freqs, key=lambda t: (-t[1], t[0]))
        total = sum(n for _, n in word_freqs)
    capped = pairs_in[:max_words]
    kept_mass = sum(n for _, n in capped)
    audit = {"n_words": len(capped),
             "total_occurrences": total,
             "coverage": (kept_mass / total) if total else 1.0}

    # symbol sequences per word; word-final marker fused onto the last
    # character so mid-word and word-final units stay distinct
    words: list[list[str]] = []
    freqs: list[int] = []
    for w, n in capped:
        syms = list(w)
        syms[-1] = syms[-1] + END
        words.append(syms)
        freqs.append(n)

    from collections import defaultdict

    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for i, syms in enumerate(words):
        f = freqs[i]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += f
            pair_words[(a, b)].add(i)

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and pair_counts:
        # deterministic argmax: count desc, then lexicographic pair
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < min_pair_count:
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        for i in list(pair_words[best]):
            syms, f = words[i], freqs[i]
            # remove this word's contribution, rewrite, re-add
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= f
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                pair_words[(a, b)].discard(i)
            out: list[str] = []
            j = 0
            while j < len(syms):
                if (j < len(syms) - 1
                        and syms[j] == best[0] and syms[j + 1] == best[1]):
                    out.append(new_sym)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] += f
                pair_words[(a, b)].add(i)
    audit["n_merges"] = len(merges)
    return merges, audit


def encode_word(word: str, ranks: dict[tuple[str, str], int],
                cache: dict | None = None) -> list[str]:
    """Segment one word with a trained merge table (GPT-2 style:
    repeatedly apply the LOWEST-RANK pair present).  ``cache`` maps
    word → pieces; pass a per-task dict — Zipf makes the hit rate
    enormous."""
    if cache is not None and word in cache:
        return cache[word]
    syms = list(word)
    syms[-1] = syms[-1] + END
    while len(syms) > 1:
        best_rank, best_j = None, -1
        for j, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        syms[best_j:best_j + 2] = [syms[best_j] + syms[best_j + 1]]
    if cache is not None:
        cache[word] = syms
    return syms


def save_merges(spark, merges: list[tuple[str, str]], path: str) -> None:
    """Persist a merge table as (rank, left, right) parquet — rank IS
    the merge order, which encoding depends on."""
    spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank long, left string, right string").write \
        .mode("overwrite").parquet(path)


def load_merges(spark, path: str) -> list[tuple[str, str]]:
    """Load a ``save_merges`` table back in rank order."""
    return [(r["left"], r["right"]) for r in
            spark.read.parquet(path).orderBy("rank").collect()]


UNK = "<unk>"


def corpus_alphabet(word_freqs: DataFrame) -> list[str]:
    """The base symbol set of a trained tokenizer, derived from the
    SAME (word, n) table the trainer consumed: every character that
    occurs in any word, in both its mid-word form ``c`` and its
    word-final form ``c</w>`` (the trainer fuses END onto the last
    character, so both forms are reachable encode-time symbols).

    One explode → distinct over the Zipf-small word table — the result
    is alphabet-sized (hundreds of rows), never corpus-sized, so the
    driver collect is bounded by construction.
    """
    chars = (word_freqs
             .select(F.explode(F.split("word", "")).alias("c"))
             .filter(F.length("c") > 0).distinct())
    out: list[str] = []
    for r in chars.collect():
        out.append(r["c"])
        out.append(r["c"] + END)
    return sorted(out)


def build_vocab(merges: list[tuple[str, str]],
                alphabet: list[str]) -> dict[str, int]:
    """piece → id mapping, fully determined by (merges, alphabet):
    id 0 is ``<unk>`` (any piece outside the vocabulary — a character
    never seen at training time), then the sorted base alphabet, then
    one symbol per merge in rank order (exactly how subword-nmt and the
    GPT-2 tokenizer number their vocabularies: base symbols first,
    merged symbols in learned order).

    Two different merges can concatenate to the same surface string
    (``ab``+``c`` and ``a``+``bc`` both yield ``abc``); the first
    occurrence keeps its id and later duplicates are skipped, so ids
    stay dense and the mapping piece→id is a function.
    """
    vocab: dict[str, int] = {UNK: 0}
    for sym in sorted(set(alphabet)):
        vocab.setdefault(sym, len(vocab))
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    return vocab


def save_vocab(spark, vocab: dict[str, int], path: str) -> None:
    """Persist a vocabulary as (id, piece) parquet."""
    spark.createDataFrame(sorted((i, p) for p, i in vocab.items()),
                          "id long, piece string").write \
        .mode("overwrite").parquet(path)


def load_vocab(spark, path: str) -> dict[str, int]:
    """Load a ``save_vocab`` table back as piece → id."""
    return {r["piece"]: int(r["id"])
            for r in spark.read.parquet(path).collect()}


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               vocab: dict[str, int], *, text_col: str,
               out_col: str = "token_ids",
               lowercase: bool = True) -> DataFrame:
    """Append ``out_col`` = the text's BPE token ids (``array<int>``)
    to every input row — the stage that turns packed shards into
    model-ready training data (ids, not strings, are what a trainer
    memory-maps).  NULL text encodes to an empty array; pieces outside
    the vocabulary map to id 0 (``<unk>``).

    Scale shape: the merge table and vocabulary broadcast (a few 10k
    entries each); encoding runs in Arrow batches with a per-task
    word → ids cache, so the cost is per *distinct* word per task —
    Zipf makes the hit rate enormous.  This deliberately mirrors
    ``with_bpe_piece_counts`` (same broadcast + cache shape) rather
    than the distinct-word-join alternative: the join would trade one
    extra corpus shuffle (explode → join → re-collect in order) for
    cache misses the cache already absorbs.
    """
    from pyspark.sql import types as T

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        ({pair: i for i, pair in enumerate(merges)}, dict(vocab)))
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.IntegerType(), False))])

    def enc(batches):
        ranks, voc = bc.value
        unk = voc[UNK]
        cache: dict = {}
        ids_cache: dict[str, list[int]] = {}

        def word_ids(w: str) -> list[int]:
            got = ids_cache.get(w)
            if got is None:
                got = [voc.get(p, unk)
                       for p in encode_word(w, ranks, cache)]
                ids_cache[w] = got
            return got

        def doc_ids(t):
            if t is None:
                return []
            out: list[int] = []
            for w in (t.lower() if lowercase else t).split():
                out.extend(word_ids(w))
            return out

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [doc_ids(t) for t in pdf[text_col]]
            yield pdf

    return df.mapInPandas(enc, schema)


def with_bpe_piece_counts(df: DataFrame, merges: list[tuple[str, str]], *,
                          text_col: str, out_col: str = "n_pieces",
                          lowercase: bool = True) -> DataFrame:
    """Append ``out_col`` = BPE piece count of ``text_col`` to EVERY
    input row (all columns preserved) — the tokenizer-aware length
    used when packing capacity is denominated in model tokens, not
    whitespace words (``shard_cli --bpe-merges``).  Same broadcast +
    per-task word cache as ``bpe_segment``."""
    import pandas as pd

    from pyspark.sql import types as T

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        {pair: i for i, pair in enumerate(merges)})
    schema = T.StructType(list(df.schema.fields)
                          + [T.StructField(out_col, T.LongType())])

    def count(batches):
        ranks = bc.value
        cache: dict = {}

        def pieces(t):
            if t is None:
                return 0
            toks = (t.lower() if lowercase else t).split()
            return sum(len(encode_word(w, ranks, cache)) for w in toks)

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [pieces(t) for t in pdf[text_col]]
            yield pdf

    return df.mapInPandas(count, schema)


def bpe_segment(df: DataFrame, merges: list[tuple[str, str]], *,
                text_col: str = "text", id_col: str = "doc_id",
                lowercase: bool = True) -> DataFrame:
    """Per-document BPE stats under a trained tokenizer:
    (id_col, n_words, n_pieces, pieces_per_word).

    The merge table broadcasts (a list of a few 10k pairs); encoding
    runs in Arrow batches with a per-task word cache — per unique word,
    not per occurrence.  This is the real token-count input to
    ``chunk_documents``/``pack_sequences`` capacity planning:
    whitespace counts underestimate sequence length by exactly
    ``pieces_per_word``.
    """
    import pandas as pd

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        {pair: i for i, pair in enumerate(merges)})
    src = df.select(F.col(id_col).alias("_id"),
                    F.coalesce(F.col(text_col), F.lit("")).alias("_t"))

    def seg(batches):
        ranks = bc.value
        cache: dict = {}
        for pdf in batches:
            ids, n_words, n_pieces = [], [], []
            for i, t in zip(pdf["_id"], pdf["_t"]):
                toks = (t.lower() if lowercase else t).split()
                pieces = 0
                for w in toks:
                    pieces += len(encode_word(w, ranks, cache))
                ids.append(i)
                n_words.append(len(toks))
                n_pieces.append(pieces)
            yield pd.DataFrame({"_id": ids, "n_words": n_words,
                                "n_pieces": n_pieces})

    out = src.mapInPandas(seg, "_id long, n_words long, n_pieces long")
    return out.select(
        F.col("_id").alias(id_col), "n_words", "n_pieces",
        F.when(F.col("n_words") > 0,
               F.col("n_pieces") / F.col("n_words")
               ).alias("pieces_per_word"))
