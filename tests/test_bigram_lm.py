"""Interpolated bigram LM: training counts, conditional probabilities,
Jelinek-Mercer scoring — checked against an independent pure-Python
reimplementation (counts via dicts, same truncation rule, same
interpolation formula)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.operators.textstats import (bigram_logprob_scores,
                                                   train_bigram_lm)

LN10 = 2.302585092994046


def _py_lm(texts, vocab_size=65_536, bigram_size=1_048_576):
    """Independent trainer: same contract, dict arithmetic."""
    uni, bi = {}, {}
    for t in texts:
        toks = [w for w in (t or "").split() if w]
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    total = sum(uni.values()) or 1
    uni_top = sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    uni_lm = {w: math.log(n) - math.log(float(total)) for w, n in uni_top}
    n1 = {}
    for (a, _), n in bi.items():
        n1[a] = n1.get(a, 0) + n
    bi_top = sorted(bi.items(),
                    key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:bigram_size]
    bi_lm = {p: math.log(n) - math.log(float(n1[p[0]]))
             for p, n in bi_top}
    return uni_lm, bi_lm


def _py_score(text, uni_lm, bi_lm, lam=0.7):
    toks = [w for w in (text or "").split() if w]
    if not toks:
        return 0, None
    oov = min(uni_lm.values()) - LN10
    lps = []
    for i, w in enumerate(toks):
        pu = math.exp(uni_lm.get(w, oov))
        if i == 0:
            lps.append(uni_lm.get(w, oov))
        else:
            pb = math.exp(bi_lm[(toks[i - 1], w)]) \
                if (toks[i - 1], w) in bi_lm else 0.0
            lps.append(math.log(lam * pb + (1 - lam) * pu))
    return len(lps), sum(lps) / len(lps)


def _corpus(n=40, seed=11):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(18)]
    rows = []
    for d in range(n):
        ln = rng.randint(3, 30)
        rows.append((d, " ".join(rng.choice(vocab) for _ in range(ln))))
    rows += [(n, ""), (n + 1, None), (n + 2, "solo")]
    return rows


def test_hand_traced_conditional_probs(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the cat sat on the rug"),
         (3, "mat the on sat cat the")], ["doc_id", "text"])
    uni, bi = train_bigram_lm(df)
    b = {(r["token"], r["next"]): r["logprob"] for r in bi.collect()}
    # c(the,cat)=2, n1(the)=5 (the-cat x2, the-mat, the-rug, the-on)
    assert b[("the", "cat")] == pytest.approx(math.log(2 / 5), abs=1e-12)
    # c(mat,the)=1, n1(mat)=1
    assert b[("mat", "the")] == pytest.approx(0.0, abs=1e-12)
    u = {r["token"]: r["logprob"] for r in uni.collect()}
    assert u["the"] == pytest.approx(math.log(6 / 18), abs=1e-12)


def test_scores_match_python_oracle(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    uni, bi = train_bigram_lm(df)
    uni_py, bi_py = _py_lm([t for _, t in rows])
    # trained tables agree exactly
    assert {r["token"]: r["logprob"] for r in uni.collect()} \
        == pytest.approx(uni_py, abs=1e-12)
    assert {(r["token"], r["next"]): r["logprob"] for r in bi.collect()} \
        == pytest.approx(bi_py, abs=1e-12)
    got = {r["doc_id"]: (r["n_scored_tokens"], r["avg_logprob"])
           for r in bigram_logprob_scores(df, uni, bi).collect()}
    for d, t in rows:
        n, s = _py_score(t, uni_py, bi_py)
        assert got[d][0] == n, f"doc {d}"
        if s is None:
            assert got[d][1] is None, f"doc {d}"
        else:
            assert got[d][1] == pytest.approx(s, abs=1e-9), f"doc {d}"


def test_truncated_bigram_table_falls_back_to_unigram_share(spark):
    rows = _corpus(n=30, seed=5)
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    uni, bi = train_bigram_lm(df, bigram_size=10)   # aggressive cut
    assert bi.count() == 10
    uni_py, bi_py = _py_lm([t for _, t in rows], bigram_size=10)
    got = {r["doc_id"]: r["avg_logprob"]
           for r in bigram_logprob_scores(df, uni, bi).collect()}
    for d, t in rows:
        _, s = _py_score(t, uni_py, bi_py)
        if s is not None:
            assert got[d] == pytest.approx(s, abs=1e-9), f"doc {d}"


def test_word_order_sensitivity_beyond_unigram(spark):
    """The reason to go bigram: a token scramble keeps its unigram
    score bit-for-bit but collapses under the bigram model."""
    from khl_pdf_ocr_spark.operators.textstats import (
        train_unigram_lm, unigram_logprob_scores)

    ordered = "the cat sat on the mat and the dog sat on the rug"
    toks = ordered.split()
    random.Random(3).shuffle(toks)
    scrambled = " ".join(toks)
    df = spark.createDataFrame(
        [(1, ordered), (2, scrambled),
         (3, "the cat sat on the rug and the dog sat on the mat")],
        ["doc_id", "text"])
    uni, bi = train_bigram_lm(df)
    u_lm = train_unigram_lm(df)
    u = {r["doc_id"]: r["avg_logprob"]
         for r in unigram_logprob_scores(df, u_lm).collect()}
    b = {r["doc_id"]: r["avg_logprob"]
         for r in bigram_logprob_scores(df, uni, bi).collect()}
    assert u[1] == pytest.approx(u[2], abs=1e-12)   # unigram is blind
    assert b[1] > b[2] + 0.1                         # bigram is not


def test_lam_validation_and_single_token_doc(spark):
    df = spark.createDataFrame([(1, "solo")], ["doc_id", "text"])
    uni, bi = train_bigram_lm(df)
    with pytest.raises(ValueError):
        bigram_logprob_scores(df, uni, bi, lam=1.0)
    r = bigram_logprob_scores(df, uni, bi).collect()[0]
    # one token, no transitions: pure unigram score ln(1/1) = 0
    assert (r["n_scored_tokens"], r["avg_logprob"]) == (1, 0.0)
