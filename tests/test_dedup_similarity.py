"""Dedup + similarity operators on planted corpora (known ground truth)."""

import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.operators.dedup import (exact_dedup, minhash_lsh_pairs,
                                               ngram_jaccard_pairs, simhash,
                                               simhash_pairs)
from khl_pdf_ocr_spark.operators.similarity import (cosine_topk,
                                                    embedding_near_dup_pairs,
                                                    lsh_ann_topk)

BASE = ("the quick brown fox jumps over the lazy dog while the spark engine "
        "shuffles columnar batches across executors in the cluster every day")


@pytest.fixture(scope="module")
def planted_docs(spark):
    rows = [
        (0, BASE, "s"),
        (1, BASE, "s"),                                   # exact dup of 0
        (2, BASE + " tail", "s"),                          # near dup of 0
        (3, BASE.replace("quick", "rapid"), "s"),          # near dup of 0
        (4, "completely different text about databases and query planners "
            "with nothing shared at all beyond english itself", "s"),
        (5, "another unrelated document mentioning volcanoes glaciers and "
            "tectonic plates moving slowly over millennia", "s"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_exact_dedup_groups(planted_docs):
    out = exact_dedup(planted_docs).collect()
    groups = {r["keep_id"]: r["n_dups"] for r in out}
    assert groups[0] == 2          # docs 0 and 1 collapse
    assert len(out) == 5           # 6 docs → 5 fingerprints


def test_ngram_jaccard_finds_planted_pairs(planted_docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(planted_docs, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.9
    assert (0, 3) in pairs
    assert not any(4 in p or 5 in p for p in pairs)


def test_minhash_lsh_finds_planted_pairs(planted_docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in minhash_lsh_pairs(planted_docs, verify_threshold=0.5).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs
    # verification step guarantees no false positives above threshold
    assert all(j >= 0.5 for j in pairs.values())
    assert not any(4 in p or 5 in p for p in pairs)


def test_exact_dedup_incremental_two_batches(spark):
    """Day-2 increment: batch dups lose the min-id race, history dups
    are rejected against the ledger, and the ledger grows by exactly
    the kept fingerprints."""
    from khl_pdf_ocr_spark.operators.dedup import exact_dedup_incremental

    day1 = spark.createDataFrame(
        [(0, BASE, "s"), (1, "fresh doc one about volcano geology", "s")],
        ["doc_id", "text", "source"])
    empty_seen = spark.createDataFrame([], "fingerprint string")
    kept1, fps1, ledger1 = exact_dedup_incremental(day1, empty_seen)
    assert {r["doc_id"] for r in kept1.collect()} == {0, 1}
    assert ledger1.count() == 0
    assert fps1.count() == 2

    day2 = spark.createDataFrame(
        [(10, BASE, "s"),                    # seen on day 1 → history dup
         (11, "brand new day two document about glaciers", "s"),
         (12, "brand new day two document about glaciers", "s"),  # batch dup
         (13, BASE, "s")],                   # batch dup of 10 AND historical
        ["doc_id", "text", "source"])
    kept2, fps2, ledger2 = exact_dedup_incremental(day2, fps1)
    assert {r["doc_id"] for r in kept2.collect()} == {11}
    reasons = {r["id"]: r["reject_reason"] for r in ledger2.collect()}
    assert reasons == {10: "exact_dup_history",
                       12: "exact_dup_batch",
                       13: "exact_dup_batch"}
    # every day-2 row lands in exactly one of kept/ledger
    assert kept2.count() + ledger2.count() == 4
    assert fps2.count() == 1  # only the genuinely new fingerprint


def test_exact_dedup_incremental_null_text_never_vanishes(spark):
    """NULL-text rows must land in kept-or-ledger, never disappear (an
    equi-join on a NULL fingerprint matches nothing), and must NOT
    collapse into one survivor — two unrelated docs that both failed
    text extraction are not duplicates of each other (review finding).
    Their per-row sentinels also stay out of the fingerprint ledger."""
    from khl_pdf_ocr_spark.operators.dedup import exact_dedup_incremental

    df = spark.createDataFrame(
        [(0, None, "s"), (1, None, "s"), (2, "real text here", "s")],
        "doc_id long, text string, source string")
    seen = spark.createDataFrame([], "fingerprint string")
    kept, fps, ledger = exact_dedup_incremental(df, seen)
    assert {r["doc_id"] for r in kept.collect()} == {0, 1, 2}
    assert ledger.count() == 0
    assert fps.count() == 1  # only the real fingerprint enters history

    # next increment: NULL-text rows still pass through (no history hit)
    day2 = spark.createDataFrame([(10, None, "s")],
                                 "doc_id long, text string, source string")
    kept2, _, ledger2 = exact_dedup_incremental(day2, fps)
    assert kept2.count() == 1 and ledger2.count() == 0


def test_simhash_distance_reflects_similarity(planted_docs):
    sh = {r["id"]: r["simhash"] for r in simhash(planted_docs).collect()}
    assert sh[0] == sh[1]  # identical text → identical simhash

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(sh[0], sh[2]) < ham(sh[0], sh[4])


def test_simhash_pairs_banding(planted_docs):
    pairs = {(r["id_a"], r["id_b"]) for r in
             simhash_pairs(planted_docs, max_hamming=6).collect()}
    assert (0, 1) in pairs
    assert not any((a, b) in pairs for a in (0, 1, 2, 3) for b in (4, 5))


@pytest.fixture(scope="module")
def planted_vecs(spark):
    # axis-aligned vectors: known cosine structure
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0, 0.0], 0),   # close to 0
        (2, [0.0, 1.0, 0.0, 0.0], 0),   # orthogonal
        (3, [0.7, 0.7, 0.0, 0.0], 1),
        (4, [-1.0, 0.0, 0.0, 0.0], 1),  # opposite
        (5, [1.0, 0.05, 0.0, 0.0], 1),  # closest to 0
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_cosine_topk_order(planted_vecs):
    out = cosine_topk(planted_vecs, [1.0, 0.0, 0.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in out] == [0, 5, 1]
    assert out[0]["cos_sim"] == 1.0


def test_lsh_ann_contains_true_top1(planted_vecs):
    out = lsh_ann_topk(planted_vecs, [1.0, 0.0, 0.0, 0.0], k=3, nbits=4).collect()
    assert out, "ANN returned nothing"
    assert out[0]["vec_id"] == 0  # exact match must be in its own bucket


def test_embedding_near_dup_blocked_by_label(planted_vecs):
    pairs = {(r["id_a"], r["id_b"]) for r in
             embedding_near_dup_pairs(planted_vecs, threshold=0.9,
                                      dim=4).collect()}
    assert (0, 1) in pairs          # same label, cos ≈ 0.994
    assert (3, 5) not in pairs      # same label but cos ≈ 0.74
    assert not any(a == 0 and b == 5 for a, b in pairs)  # cross-label blocked


def test_embedding_near_dup_hot_block_guard(spark):
    """A blocking value larger than max_block must route through the
    LSH fallback (bounded candidates), not all-pairs — and still find
    planted near-identical dups inside the hot block."""
    import random as _random

    rng = _random.Random(11)
    rows = []
    # hot label: 24 rows incl. a planted near-identical pair (100, 101)
    base = [1.0, 0.02, 0.0, 0.0]
    rows.append((100, base, 0))
    rows.append((101, [1.0, 0.021, 0.0005, 0.0], 0))  # cos ≈ 1.0 with 100
    for i in range(22):
        v = [rng.gauss(0, 1) for _ in range(4)]
        rows.append((200 + i, v, 0))
    # cold label: small block, all-pairs path, one planted pair
    rows.append((300, [0.0, 0.0, 1.0, 0.0], 1))
    rows.append((301, [0.0, 0.0, 1.0, 0.01], 1))
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])

    out = embedding_near_dup_pairs(df, threshold=0.98, max_block=8,
                                   nbits=2, dim=4)
    pairs = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in out.collect()}
    assert (100, 101) in pairs      # hot block, found via LSH fallback
    assert (300, 301) in pairs      # cold block, exact all-pairs
    assert all(v >= 0.98 for v in pairs.values())  # verification exact
    # same-block restriction holds on the routed path too
    assert not any((a < 300) != (b < 300) for a, b in pairs)

    # the guard requires a lazily-resolvable dim
    with pytest.raises(ValueError, match="dimension unknown"):
        embedding_near_dup_pairs(df, threshold=0.9, max_block=8)
    # guard off → no dim needed (legacy all-pairs behavior)
    legacy = {(r["id_a"], r["id_b"]) for r in
              embedding_near_dup_pairs(df, threshold=0.98,
                                       max_block=None).collect()}
    assert (100, 101) in legacy and (300, 301) in legacy


def test_dedup_single_shuffle_plan(planted_docs):
    plan = exact_dedup(planted_docs)._jdf.queryExecution().executedPlan().toString()
    # map-side partial agg around exactly one exchange
    assert plan.count("Exchange") == 1, plan


def test_lsh_near_dup_pairs(planted_vecs):
    from khl_pdf_ocr_spark.operators.similarity import lsh_near_dup_pairs

    pairs = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in
             lsh_near_dup_pairs(planted_vecs, threshold=0.9, nbits=3, dim=4).collect()}
    assert (0, 1) in pairs          # cos ≈ 0.994, same half-space w.h.p.
    assert all(v >= 0.9 for v in pairs.values())


def test_lsh_near_dup_composition_runs_zero_jobs(spark, planted_vecs):
    """Plan construction must stay lazy (no hidden dimension-probe job)."""
    from khl_pdf_ocr_spark.operators.similarity import lsh_near_dup_pairs

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    df = lsh_near_dup_pairs(planted_vecs, threshold=0.9, nbits=3, dim=4)
    _ = df.schema  # analysis only — still no job
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before

    import pytest as _pytest
    with _pytest.raises(ValueError, match="dimension unknown"):
        lsh_near_dup_pairs(planted_vecs, threshold=0.9, nbits=3)


def test_ivf_ann_topk(spark):
    from khl_pdf_ocr_spark.operators.similarity import cosine_topk, ivf_ann_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = [r[0] for r in emb.filter(F.col("vec_id") == 0)
          .select(F.explode("embedding")).collect()]
    exact = [r["vec_id"] for r in cosine_topk(emb, qv, k=5).collect()]
    approx = ivf_ann_topk(emb, qv, k=5, n_centroids=8, nprobe=3).collect()
    assert len(approx) == 5
    # the query's own vector lives in the probed cell → rank 1, sim 1.0
    assert approx[0]["vec_id"] == 0 and approx[0]["cos_sim"] == 1.0
    # decent recall vs exact top-5
    assert len(set(exact) & {r["vec_id"] for r in approx}) >= 2


def test_connected_components_chain_and_clique(spark):
    """Pointer-doubling label propagation: a long chain (the shape the
    hot-bucket chain bound produces) and a separate clique both resolve
    to min-id components within O(log n) rounds."""
    from khl_pdf_ocr_spark.operators.dedup import connected_components

    chain = [(i, i + 1) for i in range(30)]            # 0-1-2-…-30
    clique = [(100, 101), (100, 102), (101, 102)]      # triangle
    pairs = spark.createDataFrame(chain + clique, ["id_a", "id_b"])
    comp = {r["id"]: r["component"]
            for r in connected_components(pairs, max_iter=8).collect()}
    assert all(comp[i] == 0 for i in range(31))
    assert all(comp[i] == 100 for i in (100, 101, 102))


def test_clean_corpus_components_policy(spark):
    """(A,C),(B,C) transitive cluster: pair policy keeps A and B;
    component policy keeps only the min id."""
    from khl_pdf_ocr_spark.corpus import clean_corpus

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest with all of its friends today "
            "for a very long walk in the woods and the meadows of the land")
    rows = [(0, base + " alpha tail", "s"),
            (1, base + " bravo tail", "s"),
            (2, base, "s"),
            (9, "a completely different quite long document about the "
                "history of steam engines and the railways of the early "
                "nineteenth century with plenty of ordinary prose words", "s")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])

    kept_p, _ = clean_corpus(df, allowed_langs=("en", "ru", "other"),
                             min_quality=0.0, near_dup_threshold=0.5)
    kept_c, ledger_c = clean_corpus(df, allowed_langs=("en", "ru", "other"),
                                    min_quality=0.0, near_dup_threshold=0.5,
                                    near_dup_policy="components")
    ids_c = {r["doc_id"] for r in kept_c.select("doc_id").collect()}
    assert ids_c == {0, 9}  # one representative per transitive cluster
    assert {r["id"] for r in ledger_c.filter("reject_reason = 'near_dup'")
            .collect()} == {1, 2}
    # pair policy keeps at least as many rows as component policy
    assert kept_p.count() >= kept_c.count()


def test_connected_components_random_graphs_vs_union_find(spark):
    """Randomized cross-check against a plain union-find."""
    import random as _random

    from khl_pdf_ocr_spark.operators.dedup import connected_components

    for seed in (3, 17):
        rng = _random.Random(seed)
        ids = list(range(40))
        edges = [(min(a, b), max(a, b))
                 for a, b in (rng.sample(ids, 2) for _ in range(25))]
        parent = {i: i for i in ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        touched = {i for e in edges for i in e}
        want = {i: min(j for j in touched if find(j) == find(i))
                for i in touched}

        pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
        got = {r["id"]: r["component"]
               for r in connected_components(pairs).collect()}
        assert got == want, f"seed {seed}"


def test_connected_components_string_ids(spark):
    """Convergence must be type-agnostic — string ids (e.g. urls) are
    the pipeline's natural near-dup key."""
    from khl_pdf_ocr_spark.operators.dedup import connected_components

    chain = [(f"n{i}", f"n{i+1}") for i in range(8)]  # n0-…-n8 path
    pairs = spark.createDataFrame(chain + [("z1", "z2")], ["id_a", "id_b"])
    comp = {r["id"]: r["component"]
            for r in connected_components(pairs).collect()}
    assert all(comp[f"n{i}"] == "n0" for i in range(9))
    assert comp["z1"] == comp["z2"] == "z1"


# ---------------------------------------------------------------------------
# incremental MinHash LSH (round 4): new batch vs persisted signature store
# ---------------------------------------------------------------------------


def test_minhash_lsh_incremental_batch_and_history(spark):
    from khl_pdf_ocr_spark.operators.dedup import (minhash_lsh_incremental,
                                                   minhash_signatures)

    base = ("the quick brown fox jumps over the lazy dog while the cat "
            "watches from the warm windowsill in the afternoon sun light")
    day1 = spark.createDataFrame(
        [(100, base, "d1"),
         (101, "completely unrelated text about quantum chromodynamics "
               "and lattice gauge theory simulations on supercomputers", "d1")],
        ["doc_id", "text", "source"])
    store = minhash_signatures(day1)          # (id, sig) — the ledger

    day2 = spark.createDataFrame(
        [(200, base, "d2"),                                     # dup of 100
         (201, base + " extra tail words appended here", "d2"), # near-dup
         (202, "fresh document about gardening tools and seasonal "
               "planting schedules for temperate climates", "d2"),  # novel
         (203, "fresh document about gardening tools and seasonal "
               "planting schedules for temperate climates", "d2")],  # dup in batch
        ["doc_id", "text", "source"])

    pairs, new_sigs = minhash_lsh_incremental(day2, store,
                                              verify_threshold=0.5)
    rows = pairs.collect()
    hist = {(r["id_a"], r["id_b"]): r["jaccard"] for r in rows
            if r["match_kind"] == "history"}
    batch = {(r["id_a"], r["id_b"]): r["jaccard"] for r in rows
             if r["match_kind"] == "batch"}

    # identical doc → estimator exactly 1.0 against the stored signature
    assert hist[(200, 100)] == 1.0
    # near-dup: high estimate, not tied to the unrelated stored doc
    assert (201, 100) in hist and hist[(201, 100)] >= 0.5
    assert all(b != 101 for (_, b) in hist)
    # novel docs: no history rows; their in-batch duplicate IS found
    assert all(a not in (202, 203) for (a, _) in hist)
    assert batch[(202, 203)] == 1.0
    # the store append half: one signature row per new doc
    got = new_sigs.collect()
    assert {r["id"] for r in got} == {200, 201, 202, 203}
    assert all(len(r["sig"]) == 64 for r in got)


def test_minhash_lsh_incremental_hot_history_bucket_bounded(spark):
    """300 identical docs in the STORE must not explode the new-batch
    probe into 300 candidates per new doc: hot history buckets truncate
    to max_bucket members and the audit exposes them."""
    from khl_pdf_ocr_spark.operators.dedup import (minhash_lsh_incremental,
                                                   minhash_signatures)

    boiler = "the same boilerplate footer text repeated on every single page " * 4
    hist_docs = spark.createDataFrame(
        [(i, boiler, "h") for i in range(300)], ["doc_id", "text", "source"]
    ).repartition(8)
    store = minhash_signatures(hist_docs)
    day2 = spark.createDataFrame([(1000, boiler, "d2")],
                                 ["doc_id", "text", "source"])
    audit: dict = {}
    pairs, _ = minhash_lsh_incremental(day2, store, max_bucket=8,
                                       audit=audit)
    hist_rows = [r for r in pairs.collect() if r["match_kind"] == "history"]
    # every surviving candidate verifies at 1.0, but candidate count is
    # bounded by the truncated bucket membership, not the full 300
    assert 0 < len(hist_rows) <= 8
    assert all(r["jaccard"] == 1.0 for r in hist_rows)
    hot = audit["hot_history_buckets"].collect()
    assert hot and all(r["bucket_size"] == 300 for r in hot)


def test_simhash_incremental_exact_history_verification(spark):
    """The simhash store carries the COMPLETE similarity state, so
    history matches verify exactly (hamming on stored hashes) — no
    estimator involved."""
    from khl_pdf_ocr_spark.operators.dedup import (simhash,
                                                   simhash_incremental)

    base = ("the quick brown fox jumps over the lazy dog while the cat "
            "watches from the warm windowsill in the afternoon sun light")
    day1 = spark.createDataFrame(
        [(100, base, "h"),
         (101, "completely unrelated text about quantum chromodynamics "
               "and lattice gauge theory simulations on supercomputers", "h")],
        ["doc_id", "text", "source"])
    store = simhash(day1)

    day2 = spark.createDataFrame(
        [(200, base, "d"),                                      # identical
         (201, base.replace("afternoon", "morning"), "d"),      # near
         (202, "fresh document about gardening tools and seasonal "
               "planting schedules for temperate climates", "d"),
         (203, "fresh document about gardening tools and seasonal "
               "planting schedules for temperate climates", "d")],
        ["doc_id", "text", "source"])
    pairs, new_hashes = simhash_incremental(day2, store, max_hamming=6)
    rows = pairs.collect()
    hist = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows
            if r["match_kind"] == "history"}
    batch = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows
             if r["match_kind"] == "batch"}
    assert hist[(200, 100)] == 0                  # identical → distance 0
    assert (201, 100) in hist and 0 < hist[(201, 100)] <= 6
    assert all(b != 101 for (_, b) in hist)       # unrelated never matches
    assert all(a not in (202, 203) for (a, _) in hist)
    assert batch[(202, 203)] == 0                 # in-batch dup still found
    # exactness cross-check: hamming equals the direct XOR popcount of
    # the stored and new hashes
    sh_store = {r["id"]: r["simhash"] for r in store.collect()}
    sh_new = {r["id"]: r["simhash"] for r in new_hashes.collect()}
    want = bin((sh_new[201] ^ sh_store[100]) & ((1 << 64) - 1)).count("1")
    assert hist[(201, 100)] == want
