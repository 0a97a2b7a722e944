"""SemDeDup (operators/semdedup.py) vs an independent numpy model.

The oracle recomputes the whole method — argmin-distance cells,
within-cell cosine pairs at the same half-up 6-dp rounding, union-find
components, survivor election — from the raw vectors, sharing nothing
with the Spark implementation but the centroid list."""

from __future__ import annotations

import math

import pytest

from khl_pdf_ocr_spark.operators.semdedup import semdedup


def _r6(x: float) -> float:
    # the shared cross-engine rounding formula (functions/rounding.py)
    return math.floor(x * 1e6 + 0.5) / 1e6


def _cos(a, b):
    import numpy as np

    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def _oracle(ids, vecs, centroids, threshold, keep):
    """Pure-Python SemDeDup: returns the kept id set."""
    import numpy as np

    cents = [np.asarray(c, dtype=float) for c in centroids]
    cell = {i: min(range(len(cents)),
                   key=lambda j: float(np.sum((np.asarray(v, float)
                                               - cents[j]) ** 2)))
            for i, v in zip(ids, vecs)}
    vec = {i: np.asarray(v, float) for i, v in zip(ids, vecs)}
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in ids:
        for b in ids:
            if a < b and cell[a] == cell[b] \
                    and _r6(_cos(vec[a], vec[b])) >= threshold:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    groups: dict = {}
    for i in ids:
        groups.setdefault(find(i), []).append(i)
    kept = set()
    for g in groups.values():
        if len(g) == 1:
            kept.add(g[0])
            continue
        if keep == "min_id":
            kept.add(min(g))
        else:
            sims = {i: _r6(_cos(vec[i], cents[cell[i]])) for i in g}
            sign = 1 if keep == "farthest" else -1
            kept.add(min(g, key=lambda i: (sign * sims[i], i)))
    return kept


def _planted():
    """Two well-separated clusters; a 3-member duplicate group near
    c0 (graded distances from the centroid), singles, and a 2-member
    group near c1."""
    c0, c1 = [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]
    rows = [
        ("a1", [1.0, 0.01, 0.0, 0.0]),     # dup group A (closest to c0)
        ("a2", [1.0, 0.02, 0.01, 0.0]),    # dup group A
        ("a3", [1.0, 0.03, 0.02, 0.01]),   # dup group A (farthest)
        ("s1", [0.8, 0.0, 0.6, 0.0]),      # single near c0
        ("b1", [0.01, 1.0, 0.0, 0.0]),     # dup group B
        ("b2", [0.02, 1.0, 0.01, 0.0]),    # dup group B (farthest)
        ("s2", [0.0, 0.8, 0.0, 0.6]),      # single near c1
    ]
    return rows, [c0, c1]


def test_planted_groups_keep_farthest(spark):
    rows, cents = _planted()
    df = spark.createDataFrame(rows, "doc_id string, embedding array<double>")
    kept, dropped = semdedup(df, cents, threshold=0.98, dim=4)
    kept_ids = {r.doc_id for r in kept.collect()}
    assert kept_ids == {"a3", "s1", "b2", "s2"}  # farthest member survives
    led = dropped.collect()
    assert {r.id for r in led} == {"a1", "a2", "b1"}
    assert {r.reject_reason for r in led} == {"semantic_dup"}
    # conservation: every input id lands in exactly one output
    assert kept_ids | {r.id for r in led} == {i for i, _ in rows}


def test_keep_variants(spark):
    rows, cents = _planted()
    df = spark.createDataFrame(rows, "doc_id string, embedding array<double>")
    kept_c, _ = semdedup(df, cents, threshold=0.98, keep="closest", dim=4)
    assert {r.doc_id for r in kept_c.collect()} == {"a1", "s1", "b1", "s2"}
    kept_m, _ = semdedup(df, cents, threshold=0.98, keep="min_id", dim=4)
    assert {r.doc_id for r in kept_m.collect()} == {"a1", "s1", "b1", "s2"}
    with pytest.raises(ValueError, match="unknown keep rule"):
        semdedup(df, cents, keep="best")


@pytest.mark.parametrize("keep", ["farthest", "closest", "min_id"])
def test_matches_numpy_oracle(spark, keep):
    """120 deterministic synthetic vectors around 4 centroids, several
    forced duplicate knots — Spark kept set == pure-Python model."""
    import numpy as np

    rng = np.random.RandomState(7)
    cents = np.eye(4) + rng.normal(0, 0.05, (4, 4))
    ids, vecs = [], []
    for i in range(120):
        base = cents[i % 4] + rng.normal(0, 0.15, 4)
        ids.append(f"v{i:03d}")
        vecs.append([float(x) for x in base])
        if i % 9 == 0:  # knot: two tight companions of this vector
            for j in (1, 2):
                ids.append(f"v{i:03d}k{j}")
                vecs.append([float(x) for x in
                             base + rng.normal(0, 0.004, 4)])
    df = spark.createDataFrame(list(zip(ids, vecs)),
                               "doc_id string, embedding array<double>")
    cent_list = [[float(x) for x in c] for c in cents]
    kept, _ = semdedup(df, cent_list, threshold=0.999, keep=keep, dim=4)
    got = {r.doc_id for r in kept.collect()}
    want = _oracle(ids, vecs, cent_list, 0.999, keep)
    assert got == want
    assert len(got) < len(ids)  # the knots actually deduped


def test_cell_boundary_blind_spot_documented(spark):
    """A near-identical pair straddling the quantizer boundary is never
    compared — the method's disclosed blind spot stays observable."""
    cents = [[1.0, 0.0], [0.0, 1.0]]
    df = spark.createDataFrame(
        [("x", [0.72, 0.69]), ("y", [0.69, 0.72])],
        "doc_id string, embedding array<double>")
    kept, dropped = semdedup(df, cents, threshold=0.95, dim=2)
    assert kept.count() == 2 and dropped.count() == 0


def test_no_cartesian_in_plan(spark):
    rows, cents = _planted()
    df = spark.createDataFrame(rows, "doc_id string, embedding array<double>")
    kept, _ = semdedup(df, cents, threshold=0.98, dim=4)
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_mllib_quantizer_end_to_end(spark):
    """The production path: centroids from the distributed MLlib fit
    feed the same operator; planted knots still collapse to one
    survivor each."""
    from khl_pdf_ocr_spark.operators.ann_index import mllib_centroids

    rows, _ = _planted()
    df = spark.createDataFrame(rows, "doc_id string, embedding array<double>")
    cents = mllib_centroids(df, 2, seed=11)
    kept, dropped = semdedup(df, cents, threshold=0.98, dim=4)
    assert kept.count() == 4 and dropped.count() == 3


# ---------------------------------------------------------------------------
# D4 prototype pruning + cluster caps (round 5 session 6)
# ---------------------------------------------------------------------------


def _proto_oracle(ids, vecs, centroids, drop_fraction):
    """Pure-Python D4 prototype pruning: returns the DROPPED id set."""
    import numpy as np

    cents = [np.asarray(c, dtype=float) for c in centroids]
    cell = {i: min(range(len(cents)),
                   key=lambda j: float(np.sum((np.asarray(v, float)
                                               - cents[j]) ** 2)))
            for i, v in zip(ids, vecs)}
    vec = {i: np.asarray(v, float) for i, v in zip(ids, vecs)}
    dropped = set()
    for c in set(cell.values()):
        members = [i for i in ids if cell[i] == c]
        # most prototypical first (csim desc, id asc), floor(n*f) drop
        ranked = sorted(members,
                        key=lambda i: (-_r6(_cos(vec[i], cents[cell[i]])),
                                       i))
        k = int(len(members) * drop_fraction)
        dropped.update(ranked[:k])
    return dropped


def test_prune_prototypes_matches_numpy_oracle(spark):
    import numpy as np

    from khl_pdf_ocr_spark.operators.semdedup import prune_prototypes

    rng = np.random.RandomState(11)
    cents = [[3.0, 0.0, 0.0], [0.0, 3.0, 0.0], [0.0, 0.0, 3.0]]
    rows = []
    for i in range(90):
        c = cents[i % 3]
        rows.append((i, [float(x + rng.normal(0, 0.4)) for x in c]))
    df = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    kept, ledger = prune_prototypes(df, cents, drop_fraction=0.3)
    got_dropped = {r["id"] for r in ledger.collect()}
    want = _proto_oracle([r[0] for r in rows], [r[1] for r in rows],
                         cents, 0.3)
    assert got_dropped == want
    assert {r["reject_reason"] for r in ledger.collect()} == \
        {"prototype_prune"}
    kept_ids = {r["doc_id"] for r in kept.collect()}
    assert kept_ids == set(range(90)) - want
    # floor(30 * 0.3) = 9 per cell
    assert len(got_dropped) == 27


def test_prune_prototypes_edges(spark):
    from khl_pdf_ocr_spark.operators.semdedup import prune_prototypes

    df = spark.createDataFrame([(1, [1.0, 0.0])],
                               "doc_id long, embedding array<double>")
    kept, ledger = prune_prototypes(df, [[1.0, 0.0]], drop_fraction=0.0)
    assert kept.count() == 1 and ledger.count() == 0
    assert ledger.columns == ["id", "reject_reason"]
    with pytest.raises(ValueError, match="drop_fraction"):
        prune_prototypes(df, [[1.0, 0.0]], drop_fraction=1.0)
    # tiny cells: floor(1 * 0.5) = 0 -> singletons never vanish
    kept2, _ = prune_prototypes(df, [[1.0, 0.0]], drop_fraction=0.5)
    assert kept2.count() == 1


def test_cap_per_cluster_bounds_and_determinism(spark):
    from khl_pdf_ocr_spark.operators.semdedup import cap_per_cluster

    cents = [[5.0, 0.0], [0.0, 5.0]]
    rows = ([(i, [5.0, float(i % 7) * 0.1]) for i in range(40)]
            + [(100 + i, [float(i % 5) * 0.1, 5.0]) for i in range(10)])
    df = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    kept, ledger = cap_per_cluster(df, cents, max_per_cluster=15)
    kept_ids = {r["doc_id"] for r in kept.collect()}
    # cell 0 capped 40 -> 15; cell 1 under cap keeps all 10
    assert len(kept_ids) == 25
    assert ledger.count() == 25
    assert {r["reject_reason"] for r in ledger.collect()} == \
        {"cluster_cap"}
    assert all(i >= 100 or i in kept_ids
               for i in range(100, 110))  # cell 1 intact
    # deterministic under repartitioning (the hash-lottery contract)
    kept2, _ = cap_per_cluster(df.repartition(13), cents,
                               max_per_cluster=15)
    assert {r["doc_id"] for r in kept2.collect()} == kept_ids
    with pytest.raises(ValueError, match="max_per_cluster"):
        cap_per_cluster(df, cents, max_per_cluster=0)


def test_prune_plan_shape(spark):
    # one broadcast dim join, no cartesian, no embedding past the
    # narrow projection
    from khl_pdf_ocr_spark.operators.semdedup import prune_prototypes

    df = spark.createDataFrame([(i, [1.0, float(i)]) for i in range(20)],
                               "doc_id long, embedding array<double>")
    _, ledger = prune_prototypes(df, [[1.0, 0.0], [1.0, 20.0]],
                                 drop_fraction=0.2)
    plan = ledger._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "BroadcastHashJoin" in plan
