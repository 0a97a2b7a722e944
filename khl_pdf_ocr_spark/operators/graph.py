"""Hyperlink-graph operators: deterministic link synthesis + PageRank.

The reference processes one document per request (app.py:376-419) and
has no notion of a corpus, let alone a link graph; a Common-Crawl-scale
pipeline does — ranking hosts/pages by link structure (PageRank, Page
et al. 1999) is the canonical iterative web-scale computation and the
standard quality prior for crawl-data curation (e.g. harmonic
centrality / PageRank filtering in Common Crawl derivatives).

Scale shape:

* Each iteration is exactly ONE shuffle: ``edges JOIN ranks ON src``
  (edges pre-partitioned by ``src`` once, outside the loop, so the join
  reuses that exchange every iteration) followed by ``groupBy(dst)``
  with map-side partial aggregation.  No driver-side collect of ranks;
  the only scalar crossing per iteration is the 1-row dangling-mass
  aggregate, which joins back via a broadcast nested loop (1 x N).
* Lineage is truncated with ``localCheckpoint`` every few iterations —
  the connected-components precedent (dedup.near_dup_components): an
  unbounded iterative plan otherwise grows linearly and re-plans
  quadratically.
* ``deterministic=True`` folds each node's contributions in sorted
  order (collect_list -> sort_array -> left fold, seed 0.0) so the
  floating-point sum is bit-identical run-to-run and engine-to-engine —
  the driver oracle replays the identical fold in DuckDB
  (``list_reduce(list_prepend(0.0, list_sort(...)))``).  That mode
  exists for verification: per-node collect_list concentrates a
  power-law in-degree into one task, so production runs keep the
  default partial-aggregated ``F.sum`` and verify with tolerances.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["synthetic_link_graph", "pagerank", "host_pagerank"]


def synthetic_link_graph(docs: DataFrame, *, id_col: str = "doc_id",
                         n: int | None = None) -> DataFrame:
    """Deterministic stand-in hyperlink graph over a document table.

    Pure arithmetic on the id — no RNG, no data movement beyond one
    count — so any engine (the DuckDB oracle included) reproduces the
    identical edge set:

    * pages with ``id % 7 == 0`` are dangling (no out-links);
    * out-degree of the rest is ``1 + id % 3``;
    * the j-th target is ``(id*31 + j*97 + 13) % n``, bumped one slot
      (mod n) when it would self-loop.

    Output: ``(src, dst)`` long columns, duplicate edges removed.
    """
    if n is None:
        n = docs.count()
    ids = docs.select(F.col(id_col).cast("long").alias("src"))
    linked = ids.filter(F.col("src") % 7 != 0)

    def _dst(j):
        raw = (F.col("src") * 31 + j * 97 + 13) % n
        return F.when(raw == F.col("src"), (raw + 1) % n).otherwise(raw)

    dsts = F.transform(
        F.sequence(F.lit(1), (F.col("src") % 3 + 1).cast("int")),
        lambda j: _dst(j.cast("long")))
    return linked.select("src",
                         F.explode(F.array_distinct(dsts)).alias("dst"))


def pagerank(nodes: DataFrame, edges: DataFrame, *, n_iter: int = 5,
             damping: float = 0.85, id_col: str = "id",
             deterministic: bool = False, n: int | None = None,
             checkpoint_every: int = 3) -> DataFrame:
    """Power-iteration PageRank with uniform dangling-mass
    redistribution.

    ``nodes``: one row per vertex (column ``id_col``); ``edges``:
    ``(src, dst)``.  Ranks start uniform at ``1/N`` and update as

        r'(v) = (1-d)/N + d * (D/N) + d * sum_{u->v} r(u)/outdeg(u)

    where ``D`` is the total rank held by dangling nodes, so total rank
    stays exactly 1 every iteration.  Returns ``(id_col, rank)``.
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if n is None:
        n = nodes.count()
    if n == 0:
        return nodes.select(F.col(id_col), F.lit(0.0).alias("rank"))
    base = (1.0 - damping) / n          # embedded as literals so the SQL
    r_init = 1.0 / n                    # oracle can replay the exact
    n_f = float(n)                      # double arithmetic

    ids = nodes.select(F.col(id_col).cast("long").alias(id_col))
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    # weighted edges, partitioned by src ONCE: every iteration's
    # rank-join reuses this layout instead of re-shuffling the edges
    ew = (e.join(outdeg, "src")
          .select("src", "dst", (F.lit(1.0) / F.col("_deg")).alias("w"))
          .repartition("src"))
    ew.persist()
    danglers = ids.join(e.select("src").distinct(),
                        ids[id_col] == F.col("src"), "left_anti")
    danglers.persist()

    if deterministic:
        def _fold_sum(col):
            return F.aggregate(F.sort_array(F.collect_list(col)),
                               F.lit(0.0), lambda a, x: a + x)
    else:
        def _fold_sum(col):
            return F.sum(col)

    ranks = ids.withColumn("rank", F.lit(r_init))
    for it in range(n_iter):
        dmass = (ranks.join(danglers, id_col, "left_semi")
                 .agg(F.coalesce(_fold_sum(F.col("rank")),
                                 F.lit(0.0)).alias("_dmass")))
        contrib = (ew.join(ranks, ew["src"] == ranks[id_col])
                   .select(F.col("dst"),
                           (F.col("rank") * F.col("w")).alias("_c")))
        sums = contrib.groupBy("dst").agg(_fold_sum(F.col("_c")).alias("_s"))
        ranks = (ids.join(sums, ids[id_col] == sums["dst"], "left")
                 .crossJoin(dmass)
                 .select(F.col(id_col),
                         (F.lit(base)
                          + F.lit(damping) * (F.col("_dmass") / F.lit(n_f))
                          + F.lit(damping) * F.coalesce(F.col("_s"),
                                                        F.lit(0.0))
                          ).alias("rank")))
        if checkpoint_every and (it + 1) % checkpoint_every == 0 \
                and it + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def host_pagerank(host_edges: DataFrame, *, n_iter: int = 5,
                  damping: float = 0.85,
                  deterministic: bool = False) -> DataFrame:
    """PageRank over a host-level edge table (``links.host_link_graph``
    output: distinct ``(src, dst)`` registrable-domain strings) —
    returns ``(host, rank)``, the quality prior a crawl pipeline joins
    against its corpus (``domains.filter_by_host_rank``).

    Node ids are ``xxhash64(host)`` — a stateless projection, so the
    string→id mapping needs NO global sort or zipWithIndex pass and is
    identical across cluster sizes and increments (the ``hash_split``
    discipline).  A 64-bit collision would merge two hosts' ranks:
    ~10^-5 probability of even ONE collision at 10^7 hosts, and the
    effect is a perturbed prior, never a crash — the MinHash banding
    precedent.  One extra join at the end recovers the host string.
    """
    hosts = (host_edges.select(F.col("src").alias("host"))
             .union(host_edges.select("dst")).distinct())
    nodes = hosts.select(F.xxhash64("host").alias("id"), "host")
    edges = host_edges.select(F.xxhash64("src").alias("src"),
                              F.xxhash64("dst").alias("dst"))
    ranks = pagerank(nodes.select("id"), edges, n_iter=n_iter,
                     damping=damping, deterministic=deterministic)
    return nodes.join(ranks, "id").select("host", "rank")
