"""Per-domain corpus balancing.

The reference is a single-document extractor (app.py:376-419) and has
no corpus-level operator; this implements the domain-cap stage of
web-corpus construction (C4 and Gopher both bound any one site's share
of the training set): group documents by registrable domain
(``functions.urls.registered_domain``) and keep at most N per domain,
chosen DETERMINISTICALLY — the survivors are the N smallest
``(xxhash64(doc_id), doc_id)`` keys, so the sample is stable across
cluster sizes, partitionings, reruns, and increments (the
``hash_split`` discipline: no RNG, the hash IS the lottery).

Scale shape (the 100 TB story):

* Counting is ONE map-side-combinable ``groupBy(domain)`` over a
  two-column projection.
* Only OVER-CAP domains' documents enter the rank window: the long
  tail (the vast majority of a crawl's domains) is routed around the
  per-domain sort with a semi/anti join on the over-cap domain set —
  which is corpus-derived and unbounded, so it is joined, never
  force-broadcast (AQE picks the strategy).
* The residual skew risk is a SINGLE pathological domain (10^7+ pages
  on one host): ``row_number`` cannot split one partition.  The
  hot-domain audit (``audit["hot_domains"]``) makes the exposure
  visible; at that scale, pre-aggregate the N smallest hashes per
  domain with a two-level (salted) top-N before the window — the same
  escalation as the LSH hot-bucket guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.functions.urls import registered_domain

__all__ = ["domain_counts", "cap_per_domain", "cap_per_domain_incremental",
           "filter_blocked_domains", "filter_by_host_rank"]


def filter_blocked_domains(df: DataFrame, blocklist, *,
                           url_col: str = "url", id_col: str = "doc_id"
                           ) -> tuple["DataFrame", "DataFrame"]:
    """Drop documents whose REGISTRABLE domain is on a blocklist (the
    adult/spam/SEO-farm list every web corpus applies first — cheap,
    text never read).  ``blocklist``: an iterable of domain strings
    (lowercased eTLD+1, e.g. ``spam-farm.com``); matching is exact on
    ``registered_domain(url)``, so every subdomain of a listed domain
    is blocked and ``spam-farm.com.evil.org`` is NOT.

    Returns ``(kept, ledger)`` — ledger rows carry
    ``reject_reason='blocked_domain'`` (the ``clean_corpus``
    contract).

    Scale shape: real blocklists are bounded (10^4–10^6 rows — a file,
    not a corpus derivative), so the list becomes a BROADCAST isin-set
    via a literal in-memory frame joined ``left_anti``; one projection
    plus one broadcast join, zero corpus shuffles.
    """
    spark = df.sparkSession
    doms = sorted({d.strip().lower() for d in blocklist if d.strip()})
    block = spark.createDataFrame([(d,) for d in doms], ["_blocked"])
    tagged = df.withColumn("_domain", registered_domain(F.col(url_col)))
    kept = (tagged.join(
        F.broadcast(block), tagged["_domain"] == block["_blocked"],
        "left_anti").drop("_domain"))
    ledger = (tagged.join(
        F.broadcast(block), tagged["_domain"] == block["_blocked"],
        "left_semi")
        .select(F.col(id_col).alias("id"),
                F.lit("blocked_domain").alias("reject_reason")))
    return kept, ledger


def domain_counts(df: DataFrame, *, url_col: str = "url") -> DataFrame:
    """(domain, n_docs) per registrable domain — the corpus-composition
    telemetry a balancing decision starts from.  One shuffle of narrow
    rows."""
    return (df.select(registered_domain(F.col(url_col)).alias("domain"))
            .groupBy("domain")
            .agg(F.count(F.lit(1)).alias("n_docs")))


def cap_per_domain(df: DataFrame, *, max_per_domain: int,
                   url_col: str = "url", id_col: str = "doc_id",
                   audit: dict | None = None
                   ) -> tuple[DataFrame, DataFrame]:
    """Keep at most ``max_per_domain`` documents per registrable
    domain.  Returns ``(kept, ledger)``: kept rows carry the original
    columns; the ledger is ``(id, reject_reason='domain_cap')`` — the
    ``clean_corpus`` ledger contract.

    Survivor rule: the ``max_per_domain`` smallest
    ``(xxhash64(id), id)`` keys per domain — a deterministic uniform
    sample (ids are hashed, so crawl order / alphabetical position
    carry no bias), reproducible on any engine from the stored ids
    alone.

    ``audit``: optional dict; receives ``hot_domains`` (the over-cap
    domains with their counts, a LAZY frame) and registers any
    persisted handles under ``"persisted"`` (caller unpersists).
    """
    if max_per_domain < 1:
        raise ValueError(f"max_per_domain must be >= 1, got {max_per_domain}")
    tagged = df.withColumn("_domain", registered_domain(F.col(url_col)))
    if audit is not None:
        # tagged feeds the count pass AND both join halves — persist so
        # the upstream lineage (often a whole cleaning pipeline) runs
        # once.  Narrow-ish (original columns + one string); the
        # clean_cli precedent persists the kept frame at the same spot.
        tagged = tagged.persist()
        audit.setdefault("persisted", []).append(tagged)
    # the EMPTY pseudo-domain ('' = NULL/relative/malformed url —
    # url_host's stable-garbage contract) is EXEMPT: those docs come
    # from unrelated unparseable sources, and capping them as one
    # "domain" would silently discard valid documents (r5 review).
    # They ride the long-tail path (never ranked, never in the audit).
    over = (tagged.filter(F.col("_domain") != "")
            .groupBy("_domain")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_per_domain))
    if audit is not None:
        audit["hot_domains"] = over.select(
            F.col("_domain").alias("domain"), F.col("_n").alias("n_docs"))
    over_keys = over.select("_domain")
    # the long tail skips the sort entirely; over_keys is unbounded →
    # joined, never force-broadcast
    small = tagged.join(over_keys, "_domain", "left_anti")
    big = tagged.join(over_keys, "_domain", "left_semi")
    w = Window.partitionBy("_domain").orderBy(
        F.xxhash64(F.col(id_col)).asc(), F.col(id_col).asc())
    ranked = big.withColumn("_rk", F.row_number().over(w))
    kept = (small.unionByName(
        ranked.filter(F.col("_rk") <= max_per_domain).drop("_rk"))
        .drop("_domain"))
    ledger = (ranked.filter(F.col("_rk") > max_per_domain)
              .select(F.col(id_col).alias("id"),
                      F.lit("domain_cap").alias("reject_reason")))
    return kept, ledger


def cap_per_domain_incremental(df: DataFrame, seen_counts: DataFrame | None,
                               *, max_per_domain: int,
                               url_col: str = "url", id_col: str = "doc_id",
                               audit: dict | None = None
                               ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Per-domain caps across daily increments: each domain's budget is
    ``max_per_domain`` MINUS what prior increments already kept, so the
    corpus-wide bound holds without ever re-reading history.

    ``seen_counts``: two-column frame ``(domain, n_docs)`` — the
    accumulated per-domain kept counts (sum the per-increment store
    partitions before calling); ``None`` for a first run.

    Returns ``(kept, ledger, new_counts)``:
    - ``kept`` / ``ledger`` — the ``cap_per_domain`` contract (ledger
      reason stays ``domain_cap``);
    - ``new_counts`` — ``(domain, n_docs)`` kept from THIS batch:
      append to the store for the next increment (caller owns the
      write).  O(distinct batch domains) rows.

    Within the batch the survivor rule is the same deterministic
    ``(xxhash64(id), id)`` lottery; a domain whose budget is exhausted
    drops its every batch row.  State is O(domains), the probe is one
    equi-join on domain — O(batch) increment cost, like every other
    store in the increment job.
    """
    if max_per_domain < 1:
        raise ValueError(f"max_per_domain must be >= 1, got {max_per_domain}")
    tagged = df.withColumn("_domain", registered_domain(F.col(url_col)))
    if audit is not None:
        tagged = tagged.persist()
        audit.setdefault("persisted", []).append(tagged)
    if seen_counts is not None:
        used = seen_counts.groupBy(F.col("domain").alias("_domain")) \
            .agg(F.sum("n_docs").alias("_used"))
        # store is unbounded (one row per domain ever kept) → joined
        tagged = (tagged.join(used, "_domain", "left")
                  .withColumn("_budget",
                              F.greatest(F.lit(max_per_domain)
                                         - F.coalesce(F.col("_used"),
                                                      F.lit(0)),
                                         F.lit(0)))
                  .drop("_used"))
    else:
        tagged = tagged.withColumn("_budget",
                                   F.lit(max_per_domain).cast("long"))
    # the EMPTY pseudo-domain is exempt (see cap_per_domain): an
    # unbounded budget keeps every unparseable-url doc, and new_counts
    # below never stores a row for it
    tagged = tagged.withColumn(
        "_budget", F.when(F.col("_domain") == "",
                          F.lit(1 << 62)).otherwise(F.col("_budget")))
    # every batch row ranks (budgets vary per domain, so there is no
    # long-tail bypass here; batch — not corpus — sized input)
    w = Window.partitionBy("_domain").orderBy(
        F.xxhash64(F.col(id_col)).asc(), F.col(id_col).asc())
    ranked = tagged.withColumn("_rk", F.row_number().over(w))
    kept_tagged = ranked.filter(F.col("_rk") <= F.col("_budget"))
    ledger = (ranked.filter(F.col("_rk") > F.col("_budget"))
              .select(F.col(id_col).alias("id"),
                      F.lit("domain_cap").alias("reject_reason")))
    new_counts = (kept_tagged.filter(F.col("_domain") != "")
                  .groupBy(F.col("_domain").alias("domain"))
                  .agg(F.count(F.lit(1)).alias("n_docs")))
    kept = kept_tagged.drop("_domain", "_budget", "_rk")
    return kept, ledger, new_counts


def filter_by_host_rank(df: DataFrame, ranks: DataFrame, *,
                        min_rank: float, url_col: str = "url",
                        id_col: str = "doc_id",
                        keep_unranked: bool = True
                        ) -> tuple[DataFrame, DataFrame]:
    """Drop documents whose registrable domain's link-graph rank
    (``graph.host_pagerank`` output: ``(host, rank)``) falls below
    ``min_rank`` — the PageRank/harmonic-centrality quality prior of
    Common-Crawl curation, closing the loop from the ``--outlinks``
    ingest sidecar through ``links.host_link_graph`` to corpus
    construction.

    ``keep_unranked=True`` (default) passes documents whose domain has
    no rank row (a host absent from the link graph is UNKNOWN, not
    bad); ``False`` drops them too (ledger reason stays
    ``low_host_rank`` — one policy, one reason).

    Returns ``(kept, ledger)`` per the ``clean_corpus`` contract.

    Scale shape: the ranks table is host-level (bounded by distinct
    domains, not documents) but corpus-derived and unbounded, so it is
    JOINED on the derived domain — never force-broadcast; AQE picks
    broadcast when it fits.  One derived-column join, zero extra
    passes over text.
    """
    r = ranks.select(F.col("host").alias("_rhost"),
                     F.col("rank").alias("_rank"))
    tagged = (df.withColumn("_domain", registered_domain(F.col(url_col)))
              .join(r, F.col("_domain") == F.col("_rhost"), "left"))
    low = F.when(F.col("_rank").isNotNull(), F.col("_rank") < min_rank) \
           .otherwise(F.lit(not keep_unranked))
    kept = tagged.filter(~low).drop("_domain", "_rhost", "_rank")
    ledger = (tagged.filter(low)
              .select(F.col(id_col).alias("id"),
                      F.lit("low_host_rank").alias("reject_reason")))
    return kept, ledger
