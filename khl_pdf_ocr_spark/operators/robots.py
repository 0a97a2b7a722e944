"""robots.txt compliance (RFC 9309, the Robots Exclusion Protocol) —
the crawl-level twin of the per-page ``<meta name="robots">`` opt-out
(``licensing.robots_noindex``).

The reference fetches one PDF per request (app.py:61-64) and has no
crawl policy surface; a compliant web corpus honors BOTH publisher
signals: the per-page meta tag (handled at ingest by
``--honor-noindex``) and the per-host ``/robots.txt`` rule file, which
Common-Crawl archives capture as ordinary response records.  This
module parses those records into a host-level rule table and filters a
document table against it.

Scale shape:

* Parsing is per-file state (group → rules), so it is ONE projection
  over the (tiny) robots.txt subset of the crawl: a line fold with a
  scalar-plus-bounded-array accumulator — robots files are KB-scale,
  the quadratic-append trap does not bite (``paragraphs.py``
  discipline notes).  No shuffle until the per-host rule grouping
  (one groupBy over rule rows — a few dozen per host).
* Filtering joins the host-level rule table on ``url_host`` — the
  table is corpus-derived (one row per host) and unbounded, so it is
  JOINED, never force-broadcast; AQE picks broadcast when it fits.
* Rule matching compiles the rule's regex per evaluation
  (``regexp_like`` with a column pattern — the JVM slow-ish path), but
  the work is bounded: rules-per-host is small and the pattern is a
  translated path prefix.  The match is longest-match-wins with Allow
  beating Disallow on equal length, per RFC 9309 §2.2.2.

Fidelity notes (documented trades, not oversights): group selection is
exact-agent-token else ``*`` (the RFC's "most specific match" over
substring product tokens is crawler-UA-dependent); percent-encoding is
compared textually (both sides come from the same crawler, so their
encoding conventions agree); ``crawl-delay``/``sitemap`` lines are
ignored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.functions.urls import url_host

__all__ = ["parse_robots_rules", "filter_robots_disallowed"]

_RULE_STRUCT = "array<struct<agent:string,allow:boolean,pat:string>>"


def parse_robots_rules(df: DataFrame, *, url_col: str = "url",
                       text_col: str = "text",
                       only_robots_paths: bool = True) -> DataFrame:
    """Parse fetched ``/robots.txt`` bodies into one rule row per
    (host, agent, rule): ``(host, agent, allow, pattern, plen)`` where
    ``pattern`` is the rule path translated to a Java regex (``*`` →
    ``.*``, trailing ``$`` → anchor, everything else escaped) and
    ``plen`` the original rule length (the RFC's specificity measure).

    Grammar per RFC 9309: consecutive ``User-agent`` lines form one
    group (a rule line closes it); ``Allow``/``Disallow`` apply to
    every agent of the current group; empty-value rules are no-ops
    (an empty ``Disallow:`` allows everything); rules before any
    ``User-agent`` line are ignored; ``#`` starts a comment.

    ``only_robots_paths=True`` keeps only rows whose url path is
    exactly ``/robots.txt`` — pass the whole crawl and the subset
    selects itself.
    """
    u, body = F.col(url_col), F.coalesce(F.col(text_col), F.lit(""))
    src = df
    if only_robots_paths:
        src = src.filter(u.rlike(
            r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*/robots\.txt(?:$|[?#])"))

    lines = F.transform(
        F.split(body, r"\r?\n"),
        lambda ln: F.regexp_replace(F.regexp_replace(ln, r"#.*$", ""),
                                    r"^\s+|\s+$", ""))

    zero = F.struct(
        F.array().cast("array<string>").alias("agents"),
        F.lit(False).alias("in_rules"),
        F.array().cast(_RULE_STRUCT).alias("rules"))

    def step(acc, ln):
        is_ua = ln.rlike(r"(?i)^user-agent\s*:")
        is_al = ln.rlike(r"(?i)^allow\s*:")
        is_di = ln.rlike(r"(?i)^disallow\s*:")
        ua = F.lower(F.regexp_extract(ln, r"(?i)^user-agent\s*:\s*(\S+)", 1))
        val = F.regexp_extract(ln, r"(?i)^(?:dis)?allow\s*:\s*(\S*)", 1)

        # a User-agent line after rules starts a NEW group; before
        # rules it widens the current group (consecutive UA lines
        # share the group's rules)
        agents_ua = (F.when(acc["in_rules"], F.array(ua))
                     .otherwise(F.array_union(acc["agents"], F.array(ua))))
        new_rule = F.transform(
            acc["agents"],
            lambda a: F.struct(a.alias("agent"), is_al.alias("allow"),
                               val.alias("pat")))
        return (
            F.when(is_ua & (ua != ""),
                   F.struct(agents_ua.alias("agents"),
                            F.lit(False).alias("in_rules"),
                            acc["rules"].alias("rules")))
            .when((is_al | is_di) & (val != ""),
                  F.struct(acc["agents"].alias("agents"),
                           F.lit(True).alias("in_rules"),
                           F.concat(acc["rules"], new_rule).alias("rules")))
            .when(is_al | is_di,
                  # empty value ("Disallow:" = allow all): recorded as
                  # a zero-length ALLOW rule — semantically the RFC's
                  # lowest-priority allow-everything, and it keeps the
                  # GROUP visible so agent selection never wrongly
                  # falls back to '*' for an agent whose group held
                  # only empty rules (review finding)
                  F.struct(acc["agents"].alias("agents"),
                           F.lit(True).alias("in_rules"),
                           F.concat(acc["rules"], F.transform(
                               acc["agents"],
                               lambda a: F.struct(
                                   a.alias("agent"),
                                   F.lit(True).alias("allow"),
                                   F.lit("").alias("pat"))))
                           .alias("rules")))
            .otherwise(acc))

    folded = src.select(url_host(u).alias("host"),
                        F.aggregate(lines, zero, step)["rules"].alias("_r"))
    rules = (folded.select("host", F.explode("_r").alias("r"))
             .select("host", F.col("r.agent").alias("agent"),
                     F.col("r.allow").alias("allow"),
                     F.col("r.pat").alias("_pat")))

    anchored = F.col("_pat").endswith("$")
    core = F.when(anchored, F.expr("substring(_pat, 1, length(_pat) - 1)")) \
            .otherwise(F.col("_pat"))
    # '*' swaps to a NUL sentinel BEFORE escaping (robots paths cannot
    # contain NUL), so a literal backslash-then-star in a rule path is
    # never mistaken for an escaped wildcard (review finding: escaping
    # first turns '/a\*b' into '/a\\\*b' whose tail the blind '\*'
    # replace would corrupt into a real wildcard)
    starred = F.replace(core, F.lit("*"), F.lit("\x00"))
    escaped = F.regexp_replace(starred, r"([.\[\]{}()+?^$|\\])", r"\\$1")
    rx = F.concat(F.lit("^"),
                  F.replace(escaped, F.lit("\x00"), F.lit(".*")),
                  F.when(anchored, F.lit("$")).otherwise(F.lit("")))
    return rules.select("host", "agent", "allow", rx.alias("pattern"),
                        F.length("_pat").alias("plen"))


def filter_robots_disallowed(docs: DataFrame, rules: DataFrame, *,
                             url_col: str = "url",
                             id_col: str = "doc_id",
                             agent: str = "*"
                             ) -> tuple[DataFrame, DataFrame]:
    """Split ``docs`` into ``(kept, ledger)`` against a
    ``parse_robots_rules`` table: a document is dropped when the
    longest matching rule of its host's applicable group (exact
    ``agent`` token if that host declares one, else ``*``) is a
    ``Disallow`` — Allow wins length ties (RFC 9309 §2.2.2).  Hosts
    with no rules, urls matching no rule, and unparseable urls all
    pass.  Ledger reason: ``robots_disallow``.
    """
    target = agent.lower()
    tagged_rules = rules.withColumn(
        "_r", F.struct(F.col("allow"), F.col("pattern"), F.col("plen")))
    byhost = (tagged_rules.groupBy("host").agg(
        F.collect_list(F.when(F.col("agent") == target, F.col("_r")))
        .alias("_exact"),
        F.collect_list(F.when(F.col("agent") == "*", F.col("_r")))
        .alias("_star"))
        .select(F.col("host").alias("_rhost"),   # never shadow a docs
                F.when(F.size("_exact") > 0, F.col("_exact"))  # column
                 .otherwise(F.col("_star")).alias("_rules")))

    u = F.col(url_col)
    pathq = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)",
                             1)
    # RFC path defaults to '/'; a query-only url ("https://h?sid=1")
    # yields '?sid=1' here and must match rules AS '/?sid=1', or a
    # 'Disallow: /' host would silently admit it (review finding)
    pathq = (F.when(pathq == "", F.lit("/"))
             .when(~pathq.startswith("/"), F.concat(F.lit("/"), pathq))
             .otherwise(pathq))
    tagged = (docs.withColumn("_h", url_host(u))
              .join(byhost, F.col("_h") == F.col("_rhost"), "left"))

    verdict_zero = F.struct(F.lit(-1).cast("int").alias("best"),
                            F.lit(True).alias("allow"))

    def pick(acc, r):
        # hits evaluated ONCE per (doc, rule): conditional subtrees
        # defeat codegen CSE, so two hits-guarded when-branches would
        # run the regex twice (the licensing.py BENCH §4.21 lesson)
        return F.when(
            F.regexp_like(pathq, r["pattern"]),
            F.when(r["plen"] > acc["best"],
                   F.struct(r["plen"].cast("int").alias("best"),
                            r["allow"].alias("allow")))
            .when((r["plen"] == acc["best"]) & r["allow"],
                  F.struct(acc["best"].alias("best"),
                           F.lit(True).alias("allow")))
            .otherwise(acc)).otherwise(acc)

    allowed = F.aggregate(
        F.coalesce(F.col("_rules"), F.array().cast(
            "array<struct<allow:boolean,pattern:string,plen:int>>")),
        verdict_zero, pick)["allow"]
    with_v = tagged.withColumn("_ok", allowed)
    kept = with_v.filter(F.col("_ok")).select(*docs.columns)
    ledger = (with_v.filter(~F.col("_ok"))
              .select(F.col(id_col).alias("id"),
                      F.lit("robots_disallow").alias("reject_reason")))
    return kept, ledger
