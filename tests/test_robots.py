"""robots.txt parsing + Disallow filtering (operators/robots.py).

Oracle: hand-traced RFC 9309 cases plus a fuzz cross-check against
Python's stdlib ``urllib.robotparser`` on the wildcard-free subset
(the stdlib parser predates RFC 9309 and mishandles ``*``/``$`` and
Allow-tie semantics, so wildcard cases are hand-traced only)."""

import pytest
from pyspark.sql import functions as F

from khl_pdf_ocr_spark.operators.robots import (filter_robots_disallowed,
                                                parse_robots_rules)

pytestmark = pytest.mark.usefixtures("spark")

ROBOTS = """# corpus robots fixture
User-agent: *
Disallow: /private/
Allow: /private/ok/
Disallow: /*.pdf$

User-agent: specialbot
User-agent: otherbot
Disallow: /

User-agent: emptybot
Disallow:
"""


def _rules(spark, body=ROBOTS, host="site.example.com"):
    df = spark.createDataFrame(
        [(f"https://{host}/robots.txt", body)], ["url", "text"])
    return parse_robots_rules(df)


def test_parse_groups_agents_and_patterns(spark):
    got = {(r["host"], r["agent"], r["allow"], r["pattern"], r["plen"])
           for r in _rules(spark).collect()}
    assert got == {
        ("site.example.com", "*", False, r"^/private/", 9),
        ("site.example.com", "*", True, r"^/private/ok/", 12),
        ("site.example.com", "*", False, r"^/.*\.pdf$", 7),
        ("site.example.com", "specialbot", False, r"^/", 1),
        ("site.example.com", "otherbot", False, r"^/", 1),
        # emptybot's empty Disallow = the RFC's allow-everything:
        # recorded as a zero-length ALLOW so the GROUP stays visible
        ("site.example.com", "emptybot", True, "^", 0),
    }


def test_filter_longest_match_and_allow_tiebreak(spark):
    rules = _rules(spark)
    docs = spark.createDataFrame(
        [(1, "https://site.example.com/public/a"),
         (2, "https://site.example.com/private/secret"),
         (3, "https://site.example.com/private/ok/fine"),
         (4, "https://site.example.com/docs/paper.pdf"),
         (5, "https://site.example.com/docs/paper.pdf?download=1"),
         (6, "https://otherhost.net/anything"),
         (7, None)],
        ["doc_id", "url"])
    kept, ledger = filter_robots_disallowed(docs, rules)
    assert {r["doc_id"] for r in kept.collect()} == {1, 3, 5, 6, 7}
    assert {(r["id"], r["reject_reason"]) for r in ledger.collect()} == \
        {(2, "robots_disallow"), (4, "robots_disallow")}
    assert kept.columns == docs.columns


def test_agent_group_selection(spark):
    rules = _rules(spark)
    docs = spark.createDataFrame(
        [(1, "https://site.example.com/public/a")], ["doc_id", "url"])
    # specialbot has its own group (Disallow: /) -> everything drops
    kept, _ = filter_robots_disallowed(docs, rules, agent="SpecialBot")
    assert kept.count() == 0
    # emptybot declared its own group with an empty Disallow (= allow
    # everything): its group applies — NEVER the '*' fallback
    kept2, _ = filter_robots_disallowed(docs, rules, agent="emptybot")
    assert kept2.count() == 1
    # unknown agent falls back to the * group
    kept3, _ = filter_robots_disallowed(docs, rules, agent="randombot")
    assert kept3.count() == 1
    # review regression: an agent whose group is ONLY an empty
    # Disallow must be allowed even when '*' disallows everything
    body = "User-agent: mybot\nDisallow:\n\nUser-agent: *\nDisallow: /\n"
    r2 = _rules(spark, body=body)
    k_my, _ = filter_robots_disallowed(docs, r2, agent="mybot")
    assert k_my.count() == 1          # own allow-all group wins
    k_star, _ = filter_robots_disallowed(docs, r2)
    assert k_star.count() == 0        # '*' group still disallows all


def test_rules_before_any_group_are_ignored(spark):
    body = "Disallow: /early/\nUser-agent: *\nDisallow: /late/\n"
    rules = _rules(spark, body=body)
    pats = {r["pattern"] for r in rules.collect()}
    assert pats == {r"^/late/"}


def test_only_robots_paths_subsets_the_crawl(spark):
    df = spark.createDataFrame(
        [("https://a.example.com/robots.txt", "User-agent: *\nDisallow: /x"),
         ("https://a.example.com/page.html", "User-agent: *\nDisallow: /y"),
         ("https://b.example.com/robots.txt?v=1", "User-agent: *\nDisallow: /z")],
        ["url", "text"])
    got = {(r["host"], r["pattern"])
           for r in parse_robots_rules(df).collect()}
    assert got == {("a.example.com", "^/x"), ("b.example.com", "^/z")}


def test_fuzz_matches_stdlib_robotparser(spark):
    """Wildcard-free random rule files: Spark's verdict must agree
    with urllib.robotparser for the '*' agent on every path.

    Constraint: rule paths within one file are pairwise non-prefix —
    then at most ONE rule matches any url, so the stdlib's first-match
    semantics and RFC 9309's longest-match coincide and the stdlib is
    a valid oracle for this subset."""
    import random
    from urllib.robotparser import RobotFileParser

    rng = random.Random(42)
    segs = ["a", "b", "cgi", "data", "img", "tmp"]
    cases = []
    for fi in range(20):
        lines = ["User-agent: *"]
        rule_paths: list[str] = []
        for _ in range(rng.randint(1, 6)):
            verb = rng.choice(["Allow", "Disallow"])
            path = "/" + "/".join(rng.sample(segs, rng.randint(1, 3)))
            if rng.random() < 0.5:
                path += "/"
            if any(p.startswith(path) or path.startswith(p)
                   for p in rule_paths):
                continue
            rule_paths.append(path)
            lines.append(f"{verb}: {path}")
        body = "\n".join(lines)
        paths = ["/" + "/".join(rng.sample(segs, rng.randint(1, 3)))
                 for _ in range(8)]
        cases.append((f"h{fi}.example.net", body, paths))

    robots_df = spark.createDataFrame(
        [(f"https://{h}/robots.txt", body) for h, body, _ in cases],
        ["url", "text"])
    rules = parse_robots_rules(robots_df)
    docs = spark.createDataFrame(
        [(f"{h}:{p}", f"https://{h}{p}")
         for h, _, paths in cases for p in paths],
        ["doc_id", "url"])
    kept, _ = filter_robots_disallowed(docs, rules)
    kept_ids = {r["doc_id"] for r in kept.collect()}

    mism = []
    for h, body, paths in cases:
        rp = RobotFileParser()
        rp.parse(body.splitlines())
        for p in paths:
            expect = rp.can_fetch("*", f"https://{h}{p}")
            got = f"{h}:{p}" in kept_ids
            if expect != got:
                mism.append((h, p, body, expect, got))
    assert not mism, mism[:3]


def test_extract_cli_robots_gate(spark, tmp_path):
    """Production loop: parse the crawl's own robots.txt records ->
    frozen rule table -> cli --robots-rules drops Disallow'd urls
    pre-kernel, counted in stats."""
    import json
    import os
    import subprocess
    import sys

    robots = spark.createDataFrame(
        [("https://site.example.com/robots.txt",
          "User-agent: *\nDisallow: /private/")],
        ["url", "text"])
    rules_path = str(tmp_path / "rules")
    parse_robots_rules(robots).write.parquet(rules_path)

    body = b"<p>" + b"public body text word " * 30 + b"</p>"
    docs = spark.createDataFrame(
        [("https://site.example.com/public/a", body),
         ("https://site.example.com/private/b", body),
         ("https://unruled.example.org/c", body)],
        "url string, html binary") \
        .withColumn("warc_ts", F.current_timestamp()) \
        .withColumn("text", F.lit(None).cast("string")) \
        .withColumn("lang", F.lit("en"))
    inp = str(tmp_path / "docs")
    docs.write.parquet(inp)

    out = str(tmp_path / "out")
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.cli",
         "--input", inp, "--output", out,
         "--robots-rules", rules_path, "--cpus", "4"],
        capture_output=True, text=True, timeout=300, cwd=cwd)
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["robots_dropped"] == 1
    urls = {r["url"] for r in spark.read.parquet(f"{out}/data").collect()}
    assert urls == {"https://site.example.com/public/a",
                    "https://unruled.example.org/c"}

    # flag pairing + resume rejection
    p2 = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.cli",
         "--input", inp, "--output", str(tmp_path / "x"),
         "--robots-agent", "mybot"],
        capture_output=True, text=True, timeout=120, cwd=cwd)
    assert p2.returncode == 2 and "robots-agent" in p2.stderr
    p3 = subprocess.run(
        [sys.executable, "-m", "khl_pdf_ocr_spark.cli",
         "--input", inp, "--output", str(tmp_path / "y"),
         "--resume", "--robots-rules", rules_path],
        capture_output=True, text=True, timeout=120, cwd=cwd)
    assert p3.returncode == 2 and "robots-rules" in p3.stderr


def test_query_only_url_matches_root_rules(spark):
    # review regression: 'https://h?sid=1' has RFC path '/' (+query) —
    # a Disallow: / host must drop it, not silently admit it
    body = "User-agent: *\nDisallow: /\n"
    rules = _rules(spark, body=body, host="q.example.com")
    docs = spark.createDataFrame(
        [(1, "https://q.example.com?sid=1"),
         (2, "https://q.example.com"),
         (3, "https://q.example.com/real/path")],
        ["doc_id", "url"])
    kept, ledger = filter_robots_disallowed(docs, rules)
    assert kept.count() == 0 and ledger.count() == 3


def test_docs_with_host_column_do_not_collide(spark):
    # review regression: the rule join must never shadow a docs column
    # named 'host' (a plausible crawl schema)
    rules = _rules(spark)
    docs = spark.createDataFrame(
        [(1, "https://site.example.com/private/x", "site.example.com")],
        ["doc_id", "url", "host"])
    kept, ledger = filter_robots_disallowed(docs, rules)
    assert kept.count() == 0 and ledger.count() == 1
    assert kept.columns == ["doc_id", "url", "host"]
