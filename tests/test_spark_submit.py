"""spark-submit --py-files — the north rule's deployment surface,
actually executed.

DEPLOY.md's submission recipe (zip the package, ship via --py-files)
is driven end-to-end here against the local spark-submit binary: the
driver script imports the package FROM THE ZIP, the session factory
must NOT override the submit-provided master (a hardcoded local[n]
would silently force a real cluster's driver into local mode — the
round-3 bug this file exists to keep fixed), and the job produces the
same byte-identical output as the in-process path.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spark_submit = shutil.which("spark-submit")
pytestmark = pytest.mark.skipif(spark_submit is None,
                                reason="spark-submit not on PATH")


@pytest.fixture(scope="module")
def pkg_zip(tmp_path_factory):
    zpath = str(tmp_path_factory.mktemp("submit") / "pkg.zip")
    pkg_root = os.path.join(REPO, "khl_pdf_ocr_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg_root):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".pyc"):
                    continue
                full = os.path.join(root, fn)
                z.write(full, os.path.relpath(full, REPO))
    return zpath


def _submit(pkg_zip, *args, timeout=240, conf=()):
    env = {k: v for k, v in os.environ.items()}
    env.pop("SPARK_GRAFT_MASTER", None)
    conf_args = []
    for c in conf:
        conf_args += ["--conf", c]
    return subprocess.run(
        [spark_submit, "--master", "local[4]",
         "--conf", "spark.ui.enabled=false", *conf_args,
         "--py-files", pkg_zip,
         os.path.join(REPO, "khl_pdf_ocr_spark", "cli.py"), *args],
        capture_output=True, text=True, timeout=timeout, env=env)


def test_submit_preflight_respects_submit_master(pkg_zip):
    p = _submit(pkg_zip, "--preflight")
    assert p.returncode == 0, p.stderr[-2000:]
    res = json.loads([ln for ln in p.stdout.splitlines()
                      if ln.startswith("{")][-1])
    assert res["ok"] is True
    # --master local[4] must win over the session factory's default
    assert res["parallelism"] == 4, res


def test_submit_conf_wins_over_factory_tuning(pkg_zip):
    """A cluster operator's --conf must survive session creation.

    Builder configs win over submit-time --conf at getOrCreate, so the
    factory must apply its tuning defaults only when absent from the
    submitted SparkConf (ADVICE r3) — otherwise ``--conf
    spark.sql.shuffle.partitions=2000`` on a 500-core cluster would be
    silently replaced by a value derived from the DRIVER machine's CPU
    count.
    """
    p = _submit(pkg_zip, "--preflight",
                conf=("spark.sql.shuffle.partitions=7",))
    assert p.returncode == 0, p.stderr[-2000:]
    res = json.loads([ln for ln in p.stdout.splitlines()
                      if ln.startswith("{")][-1])
    assert res["shuffle_partitions"] == 7, res


def test_submit_factory_default_applies_when_conf_absent(pkg_zip):
    """Without a submit-time --conf the factory's derived default (here
    max(32, 2*cpus) on the test host) must still be applied."""
    p = _submit(pkg_zip, "--preflight")
    assert p.returncode == 0, p.stderr[-2000:]
    res = json.loads([ln for ln in p.stdout.splitlines()
                      if ln.startswith("{")][-1])
    assert res["shuffle_partitions"] >= 32, res


def test_submit_extraction_byte_identical(pkg_zip, fixture_tables, tmp_path):
    docs_path, gold_path = fixture_tables
    out_dir = str(tmp_path / "submit_out")
    p = _submit(pkg_zip, "--input", docs_path, "--output", out_dir,
                "--mode", "all")
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["n_docs"] == 200

    import duckdb
    total, match = duckdb.sql(f"""
        SELECT count(*),
               sum(CASE WHEN o.extracted_text = g.extracted_text
                        THEN 1 ELSE 0 END)
        FROM read_parquet('{out_dir}/data/*.parquet') o
        JOIN (SELECT * FROM read_parquet('{gold_path}')
              WHERE mode = 'all') g USING (url)
    """).fetchone()
    assert total == 200 and match == 200
