from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = "/tmp/khl_fixtures_test"
N_FIXTURE_DOCS = 200
SEED = 42


@pytest.fixture(scope="session")
def fixture_tables():
    from khl_pdf_ocr_spark.fixtures.gen import write_tables

    docs, gold = write_tables(FIXTURE_DIR, N_FIXTURE_DOCS, SEED)
    return docs, gold


@pytest.fixture(scope="session")
def spark():
    from khl_pdf_ocr_spark.session import get_spark

    s = get_spark("khl-tests", cpus=8, shuffle_partitions=16)
    yield s
    s.stop()
