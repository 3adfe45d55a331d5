from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from readwise_vector_db_spark.session import get_spark

    spark = get_spark("tests", cores=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    import tools.oracle_check as oc

    return oc.duckdb_conn(SF_SMOKE)
