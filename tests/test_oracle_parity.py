"""Every registered query hash-matches its DuckDB oracle at sf0.001.

This mirrors the driver's correctness gate (sf0.01); sf0.001 keeps the
test suite fast.  ``tools/oracle_check.py`` runs the sf0.01 version.
"""

import pytest

import __spark_entry__ as entry
import tools.oracle_check as oc
from readwise_vector_db_spark.registry import all_oracle_sql, all_queries
from tests.conftest import SF_SMOKE

# full surface: the driver-facing registry PLUS retired extras — retiring
# an entry from the driver's 50-slot cap must not retire its test
_QUERIES = sorted(all_queries())


@pytest.mark.parametrize("name", _QUERIES)
def test_query_matches_oracle(spark, duck, name):
    fn = all_queries()[name]
    sql = all_oracle_sql().get(name)
    ok, msg = oc.check_query(spark, duck, name, fn, sql, SF_SMOKE)
    assert ok, msg


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "score" in df.columns
