"""Every registered query hash-matches its DuckDB oracle at sf0.001.

This mirrors the driver's correctness gate (sf0.01); sf0.001 keeps the
test suite fast.  ``tools/oracle_check.py`` runs the sf0.01 version.
"""

import pytest

import __spark_entry__ as entry
import tools.oracle_check as oc
from tests.conftest import SF_SMOKE

_QUERIES = sorted(entry.queries())


@pytest.mark.parametrize("name", _QUERIES)
def test_query_matches_oracle(spark, duck, name):
    fn = entry.queries()[name]
    sql = entry.oracle_sql().get(name)
    ok, msg = oc.check_query(spark, duck, name, fn, sql, SF_SMOKE)
    assert ok, msg


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "score" in df.columns
