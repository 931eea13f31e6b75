"""Cross-engine parity: every registered query with a DuckDB oracle
must match exactly (the driver's correctness gate, run locally)."""

import pytest

from proj_4_spark import queries as Q
from proj_4_spark.plans import parity


def _names():
    return sorted(Q.queries().keys())


@pytest.mark.parametrize("name", _names())
def test_query_parity(spark, sf_dir, name):
    problems = parity.check_query(spark, name, sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)
