"""Round-9 staged queries (plans/catalog_r9.py): full driver-gate parity
NOW, registration at round-9 start (the round-8 gate window is dedicated
to the r4/r5 stale-tail drain — see catalog_r9's module docstring).
These tests run the exact compare the driver gate runs."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare, duck_connect
from victor_spark.plans import QUERIES
from victor_spark.plans.catalog_r9 import PENDING


def test_pending_queries_are_not_registered():
    """Staging invariant: nothing here may leak into the live registry
    (it would evict stale-tier queries from the round-8 gate window)."""
    assert PENDING
    assert not set(PENDING) & set(QUERIES)


@pytest.mark.parametrize("name", sorted(PENDING))
def test_pending_query_matches_oracle(spark, name):
    spec = PENDING[name]
    con = duck_connect(SF_SMOKE)
    sdf = spec.build(spark, SF_SMOKE)
    odf = con.execute(spec.oracle_sql(SF_SMOKE)).fetchdf()
    problems = compare(sdf, odf)
    assert not problems, problems
