"""The local twin of the driver's t2 correctness gate: every catalog query
runs on Spark and on DuckDB and must produce the identical row set.

Runs at sf0.001 for speed; the driver runs sf0.01 (same data generator, so
parity here strongly predicts parity there).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare, duck_connect
from victor_spark.plans import QUERIES


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_SMOKE)
    yield con
    con.close()


SQL_QUERIES = [name for name, spec in QUERIES.items() if spec.oracle is not None]
ROWS_ONLY = [name for name, spec in QUERIES.items() if spec.oracle is None]


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_oracle_parity(spark, duck, name):
    spec = QUERIES[name]
    sdf = spec.build(spark, SF_SMOKE)
    odf = duck.execute(spec.oracle_sql(SF_SMOKE)).fetchdf()
    problems = compare(sdf, odf)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name].build(spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
