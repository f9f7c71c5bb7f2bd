from __future__ import annotations

import pytest

from victor_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    # 8 shuffle partitions: test data is tiny, and per-task launch overhead
    # dominates at 32; production sizing lives in session.py defaults
    s = get_spark("victor_spark_tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


SF_SMOKE = "/root/testdata/sf0.001"
SF_T2 = "/root/testdata/sf0.01"
