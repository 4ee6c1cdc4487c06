from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small JVM for unit tests


@pytest.fixture(scope="session")
def spark():
    from dump1090_db_stream_spark import get_spark

    s = get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "4"})
    yield s


@pytest.fixture(autouse=True)
def _release_operator_caches():
    """Operator-internal persists (cache.track) are the CALLER's to
    release; in the suite the caller is each test, so free them after
    every test — otherwise a session-scoped JVM accumulates storage
    memory across hundreds of tests (cache.py's lifecycle contract)."""
    yield
    from dump1090_db_stream_spark.cache import release_tracked

    release_tracked()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


#: collector for hypothesis-generated WKT coordinate cases — evaluated
#: in ONE Spark job by test_properties.test_wkt_coord_formatting_spark_batch
_WKT_RESULTS: list[tuple[float, str]] = []
