from __future__ import annotations

import pytest

from dedupe_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="dedupe_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def transcripts_small(spark):
    from dedupe_spark import fixtures

    return fixtures.transcripts(spark, n_conv=120).persist()


@pytest.fixture(scope="session")
def sf_dir():
    import os

    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
