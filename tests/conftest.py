from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from streampro_assignment_etl_spark.session import get_spark

    spark = get_spark("streampro-tests", cpus=8)
    yield spark
    spark.stop()


SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_correct() -> str:
    return SF_CORRECT
