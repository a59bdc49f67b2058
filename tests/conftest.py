from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from greenplum_dwh_spark.session import get_spark  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", extra_conf={
        "spark.sql.shuffle.partitions": "8",
        "spark.ui.enabled": "false",
    })
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return os.path.join(TESTDATA, "sf0.001")


@pytest.fixture()
def wh(spark, tmp_path):
    from greenplum_dwh_spark.warehouse import Warehouse
    return Warehouse(spark, str(tmp_path / "wh"))
