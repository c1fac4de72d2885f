from __future__ import annotations

import shutil

import pytest


@pytest.fixture(scope="session")
def spark():
    from cuda_float_compress_spark.session import get_spark

    s = get_spark(app="tests", cores=8, shuffle_partitions=8, driver_memory="8g")
    yield s
    s.stop()


@pytest.fixture()
def scratch(tmp_path):
    d = tmp_path / "out"
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)
