from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from wine_label_ocr_spark.session import get_spark

    s = get_spark(app="tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
