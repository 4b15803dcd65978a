from __future__ import annotations

import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from wine_label_ocr_spark.session import get_spark

    wh = tempfile.mkdtemp(prefix="wlos_wh_")
    s = get_spark(app="tests", master="local[4]", shuffle_partitions=4,
                  extra_conf={"spark.sql.warehouse.dir": wh})
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
