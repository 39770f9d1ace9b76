import pytest

from sanskrit_ocr_spark.conf import build_spark


@pytest.fixture(scope="session")
def spark():
    s = build_spark(app="sanskrit-ocr-spark-tests", master="local[4]",
                    shuffle_partitions=8,
                    extra={"spark.ui.enabled": "false",
                           "spark.driver.memory": "4g"})
    yield s
    s.stop()
