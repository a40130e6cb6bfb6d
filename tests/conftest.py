from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from modape_spark.session import get_spark

    s = get_spark(app_name="modape-spark-tests", cores=4, shuffle_partitions=8,
                  driver_memory="8g")
    yield s
    s.stop()
