from __future__ import annotations

import pytest

from bioner_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="bioner_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s


@pytest.fixture(scope="session")
def corpus():
    from bioner_spark import corpus as c

    return c.generate(n_docs=40, giant_doc_sentences=60)
