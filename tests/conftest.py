import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from gliner_spark.plans.session import build_session

    s = build_session(
        app_name="gliner-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        arrow_batch_rows=64,  # small batches → exercises batching parity
    )
    yield s
    s.stop()
