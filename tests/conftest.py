import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_data_science_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # Small shuffle-partition count: fixture graphs are tiny and superstep
    # loops dominate on job-launch overhead, not data volume.
    s = get_spark(
        app_name="gds-spark-tests",
        master="local[8]",
        shuffle_partitions=2,
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.default.parallelism": "4",
        },
    )
    yield s
    s.stop()
