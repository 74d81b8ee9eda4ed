"""Full-surface oracle sweep as a pytest marker (r4 item 10): the driver
gate checks ~50 of the registry's queries; ``pytest tests/ -m oracles``
runs ALL of them through the gate replica (Spark vs DuckDB, row count +
schema + order-insensitive values) in one command. Excluded from the
default run via pytest.ini (it is a ~15-minute sweep at sf0.01)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.mark.oracles
def test_full_oracle_sweep():
    import check_oracles

    if not os.path.isdir(SF_DIR):
        pytest.skip(f"testdata dir {SF_DIR} not present")
    failures = check_oracles.run(SF_DIR)
    assert failures == [], f"oracle mismatches: {failures}"
