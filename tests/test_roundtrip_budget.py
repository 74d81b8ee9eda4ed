"""materialize_roundtrip tmpfs byte budget (r4): once live round-trip
bytes exceed the budget, new files spill to the disk fallback instead of
filling /dev/shm; freeing entries returns usage below the budget."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_data_science_spark.pregel import superstep as ss  # noqa: E402


def test_budget_exceeded_spills_to_fallback(spark, monkeypatch):
    # Earlier tests in a full-suite run may hold live round-trip bytes, so
    # express both budgets RELATIVE to the current live count rather than
    # assuming a fresh session.
    df = spark.range(1000)
    ss.materialize_roundtrip(df, tag="budget_seed")  # ensure base exists
    live_mb = ss._ROUNDTRIP_LIVE_BYTES / 1e6
    # budget below current live bytes: next file must spill to disk
    monkeypatch.setenv("SPARK_GRAFT_RT_BUDGET_MB", str(live_mb / 2 + 1e-4))
    b = ss.materialize_roundtrip(df, tag="budget_test")
    assert ss._ROUNDTRIP_FALLBACK is not None
    assert b._roundtrip_path.startswith(ss._ROUNDTRIP_FALLBACK)
    assert b.count() == 1000
    # budget comfortably above live bytes: fresh writes return to tmpfs,
    # and keep_last frees decrement the live-byte counter
    monkeypatch.setenv(
        "SPARK_GRAFT_RT_BUDGET_MB", str(ss._ROUNDTRIP_LIVE_BYTES / 1e6 + 10)
    )
    c = ss.materialize_roundtrip(df, tag="budget_test", keep_last=1)
    assert c._roundtrip_path.startswith(ss._ROUNDTRIP_BASE)
    seqs = [s for s, (t, _p, _b) in ss._ROUNDTRIP_ENTRIES.items() if t == "budget_test"]
    assert len(seqs) == 1
    before = ss._ROUNDTRIP_LIVE_BYTES
    for s in seqs + [s for s, (t, _p, _b) in ss._ROUNDTRIP_ENTRIES.items() if t == "budget_seed"]:
        ss._free_roundtrip_entry(s)
    assert ss._ROUNDTRIP_LIVE_BYTES < before
