"""materialize_roundtrip tmpfs byte budget (r4): once live round-trip
bytes exceed the budget, new files spill to the disk fallback instead of
filling /dev/shm; freeing entries returns usage below the budget."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_data_science_spark.pregel import superstep as ss  # noqa: E402


def test_budget_exceeded_spills_to_fallback(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_RT_BUDGET_MB", "0.0001")  # ~100 bytes
    df = spark.range(1000)
    a = ss.materialize_roundtrip(df, tag="budget_test")
    assert a._roundtrip_path.startswith(ss._ROUNDTRIP_BASE)
    # live bytes now exceed the ~100-byte budget: next file must spill
    b = ss.materialize_roundtrip(df, tag="budget_test")
    assert ss._ROUNDTRIP_FALLBACK is not None
    assert b._roundtrip_path.startswith(ss._ROUNDTRIP_FALLBACK)
    assert b.count() == 1000
    # freeing the shm-resident file brings usage back under budget for
    # fresh writes (10 MB budget >> two small files)
    monkeypatch.setenv("SPARK_GRAFT_RT_BUDGET_MB", "10")
    c = ss.materialize_roundtrip(df, tag="budget_test", keep_last=1)
    assert c._roundtrip_path.startswith(ss._ROUNDTRIP_BASE)
    # accounting: freed entries decremented the live-byte counter
    seqs = [s for s, (t, _p, _b) in ss._ROUNDTRIP_ENTRIES.items() if t == "budget_test"]
    assert len(seqs) == 1
    for s in seqs:
        ss._free_roundtrip_entry(s)
