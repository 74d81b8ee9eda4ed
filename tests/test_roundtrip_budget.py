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
    seqs = [s for s, e in ss._ROUNDTRIP_ENTRIES.items() if e[0] == "budget_test"]
    assert len(seqs) == 1
    before = ss._ROUNDTRIP_LIVE_BYTES
    for s in seqs + [s for s, e in ss._ROUNDTRIP_ENTRIES.items() if e[0] == "budget_seed"]:
        ss._free_roundtrip_entry(s)
    assert ss._ROUNDTRIP_LIVE_BYTES < before


def test_spilled_files_do_not_pin_budget(spark, monkeypatch):
    """Disk-fallback files must NOT count against the tmpfs budget: after
    the tmpfs entries are freed, new writes return to tmpfs even while
    large spilled files are still live (pre-fix, one overshoot routed
    every future write to disk forever)."""
    df = spark.range(500)
    a = ss.materialize_roundtrip(df, tag="pin_seed")
    assert a._roundtrip_path.startswith(ss._ROUNDTRIP_BASE)
    live_mb = ss._ROUNDTRIP_LIVE_BYTES / 1e6
    monkeypatch.setenv("SPARK_GRAFT_RT_BUDGET_MB", str(live_mb / 2 + 1e-4))
    spilled = ss.materialize_roundtrip(df, tag="pin_spill")
    assert spilled._roundtrip_path.startswith(ss._ROUNDTRIP_FALLBACK)
    # free every tmpfs-resident entry; the spilled entry stays live
    for s2 in [s for s, e in list(ss._ROUNDTRIP_ENTRIES.items()) if e[3]]:
        ss._free_roundtrip_entry(s2)
    assert ss._ROUNDTRIP_LIVE_BYTES == 0
    back = ss.materialize_roundtrip(df, tag="pin_back")
    assert back._roundtrip_path.startswith(ss._ROUNDTRIP_BASE), back._roundtrip_path
    for s2 in [s for s, e in list(ss._ROUNDTRIP_ENTRIES.items()) if e[0].startswith("pin_")]:
        ss._free_roundtrip_entry(s2)
