"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() in DuckDB at a given sf dir, compare row count,
schema width, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from graph_data_science_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 9)
            vals.append((c, v))
        out.append(tuple(vals))
    return sorted(out, key=repr)


def run(sf_dir: str, only=None, spark=None) -> list:
    """Run the gate replica; returns the list of failing query names.
    ``spark=None`` builds the tool's own session (and stops it)."""
    only = set(only or ())
    own_spark = spark is None
    if own_spark:
        spark = get_spark(app_name="oracle-check", master="local[16]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows={len(srows)} (no oracle, rows-only)")
            continue
        try:
            ddf = con.sql(oracles[name])
            dcols = ddf.columns
            drows = ddf.fetchall()
            drows = [dict(zip(dcols, r)) for r in drows]
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {str(exc)[:300]}")
            failures.append(name)
            continue
        ok_count = len(srows) == len(drows)
        ok_schema = sorted(scols) == sorted(dcols)
        a = canon([r.asDict() for r in srows], scols)
        b = canon(drows, dcols)
        ok_vals = a == b
        status = "PASS" if (ok_count and ok_schema and ok_vals) else "FAIL"
        print(
            f"{status} {name}: rows {len(srows)}/{len(drows)} schema={ok_schema} "
            f"values={ok_vals} ({time.time()-t0:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_schema:
                print(f"   spark cols: {sorted(scols)}\n   duck cols:  {sorted(dcols)}")
            if ok_schema and not ok_vals:
                sa, sb = set(map(repr, a)), set(map(repr, b))
                diff1 = list(sa - sb)[:3]
                diff2 = list(sb - sa)[:3]
                print(f"   spark-only: {diff1}\n   duck-only:  {diff2}")
    if own_spark:
        spark.stop()
    print("FAILURES:", failures or "none")
    return failures


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    failures = run(sf_dir, only=sys.argv[2:])
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
