"""Profile the driver's correctness path: run every registered query in
Spark (toPandas, like the driver) AND its DuckDB oracle at the given SF,
timing each. The driver's per-round budget truncated round 1 at 50/125
queries — this script is the feedback loop for cutting per-query cost.

Usage: python tools/profile_correctness.py [sf_dir] [key_prefix...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from gps_stream_processing_spark.plans import REGISTRY
from gps_stream_processing_spark.schemas import TESTDATA_TABLES
from gps_stream_processing_spark.session import get_spark


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    spark = get_spark()
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    # Iterate in the driver's order (__spark_entry__.queries(): unverified
    # keys first), so "first N rows of this output" = the driver's window.
    import __spark_entry__ as entry

    rows = []
    t_all = time.time()
    with_oracle = {k for k, q in REGISTRY.items() if q.oracle is not None}
    for name in entry._coverage_order(sorted(REGISTRY), with_oracle):
        if only and not any(name.startswith(p) for p in only):
            continue
        q = REGISTRY[name]
        t0 = time.time()
        err = None
        n = -1
        try:
            n = len(q.fn(spark, sf).toPandas())
        except Exception as exc:  # noqa: BLE001 — report, keep profiling
            err = f"{type(exc).__name__}: {exc}"[:200]
        t_spark = time.time() - t0
        t0 = time.time()
        n_oracle = None
        if q.oracle is not None and err is None:
            try:
                n_oracle = len(con.execute(q.oracle).df())
            except Exception as exc:  # noqa: BLE001
                err = f"oracle {type(exc).__name__}: {exc}"[:200]
        t_duck = time.time() - t0
        rows.append((name, t_spark, t_duck, n, n_oracle, err))
        print(
            f"{name:34s} spark={t_spark:6.2f}s duck={t_duck:5.2f}s "
            f"rows={n}/{n_oracle if n_oracle is not None else '-'}"
            + (f"  ERR {err}" if err else ""),
            flush=True,
        )
    total = time.time() - t_all
    rows.sort(key=lambda r: -(r[1] + r[2]))
    print(f"\nTOTAL {total:.1f}s for {len(rows)} queries; slowest:")
    for name, ts, td, *_ in rows[:15]:
        print(f"  {name:34s} {ts + td:6.2f}s")
    out = {n: round(ts + td, 2) for n, ts, td, *_ in rows}
    with open("/tmp/profile_correctness.json", "w") as f:
        json.dump({"total": round(total, 1), "per_query": out}, f, indent=1)


if __name__ == "__main__":
    main()
