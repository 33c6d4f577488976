#!/usr/bin/env python
"""Check NAMED keys (not the window prefix) against their DuckDB
oracles — same three signals as tools/check_window.py. Usage:

    python tools/check_keys.py q_foo q_bar [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from check_window import vhash  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as e
    from gps_stream_processing_spark.schemas import TESTDATA_TABLES
    from gps_stream_processing_spark.session import get_spark

    spark = get_spark(master="local[16]")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )
    qs, os_ = e.queries(), e.oracle_sql()
    bad = []
    for name in args.keys:
        try:
            sdf = qs[name](spark, args.sf).toPandas()
            sql = os_.get(name)
            if sql is None:
                print(f"{name}: rows-only ({len(sdf)} rows)")
                continue
            odf = con.execute(sql).df()
            ok = (
                len(sdf) == len(odf)
                and sorted(sdf.columns) == sorted(odf.columns)
                and vhash(sdf) == vhash(odf)
            )
            if not ok:
                bad.append(name)
                print(
                    f"{name}: FAIL rows {len(sdf)}/{len(odf)} "
                    f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}"
                )
            else:
                print(f"{name}: OK ({len(sdf)} rows)")
        except Exception as ex:  # noqa: BLE001 — record, keep sweeping
            bad.append(name)
            print(f"{name}: ERR {type(ex).__name__}: {str(ex)[:400]}")
    print("FAILURES:", bad)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
