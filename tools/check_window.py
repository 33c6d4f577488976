#!/usr/bin/env python
"""Local twin of the round driver's correctness gate: run the first
``--n`` keys of ``__spark_entry__.queries()`` (the emission-ordered
verification window) against their DuckDB oracles at sf0.01 and
compare row count + column names + an order-insensitive value hash —
the same three signals the driver records. Run this before a round
ends to know the window is green BEFORE the driver does.

Usage: python tools/check_window.py [--n 50] [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            # 6-dp: every engine query already rounds floats whose
            # aggregation order could move later digits
            df[c] = s.astype("float64").round(6)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def vhash(df) -> str:
    return hashlib.md5(canon(df).to_csv(index=False).encode()).hexdigest()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50)
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
    for i, name in enumerate(list(qs)[: args.n]):
        try:
            sdf = qs[name](spark, args.sf).toPandas()
            sql = os_.get(name)
            if sql is None:
                print(f"{i:3d} {name}: rows-only ({len(sdf)} rows)")
                continue
            odf = con.execute(sql).df()
            ok = (
                len(sdf) == len(odf)
                and sorted(sdf.columns) == sorted(odf.columns)
                and vhash(sdf) == vhash(odf)
            )
            if not ok:
                bad.append(name)
            print(f"{i:3d} {name}: {'OK' if ok else 'FAIL'} ({len(sdf)} rows)")
        except Exception as ex:  # noqa: BLE001 — record, keep sweeping
            bad.append(name)
            print(f"{i:3d} {name}: ERR {type(ex).__name__}: {str(ex)[:140]}")
    print("FAILURES:", bad)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
