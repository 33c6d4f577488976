"""Registry of engine queries and their DuckDB oracle twins.

Every operator declared in SURVEY §2 registers here with a callable
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, the
equivalent ANSI SQL the driver runs through DuckDB on the same parquet
tables. Parity discipline (SURVEY §7 step 2):

- every computed column is aliased to the SAME name on both sides
  (the driver's compare sorts columns by name before hashing);
- doubles that pass through re-associable aggregation are rounded
  identically on both sides;
- DuckDB ``SUM(<int>)`` returns HUGEINT — always ``CAST(... AS BIGINT)``
  in the oracle so dtypes line up;
- every window/limit has a unique total order (tie-break on a key
  column) so results are deterministic under parallelism.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class EngineQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # None → rows-only check (non-SQL-expressible)
    doc: str = ""


REGISTRY: dict[str, EngineQuery] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query key {name!r}")
        REGISTRY[name] = EngineQuery(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    return {n: q.oracle for n, q in sorted(REGISTRY.items()) if q.oracle is not None}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from gps_stream_processing_spark.sources.tables import load_table

    return load_table(spark, sf_dir, name)
