"""As-of join (SURVEY §2.3) — latest right row with ``right.ts <= left.ts``
per key. The streaming analog of the reference's ``$CurrentUTC``
forward-fill (``class.nmea.parser.php:226``): a timestamp-less sentence
"as-of joins" to the most recent timestamped one.

Spark has no native ASOF JOIN; the scalable formulation is
union + ordered window (one shuffle on the key, no range-explosion,
no per-row probe):

    left(side=1) ∪ right(side=0)
      → window PARTITION BY key ORDER BY (ts, side)
      → last(right payload, ignorenulls) over rows ≤ current
      → keep side=1

Right rows sort before left rows at equal ``ts`` (side 0 < 1), giving
``right.ts <= left.ts`` inclusive semantics — identical to DuckDB's
``ASOF JOIN ... ON l.ts >= r.ts`` oracle. A broadcast-range or
``merge_asof``-in-pandas variant would shuffle the same amount but adds
a Python boundary; this stays whole-stage-codegen'd.

Caller contract: ``right`` must be unique per (by, ts) — pre-aggregate
otherwise (ties inside right are order-undefined in any as-of engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts_col: str = "ts",
    how: str = "inner",
    right_prefix: str = "asof_",
) -> DataFrame:
    """Join each left row to the latest right row with
    ``right.ts <= left.ts`` within the same ``by`` key.

    Right payload columns are returned as ``{right_prefix}{col}`` plus
    ``{right_prefix}{ts_col}`` (the matched timestamp). ``how`` is
    ``"inner"`` (drop unmatched lefts) or ``"left"``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join: how must be inner|left, got {how!r}")
    r_payload = [c for c in right.columns if c not in {*by, ts_col}]
    l_payload = [c for c in left.columns if c not in {*by, ts_col}]

    l_side = left.select(
        *by,
        ts_col,
        F.lit(1).alias("__side"),
        *[F.col(c) for c in l_payload],
        F.lit(None).cast(dict(right.dtypes)[ts_col]).alias(f"__r_{ts_col}"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in r_payload],
    )
    r_side = right.select(
        *by,
        ts_col,
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in l_payload],
        F.col(ts_col).alias(f"__r_{ts_col}"),
        *[F.col(c).alias(f"__r_{c}") for c in r_payload],
    )
    w = (
        W.partitionBy(*by)
        .orderBy(ts_col, "__side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = l_side.unionByName(r_side).select(
        *by,
        ts_col,
        "__side",
        *l_payload,
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{right_prefix}{c}")
            for c in [ts_col, *r_payload]
        ],
    )
    out = filled.filter(F.col("__side") == 1).drop("__side")
    if how == "inner":
        out = out.filter(F.col(f"{right_prefix}{ts_col}").isNotNull())
    return out


def asof_nearest_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts_col: str = "ts",
    right_prefix: str = "near_",
) -> DataFrame:
    """Join each left row to the right row NEAREST in time (either
    direction) within the same ``by`` key; ties (equidistant prev/next)
    resolve to the EARLIER right row, making the result deterministic
    whenever (by, ts) is unique on the right.

    Same single-shuffle scale shape as :func:`asof_join`: one union,
    one hash partitioning on ``by``, two ordered window passes over it
    (backward last + forward first — the second window re-sorts within
    partitions but adds no Exchange). pandas' ``merge_asof(direction=
    'nearest')`` is the single-node twin; a theta-join formulation
    would be quadratic per key and is never built.

    Unmatched left rows (no right row in the key at all) are dropped —
    the inner contract, matching asof_join(how='inner')."""
    r_payload = [c for c in right.columns if c not in {*by, ts_col}]
    l_payload = [c for c in left.columns if c not in {*by, ts_col}]
    r_ts_type = dict(right.dtypes)[ts_col]

    l_side = left.select(
        *by,
        ts_col,
        F.lit(1).alias("__side"),
        *[F.col(c) for c in l_payload],
        F.lit(None).cast(r_ts_type).alias(f"__r_{ts_col}"),
        *[
            F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}")
            for c in r_payload
        ],
    )
    r_side = right.select(
        *by,
        ts_col,
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in l_payload],
        F.col(ts_col).alias(f"__r_{ts_col}"),
        *[F.col(c).alias(f"__r_{c}") for c in r_payload],
    )
    # Backward pass: right rows sort BEFORE an equal-ts left row
    # (__side 0 < 1), so "prev" includes ts-equal rights. Forward pass:
    # ts descending with __side still ASCENDING — at equal ts the right
    # row again precedes the left in frame order, so "next" includes
    # ts-equal rights too; such a right wins both directions at dt=0
    # (same row either way — the pick is indifferent).
    w_prev = (
        W.partitionBy(*by)
        .orderBy(ts_col, "__side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_next = (
        W.partitionBy(*by)
        .orderBy(F.col(ts_col).desc(), "__side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    r_cols = [ts_col, *r_payload]
    filled = l_side.unionByName(r_side).select(
        *by,
        ts_col,
        "__side",
        *l_payload,
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w_prev).alias(f"__p_{c}")
            for c in r_cols
        ],
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w_next).alias(f"__n_{c}")
            for c in r_cols
        ],
    )
    prev_ts, next_ts = F.col(f"__p_{ts_col}"), F.col(f"__n_{ts_col}")
    dt_prev = F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)
    dt_next = F.unix_micros(next_ts) - F.unix_micros(F.col(ts_col))
    use_prev = prev_ts.isNotNull() & (next_ts.isNull() | (dt_prev <= dt_next))
    out = (
        filled.filter(F.col("__side") == 1)
        .select(
            *by,
            ts_col,
            *l_payload,
            *[
                F.when(use_prev, F.col(f"__p_{c}"))
                .otherwise(F.col(f"__n_{c}"))
                .alias(f"{right_prefix}{c}")
                for c in r_cols
            ],
        )
        .filter(F.col(f"{right_prefix}{ts_col}").isNotNull())
    )
    return out
