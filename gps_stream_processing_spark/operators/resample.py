"""Time-series resample / gap-fill (SURVEY §2.7 window family; the
trajectory-processing complement of the as-of join).

``resample_interp`` projects each key's irregular observations onto a
regular time grid and fills every grid point two ways: LOCF (last
observation carried forward — the step-function read) and linear
interpolation between the surrounding observations (the trajectory
read; for GPS fixes this is the standard position-between-fixes
estimate).

Scalable formulation — the same union + ordered-window trick as
``operators/asof.py`` (one hash shuffle per key, no range join, no
per-row probe, no Python):

    obs(side=0) ∪ grid(side=1)
      → window PARTITION BY key ORDER BY (ts, side):  forward fill of
        (obs_ts, obs_val)  = previous observation at-or-before t
      → window ORDER BY (ts DESC, side DESC):         backward fill
        = next observation strictly after t
      → keep grid rows; interpolate

Both windows share one hash partitioning, so Spark plans a single
Exchange with two sorts. The grid is generated per key with
``sequence`` (no driver-side loop, no cross join): grid size is
O(span/step) per key and never materializes globally.

Caller contract: observations unique per (key, ts) — pre-aggregate
otherwise (ties make any fill order-undefined).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def resample_interp(
    df: DataFrame,
    by: str,
    ts_col: str = "ts",
    val_col: str = "value",
    step: str = "INTERVAL 1 HOUR",
    trunc_unit: str = "hour",
) -> DataFrame:
    """Resample ``val_col`` onto a per-key regular grid spanning
    [trunc(min ts), trunc(max ts)] in ``step`` increments; emit both
    LOCF and linearly interpolated values (null where no observation
    exists on the needed side)."""
    obs = df.groupBy(by, ts_col).agg(F.avg(val_col).alias("v"))
    rng = obs.groupBy(by).agg(
        F.date_trunc(trunc_unit, F.min(ts_col)).alias("t0"),
        F.date_trunc(trunc_unit, F.max(ts_col)).alias("t1"),
    )
    grid = rng.select(
        by, F.explode(F.expr(f"sequence(t0, t1, {step})")).alias(ts_col)
    )
    o = obs.select(
        by,
        ts_col,
        F.lit(0).alias("side"),
        F.col(ts_col).alias("ots"),
        F.col("v"),
    )
    g = grid.select(
        by,
        ts_col,
        F.lit(1).alias("side"),
        F.lit(None).cast("timestamp").alias("ots"),
        F.lit(None).cast("double").alias("v"),
    )
    u = o.unionByName(g)
    # forward scan: at equal ts the observation (side 0) sorts first →
    # "previous" is inclusive (obs.ts <= grid.ts). Reverse scan: the
    # grid row (side 1) sorts first → "next" is strictly after.
    wf = (
        W.partitionBy(by)
        .orderBy("ts", "side")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wb = (
        W.partitionBy(by)
        .orderBy(F.col("ts").desc(), F.col("side").desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = (
        u.withColumn("prev_ts", F.last("ots", ignorenulls=True).over(wf))
        .withColumn("prev_v", F.last("v", ignorenulls=True).over(wf))
        .withColumn("next_ts", F.last("ots", ignorenulls=True).over(wb))
        .withColumn("next_v", F.last("v", ignorenulls=True).over(wb))
    )
    out = filled.filter(F.col("side") == 1)
    t = F.unix_micros(F.col(ts_col))
    pt = F.unix_micros(F.col("prev_ts"))
    nt = F.unix_micros(F.col("next_ts"))
    interp = F.when(pt == t, F.col("prev_v")).otherwise(
        F.col("prev_v")
        + (F.col("next_v") - F.col("prev_v")) * ((t - pt) / (nt - pt))
    )
    return out.select(
        by,
        F.col(ts_col).alias("grid_ts"),
        F.round("prev_v", 6).alias("locf_value"),
        F.round(interp, 6).alias("interp_value"),
    )
