"""Distributed two-pass prefix sums over a total order.

``Window.orderBy(<key>)`` with no ``partitionBy`` is correct but plans an
``Exchange SinglePartition`` — every row moves to ONE task and the whole
cumulative runs on one core (Spark itself warns). Fine for the
aggregate-sized tables most registry keys feed it; wrong for anything
data-sized at the 100 TB posture. This operator is the classic
two-pass scan (Blelloch 1990's prefix-sum decomposition, the same shape
every MPP engine uses for global cumulative windows):

1. ``repartitionByRange`` on the order key — rows land in
   range-contiguous partitions, pinned by an eager ``localCheckpoint``
   (REQUIRED for correctness, not a cache hint: the range partitioner
   samples, and the two passes below must see the SAME row→partition
   assignment; an unpinned lineage could re-sample per job).
2. Pass 1: per-partition totals (one row per partition — a
   partition-count-sized aggregate, collected to the driver with that
   size bound) → exclusive prefix over partition ids driver-side.
3. Pass 2: partition-LOCAL running sums (``Window.partitionBy(pid)`` —
   a parallel window, no single-partition exchange) plus the
   broadcast-joined per-partition offset.

Cost: one range exchange + one pid hash exchange + an n_partitions-row
broadcast, versus the single-partition sort of the naive form — the
cumulative runs at full cluster parallelism and each task sorts only
its range slice.

Determinism: ``order_by`` must be a TOTAL order (no ties). With ties,
both this operator and the naive global window return
order-dependent running values — same contract as every ``row_number``
consumer in the registry.

Reference parity: the reference engine (class.nmea.parser.php) keeps
its whole working set in one PHP array, so every cumulative it could
compute is a sequential loop over that array — single-machine by
construction. This file is the cluster re-expression of "running
total over everything".
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__ps_pid"


def _as_cols(order_by: Sequence) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_by]


def running_totals(
    df: DataFrame,
    order_by: Sequence,
    *,
    sums: Mapping[str, str] | None = None,
    count_col: str | None = None,
    num_partitions: int | None = None,
    with_totals: bool = False,
    partition_by: Sequence[str] | None = None,
):
    """Append global running aggregates over ``order_by`` to ``df``.

    ``sums``: ``{out_col: in_col}`` — inclusive running SUM of
    ``in_col`` in the total order (null inputs are skipped, per SQL
    ``SUM`` semantics — a null row advances the count but not the sum).
    Exact-type contract: sum sources must be integer or DECIMAL.
    Pass 1 re-associates the addition (per-partition partial sums are
    folded driver-side and re-added as offsets), which is bit-identical
    to a sequential scan only for exact types; a float/double source
    would differ in the last ulp versus a true global running window.
    Every registry caller is integer/decimal; new callers with float
    sources must cast to DECIMAL first (ADVICE r14, low).
    ``count_col``: name for the 1-based running row count
    (``row_number`` in the total order).
    ``num_partitions``: range-partition fan-out; defaults to the
    session's ``spark.sql.shuffle.partitions``.
    ``with_totals``: also return ``{"n_rows": N, <out_col>: grand
    total, ...}`` computed exactly from the pass-1 partials — callers
    that would otherwise cross-join a broadcast totals aggregate get
    the grand totals for free (grand = across ALL partition groups
    when ``partition_by`` is set).
    ``partition_by``: column NAMES the running values reset on —
    ``SUM(...) OVER (PARTITION BY keys ORDER BY order)`` semantics
    with the same two-pass layout: the range partitioner keys on
    (partition cols, order cols) so each group's rows stay range-
    contiguous, offsets accumulate per (group, pid) and reset at
    group boundaries. This is the scale posture for LOW-cardinality
    partition keys over data-sized groups (a plain partitioned
    window gives only |keys| tasks); high-cardinality keys should
    use a plain ``Window.partitionBy`` — that parallelizes fine.

    Returns the augmented DataFrame (all input columns plus the
    requested running columns), or ``(DataFrame, totals)`` when
    ``with_totals`` is set.
    """
    sums = dict(sums or {})
    if not sums and not count_col:
        raise ValueError("running_totals needs sums and/or count_col")
    part_names = list(partition_by or [])
    order_cols = _as_cols(order_by)
    if num_partitions:
        n = int(num_partitions)
    else:
        # spark.sql.shuffle.partitions may be non-numeric on some
        # runtimes (e.g. "auto" under advanced AQE modes) — fall back
        # to the cluster's default parallelism rather than raising
        # (ADVICE r13). Those runtimes are typically Spark Connect,
        # where sparkSession.sparkContext itself raises — so the
        # fallback's fallback is a fixed sane width (r14 review).
        try:
            n = int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions")
            )
        except (TypeError, ValueError):
            try:
                n = df.sparkSession.sparkContext.defaultParallelism
            except Exception:  # Spark Connect: no SparkContext
                n = 200
    # Pass 0: pin the range layout (see module docstring — correctness,
    # not caching: both passes must agree on row→partition). LAZY
    # checkpoint: pass 1's collect below is the first action, so the
    # materialization and the per-partition totals ride ONE job
    # instead of two — measured ~0.3 s of scheduling latency per call
    # on aggregate-sized inputs (r14 bench re-base), with the same
    # pinning guarantee (blocks are fixed at first materialization,
    # before any pass-2 job runs).
    base = (
        df.repartitionByRange(n, *[F.col(c) for c in part_names], *order_cols)
        .localCheckpoint(eager=False)
        .withColumn(_PID, F.spark_partition_id())
    )
    # Pass 1: per-(group, range-partition) totals. Row count bounded
    # by num_partitions + the number of group/bucket boundaries —
    # never by data (partition_by is the LOW-cardinality contract).
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__cnt")]
    for out, src in sums.items():
        aggs.append(F.sum(src).alias(f"__s_{out}"))
    gb = [*part_names, _PID]
    part_schema = base.groupBy(*gb).agg(*aggs).schema

    def _key(r):
        # group tuple first (None sorts before values, matching the
        # range partitioner's NULLS FIRST), then pid within the group
        return (
            tuple((r[c] is not None, r[c]) for c in part_names),
            r[_PID],
        )

    partials = sorted(base.groupBy(*gb).agg(*aggs).collect(), key=_key)
    totals: dict = {"n_rows": 0}
    for out in sums:
        totals[out] = None
    off_rows = []
    run_cnt = 0  # grand totals, across every group (with_totals)
    run_sum: dict = {out: None for out in sums}
    g_cnt = 0  # group-local running offsets — RESET at group change
    g_sum: dict = {out: None for out in sums}
    prev_group: object = object()  # != any real group, incl. ()
    for r in partials:
        group = tuple(r[c] for c in part_names)
        if group != prev_group:
            g_cnt = 0
            g_sum = {out: None for out in sums}
            prev_group = group
        row = {c: r[c] for c in part_names}
        row[_PID] = r[_PID]
        row["__off_cnt"] = g_cnt
        for out in sums:
            row[f"__off_{out}"] = g_sum[out]
        off_rows.append(row)
        g_cnt += r["__cnt"]
        run_cnt += r["__cnt"]
        for out in sums:
            v = r[f"__s_{out}"]
            if v is not None:
                g_sum[out] = v if g_sum[out] is None else g_sum[out] + v
                run_sum[out] = v if run_sum[out] is None else run_sum[out] + v
    totals["n_rows"] = run_cnt
    for out in sums:
        totals[out] = run_sum[out]

    from pyspark.sql.types import LongType, StructField, StructType

    sum_types = {
        f.name: f.dataType for f in part_schema.fields if f.name not in gb
    }
    part_types = {f.name: f for f in part_schema.fields if f.name in part_names}
    off_schema = StructType(
        [part_types[c] for c in part_names]
        + [
            StructField(_PID, LongType(), False),
            StructField("__off_cnt", LongType(), False),
        ]
        + [
            StructField(f"__off_{out}", sum_types[f"__s_{out}"], True)
            for out in sums
        ]
    )
    offsets = df.sparkSession.createDataFrame(
        [tuple(r[f.name] for f in off_schema.fields) for r in off_rows],
        off_schema,
    )
    # Pass 2: partition-local running values + broadcast offset join.
    # The pid window hash-exchanges on (group, _PID) — parallel across
    # the cluster; each task sorts only its own range slice.
    w = Window.partitionBy(*part_names, _PID).orderBy(*order_cols)
    wf = w.rowsBetween(Window.unboundedPreceding, 0)
    # NULL-group rows are in-contract (the driver-side _key sort above
    # orders them NULLS FIRST to match the range partitioner), so the
    # offset join must be null-safe on the partition columns — a plain
    # equi-join never matches NULL keys and would silently DROP every
    # NULL-group row (ADVICE r14, medium). _PID itself is never null.
    off_renamed = offsets
    for c in part_names:
        off_renamed = off_renamed.withColumnRenamed(c, f"__off_p_{c}")
    join_cond = base[_PID] == off_renamed[_PID]
    for c in part_names:
        join_cond = join_cond & base[c].eqNullSafe(
            off_renamed[f"__off_p_{c}"]
        )
    out_df = (
        base.join(F.broadcast(off_renamed), join_cond)
        .drop(off_renamed[_PID])
        .drop(*[f"__off_p_{c}" for c in part_names])
    )
    if count_col:
        out_df = out_df.withColumn(
            count_col,
            F.row_number().over(w).cast("bigint") + F.col("__off_cnt"),
        )
    for out, src in sums.items():
        off = F.col(f"__off_{out}")
        local = F.sum(src).over(wf)
        # SQL SUM semantics: the running value is NULL only while NO
        # non-null input has been seen anywhere in the prefix. A
        # partition whose local prefix is all-NULL must still carry a
        # non-null offset from earlier partitions — NULL + offset would
        # wrongly poison it (ADVICE r13, medium).
        out_df = out_df.withColumn(
            out,
            F.when(local.isNull() & off.isNull(), F.lit(None)).otherwise(
                F.coalesce(local, F.lit(0)) + F.coalesce(off, F.lit(0))
            ),
        )
    out_df = out_df.drop(
        _PID, "__off_cnt", *[f"__off_{out}" for out in sums]
    )
    return (out_df, totals) if with_totals else out_df
