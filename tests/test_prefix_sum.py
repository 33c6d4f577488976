"""operators/prefix_sum.py — the two-pass distributed scan.

Pins (a) exact equality against the naive single-partition global
window on every supported shape (sum / count / multi-measure / desc
order / null values), (b) the with_totals grand totals, and (c) the
SCALE property the operator exists for: the running-value window in
its physical plan is partitioned (hash exchange on the internal pid),
with NO ``Exchange SinglePartition`` anywhere — the naive form's
move-everything-to-one-task plan is exactly what must not appear.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from gps_stream_processing_spark.operators.prefix_sum import running_totals

from conftest import SF_SMALL


def _events(spark):
    return spark.read.parquet(f"{SF_SMALL}/events.parquet")


def _naive(df, order_cols, sums, count_col):
    w = Window.orderBy(*order_cols)
    wf = w.rowsBetween(Window.unboundedPreceding, 0)
    out = df
    if count_col:
        out = out.withColumn(
            count_col, F.row_number().over(w).cast("bigint")
        )
    for name, src in sums.items():
        out = out.withColumn(name, F.sum(src).over(wf))
    return out


def _rows(df, key_cols):
    return sorted(
        (tuple(r) for r in df.collect()),  # test-sized: sf0.001 aggregate
        key=lambda t: t[: len(key_cols)],
    )


def test_sum_matches_global_window(spark):
    per_user = (
        _events(spark)
        .groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("k"))
    )
    got = running_totals(
        per_user, ["user_id"], sums={"cum": "k"}, num_partitions=8
    )
    want = _naive(per_user, [F.col("user_id")], {"cum": "k"}, None)
    assert _rows(got, ["user_id"]) == _rows(want, ["user_id"])


def test_count_and_multisum_desc_order(spark):
    per_user = (
        _events(spark)
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("k"),
            F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("v"),
        )
    )
    order = [F.desc("k"), F.col("user_id")]
    got = running_totals(
        per_user,
        order,
        sums={"cum_k": "k", "cum_v": "v"},
        count_col="i",
        num_partitions=8,
    )
    want = _naive(per_user, order, {"cum_k": "k", "cum_v": "v"}, "i")
    key = ["user_id"]
    g = {r[0]: r[1:] for r in _rows(got.select("user_id", "i", "cum_k", "cum_v"), key)}
    w = {r[0]: r[1:] for r in _rows(want.select("user_id", "i", "cum_k", "cum_v"), key)}
    assert g == w


def test_null_values_skip_sum_but_advance_count(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 5), (4, None), (5, 1)], "id int, v int"
    )
    got = running_totals(
        df, ["id"], sums={"cum": "v"}, count_col="rn", num_partitions=3
    )
    rows = {r["id"]: (r["rn"], r["cum"]) for r in got.collect()}
    assert rows == {1: (1, 10), 2: (2, 10), 3: (3, 15), 4: (4, 15), 5: (5, 16)}


def test_null_prefix_partition_carries_offset(spark):
    # ADVICE r13 (medium): a partition whose LOCAL prefix is all-NULL
    # must still carry the non-null offset from earlier partitions —
    # the pre-fix form returned NULL + offset = NULL there, making the
    # result partition-layout-dependent. With 6 rows into 6 range
    # partitions the NULL run almost surely leads at least one
    # partition; the expected values hold under ANY layout now.
    rows = [(1, 7), (2, None), (3, None), (4, None), (5, None), (6, 2)]
    df = spark.createDataFrame(rows, "id int, v int")
    got = running_totals(
        df, ["id"], sums={"cum": "v"}, count_col="rn", num_partitions=6
    )
    m = {r["id"]: (r["rn"], r["cum"]) for r in got.collect()}
    assert m == {
        1: (1, 7),
        2: (2, 7),
        3: (3, 7),
        4: (4, 7),
        5: (5, 7),
        6: (6, 9),
    }


def test_all_null_prefix_stays_null(spark):
    # SQL SUM semantics: the running value is NULL only while no
    # non-null input has been seen anywhere in the global prefix.
    rows = [(1, None), (2, None), (3, 4), (4, None)]
    df = spark.createDataFrame(rows, "id int, v int")
    got = running_totals(df, ["id"], sums={"cum": "v"}, num_partitions=4)
    m = {r["id"]: r["cum"] for r in got.collect()}
    assert m == {1: None, 2: None, 3: 4, 4: 4}


def test_partitioned_running_totals_match_partitioned_window(spark):
    """partition_by semantics: running values RESET per group and
    match SUM(...) OVER (PARTITION BY g ORDER BY id) / row_number
    exactly, including NULL handling within a group, with groups
    deliberately spanning multiple range partitions (12 rows into 8
    partitions) and one single-row group."""
    rows = [
        ("a", 1, 10), ("a", 2, None), ("a", 3, 5), ("a", 4, 1),
        ("b", 1, None), ("b", 2, 7), ("b", 3, None), ("b", 4, 2),
        ("c", 1, 3), ("c", 2, 4), ("c", 3, 6),
        ("d", 1, 9),
    ]
    df = spark.createDataFrame(rows, "g string, id int, v int")
    got, totals = running_totals(
        df,
        ["id"],
        sums={"cum": "v"},
        count_col="rn",
        num_partitions=8,
        partition_by=["g"],
        with_totals=True,
    )
    w = Window.partitionBy("g").orderBy("id")
    want = df.select(
        "g",
        "id",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.sum("v")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    gm = {(r["g"], r["id"]): (r["rn"], r["cum"]) for r in got.collect()}
    wm = {(r["g"], r["id"]): (r["rn"], r["cum"]) for r in want.collect()}
    assert gm == wm
    # grand totals span every group
    assert totals == {"n_rows": 12, "cum": 47}


def test_partitioned_running_totals_null_group_rows_survive(spark):
    """NULL partition-key groups are in-contract (the driver-side
    offset sort orders them NULLS FIRST, matching the range
    partitioner) — so the pass-2 offset join must be NULL-SAFE on the
    partition columns. A plain equi-join never matches NULL keys and
    silently dropped every NULL-group row (ADVICE r14, medium).
    Pins: NULL-group rows survive, and their running values match
    SUM OVER (PARTITION BY g ...) which groups NULLs together."""
    rows = [
        (None, 1, 10), (None, 2, 5), (None, 3, None), (None, 4, 2),
        ("a", 1, 7), ("a", 2, 1),
        ("b", 1, 4),
    ]
    df = spark.createDataFrame(rows, "g string, id int, v int")
    got, totals = running_totals(
        df,
        ["id"],
        sums={"cum": "v"},
        count_col="rn",
        num_partitions=6,
        partition_by=["g"],
        with_totals=True,
    )
    assert got.count() == 7  # nothing vanished
    w = Window.partitionBy("g").orderBy("id")
    want = df.select(
        "g",
        "id",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.sum("v")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    gm = {(r["g"], r["id"]): (r["rn"], r["cum"]) for r in got.collect()}
    wm = {(r["g"], r["id"]): (r["rn"], r["cum"]) for r in want.collect()}
    assert gm == wm
    assert totals == {"n_rows": 7, "cum": 29}


def test_with_totals_exact(spark):
    per_user = (
        _events(spark)
        .groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("k"))
    )
    got, totals = running_totals(
        per_user,
        ["user_id"],
        sums={"cum": "k"},
        count_col="rn",
        num_partitions=8,
        with_totals=True,
    )
    n, tot = per_user.agg(F.count("*"), F.sum("k")).first()
    assert totals["n_rows"] == n
    assert totals["cum"] == tot
    last = got.orderBy(F.desc("rn")).first()
    assert last["rn"] == n and last["cum"] == tot


def test_empty_input(spark):
    df = spark.createDataFrame([], "id bigint, v bigint")
    got, totals = running_totals(
        df, ["id"], sums={"cum": "v"}, count_col="rn", with_totals=True
    )
    assert got.count() == 0
    assert totals == {"n_rows": 0, "cum": None}


def test_registry_cumulative_keys_ride_prefix_sum(spark):
    """VERDICT r13 item 1: the two formerly-weak fact-proportional
    global cumulatives must plan through the prefix sum — the
    __ps_pid window present, and NO window sitting on a
    move-everything SinglePartition exchange (the 1-row scalar
    aggregates in the same plans legitimately use SinglePartition
    exchanges; only the Window-over-Sort-over-SinglePartition shape
    is the scale defect)."""
    import re

    from gps_stream_processing_spark.plans import REGISTRY

    for key in (
        "q_max_concurrency",
        "q_heaps_law",
        # the per-VALUE cumulative stats family (VERDICT r13 item 5):
        # value-domain-bounded at the fixtures, but cents domains
        # reach ~5e7 distinct at warehouse scale
        "q_ks_test",
        "q_mannwhitney",
        "q_spearman_corr",
        "q_roc_auc",
        "q_trimmed_mean",
        "q_wasserstein",
        "q_vocab_coverage",
    ):
        df = REGISTRY[key].fn(spark, SF_SMALL)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )
        assert "__ps_pid" in plan, f"{key}: prefix-sum window missing"
        assert not re.search(
            r"Window[^\n]*\n[^\n]*Sort[^\n]*\n[^\n]*Exchange SinglePartition",
            plan,
        ), f"{key}: global-cumulative window on a single partition"


def test_plan_window_is_partitioned_not_single(spark):
    per_user = (
        _events(spark)
        .groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("k"))
    )
    got = running_totals(
        per_user, ["user_id"], sums={"cum": "k"}, count_col="rn"
    )
    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "formatted"
    )
    assert "Window" in plan  # the running values do run as a window...
    # ...but partitioned on the internal pid (parallel), never via the
    # naive move-everything Exchange — the whole point of the operator
    assert "Exchange SinglePartition" not in plan
    assert "__ps_pid" in plan


def test_partitioned_running_totals_property(spark):
    """Property sweep (hypothesis): for random (group incl. NULL,
    unique id, value incl. NULL) tables and random partition widths,
    the partitioned two-pass prefix sum equals
    SUM/ROW_NUMBER OVER (PARTITION BY g ORDER BY id) exactly — the
    generative twin of the fixed NULL-group and reset pins above.
    Spark round-trips are slow, so few but adversarial examples."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    groups = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))
    vals = st.one_of(st.none(), st.integers(-1000, 1000))

    @settings(max_examples=12, deadline=None)
    @given(
        rows=st.lists(st.tuples(groups, vals), min_size=1, max_size=40),
        n_parts=st.integers(1, 9),
    )
    def check(rows, n_parts):
        data = [(g, i, v) for i, (g, v) in enumerate(rows)]
        df = spark.createDataFrame(data, "g string, id int, v int")
        got, totals = running_totals(
            df,
            ["id"],
            sums={"cum": "v"},
            count_col="rn",
            num_partitions=n_parts,
            partition_by=["g"],
            with_totals=True,
        )
        w = Window.partitionBy("g").orderBy("id")
        want = df.select(
            "g",
            "id",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.sum("v")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("cum"),
        )
        gm = {(r["g"], r["id"]): (r["rn"], r["cum"]) for r in got.collect()}
        wm = {(r["g"], r["id"]): (r["rn"], r["cum"]) for r in want.collect()}
        assert gm == wm
        assert totals["n_rows"] == len(data)
        vs = [v for _, _, v in data if v is not None]
        assert totals["cum"] == (sum(vs) if vs else None)

    check()
