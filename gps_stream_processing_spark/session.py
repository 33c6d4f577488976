"""SparkSession factory (SURVEY.md §7 step 0).

The reference is single-threaded and in-memory
(``class.nmea.parser.php:1-399`` — no threads, no spill); our engine runs
on Spark with AQE, UTC session time, and shuffle parallelism sized for
the host. On a real cluster the same builder is used with
``master``/memory settings supplied by the deployment, so everything
scale-relevant lives in plain configs here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "gps_stream_processing_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine session.

    Scale notes (100 TB design):
    - AQE on: runtime partition coalescing, skew-join splitting, and
      broadcast demotion replace hand-tuned plans.
    - ``spark.sql.shuffle.partitions`` is a *starting* width; AQE
      coalesces. On a 1000-executor cluster this would be set to
      2-3× total cores instead.
    - UTC session timezone pins timestamp semantics (the reference's
      ``mktime`` was local-time, ``class.nmea.parser.php:94``; we
      standardize on UTC — documented divergence).
    - Arrow enabled: every pandas boundary crossing is Arrow-batched.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        # In local mode the driver JVM hosts every executor thread AND
        # all broadcast builds; the 1g default OOMs a 64 MB-threshold
        # broadcast long before data does. Only effective for the first
        # session in the process (the JVM is already up afterwards); on a
        # cluster the deployment supplies executor/driver memory instead.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # UDTFs too: ArrowEvalPythonUDTF replaces the row-at-a-time
        # BatchEvalPythonUDTF (pickle per row) — measured equal at
        # fixture scale, and Arrow batching is the only shape that
        # survives real data volumes.
        .config("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
        .config("spark.sql.shuffle.spill.compress", "true")
        # Small-dim broadcast threshold: every dim table in the star
        # schema (region/nation/customer/supplier/part) broadcasts.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # Worker-env injection for a discovered protobuf runtime (TWS
    # support) must land BEFORE the session's first Python function
    # wraps: a later sc.environment change re-keys the worker-daemon
    # pool and discards every warmed worker (measured: bench.py's
    # datasource/UDTF warm-ups were lost to a first-query injection —
    # q_custom_datasource 0.77s -> 3.2s). No-op where protobuf is
    # native or absent. tune_session repeats the call for sessions not
    # built through this factory (e.g. the driver harness's own).
    from gps_stream_processing_spark.streaming.protobuf_compat import (
        configure_worker_env,
        ensure_protobuf,
    )

    ensure_protobuf()
    configure_worker_env(spark)
    return spark
