#!/usr/bin/env python
"""Capture .explain("formatted") output for named registry keys.

Usage: python tools/capture_plans.py <suffix> q_key1 q_key2 ...

Writes plans/r16/<key>_<suffix>.txt for each key (suffix is e.g.
"before" or "after"). Batch keys capture the plan of the DataFrame the
registered fn returns WITHOUT executing it where possible; keys whose
fn runs a stream (the q_stream_* family) or lands data execute as part
of building that frame — their captured plan is the post-run batch
frame, so for those the interesting evidence is the operator source
diff, not the plan file.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16"),
)


def main() -> None:
    suffix = sys.argv[1]
    keys = sys.argv[2:]
    from gps_stream_processing_spark import plans
    from gps_stream_processing_spark.plans.registry import tune_session
    from gps_stream_processing_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="plan-capture", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    tune_session(spark, SF_DIR)
    os.makedirs(OUT_DIR, exist_ok=True)
    for k in keys:
        fn = plans.REGISTRY[k].fn
        df = fn(spark, SF_DIR)
        txt = df._jdf.queryExecution().explainString(  # noqa: SLF001
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(OUT_DIR, f"{k}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
