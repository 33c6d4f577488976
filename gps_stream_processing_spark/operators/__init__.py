from gps_stream_processing_spark.operators.gps_fix import (  # noqa: F401
    gps_fix_pipeline,
    merge_fixes,
    parse_sentences,
    with_fix_key,
)
