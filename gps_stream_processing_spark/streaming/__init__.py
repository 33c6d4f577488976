from gps_stream_processing_spark.streaming.runner import run_available_now  # noqa: F401
