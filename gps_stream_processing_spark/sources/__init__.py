from gps_stream_processing_spark.sources.tables import load_table, load_tables  # noqa: F401
