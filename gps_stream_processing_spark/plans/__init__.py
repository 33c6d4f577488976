"""Query plans: the SURVEY §2 operator inventory as registered
(spark_fn, oracle_sql) pairs. Importing this package populates the
registry that ``__spark_entry__.py`` exposes to the driver."""

from gps_stream_processing_spark.plans import (  # noqa: F401
    corpus,
    curation,
    events_analytics,
    graph_queries,
    llm,
    nmea_queries,
    relational,
    scalars,
    streaming_queries,
    tpch,
)
from gps_stream_processing_spark.plans.registry import (  # noqa: F401
    REGISTRY,
    oracle_sql,
    queries,
    register,
)
