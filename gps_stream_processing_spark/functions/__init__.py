from gps_stream_processing_spark.functions.geo import (  # noqa: F401
    bearing_deg,
    degree2decimal,
    haversine_km,
    knots_to_kmh,
)
from gps_stream_processing_spark.functions.nmea import (  # noqa: F401
    nmea_checksum_expr,
    nmea_checksum_ok,
    nmea_time_to_timestamp,
    sentence_type,
    strip_fractional_seconds,
)
