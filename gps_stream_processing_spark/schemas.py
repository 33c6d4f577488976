"""Engine schemas (SURVEY.md §1.2-1.3, FIXTURES.md).

The reference stores every fix as an all-strings PHP associative array
(``class.nmea.parser.php:18,173-187``); we normalize to a fixed, typed
``gps_fix`` StructType at parse time (SURVEY §1.3 mapping table).
"""

from __future__ import annotations

from pyspark.sql import types as T

# One raw NMEA line. ``line_no`` is arrival order — it drives the
# forward-fill of the fix key (the reference's ``$CurrentUTC`` cursor,
# ``class.nmea.parser.php:172,226``); ``track_id`` is the receiver id,
# the partition key that makes the forward-fill scale (SURVEY §4.2).
NMEA_LINE_SCHEMA = T.StructType(
    [
        T.StructField("line_no", T.LongType(), False),
        T.StructField("track_id", T.LongType(), False),
        T.StructField("value", T.StringType(), True),
    ]
)

SAT_INFO_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("prn", T.IntegerType(), True),
            T.StructField("elev", T.IntegerType(), True),
            T.StructField("azim", T.IntegerType(), True),
            T.StructField("snr", T.IntegerType(), True),
        ]
    )
)

# One row per (track_id, fix-second): the typed equivalent of the
# reference's ``$Nmea[utc_key]`` record (field census in SURVEY §1.2).
GPS_FIX_SCHEMA = T.StructType(
    [
        T.StructField("track_id", T.LongType(), False),
        T.StructField("utc", T.StringType(), True),  # hhmmss, frac stripped (:391-394)
        T.StructField("ts", T.TimestampType(), True),  # NMEAtoUnixTime (:86-95), UTC
        T.StructField("date", T.StringType(), True),  # ddmmyy (:297)
        T.StructField("lat", T.DoubleType(), True),  # degree2decimal (:339-351)
        T.StructField("lon", T.DoubleType(), True),
        T.StructField("alt_m", T.DoubleType(), True),  # GPGGA (:182)
        T.StructField("geoid_sep_m", T.DoubleType(), True),  # GPGGA (:184)
        T.StructField("gps_qual", T.IntegerType(), True),  # GPGGA (:179)
        T.StructField("num_sat", T.IntegerType(), True),  # GPGGA (:180)
        T.StructField("hdop", T.DoubleType(), True),  # GPGGA hdp (:181)
        T.StructField("pdop", T.DoubleType(), True),  # GPGSA (:241)
        T.StructField("vdop", T.DoubleType(), True),  # GPGSA (:243)
        T.StructField("select_mode", T.StringType(), True),  # GPGSA (:227)
        T.StructField("fix_mode", T.StringType(), True),  # GPGSA (:228)
        T.StructField("sat_prns", T.ArrayType(T.IntegerType()), True),  # (:229-240)
        T.StructField("sats_in_view", T.IntegerType(), True),  # GPGSV (:267)
        T.StructField("sat_info", SAT_INFO_TYPE, True),  # accumulated (fixes :261-272)
        T.StructField("status", T.StringType(), True),  # GPGLL A/V decoded (:206)
        T.StructField("status_rmc", T.StringType(), True),  # GPRMC (:294)
        T.StructField("speed_knots", T.DoubleType(), True),  # GPRMC (:295)
        T.StructField("speed_kmh", T.DoubleType(), True),  # GPVTG (:324-327)
        T.StructField("track_deg_true", T.DoubleType(), True),  # GPRMC/GPVTG (:296,320)
        T.StructField("track_deg_mag", T.DoubleType(), True),  # GPVTG (:322)
        T.StructField("mag_var", T.DoubleType(), True),  # GPRMC (:298)
        T.StructField("mag_var_dir", T.StringType(), True),  # GPRMC (:299)
        T.StructField("sentence_types", T.ArrayType(T.StringType()), True),  # (:173 etc.)
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
