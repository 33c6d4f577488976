"""gps_stream_processing_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference repo
``rugbyprof/Gps-Stream-Processing`` (a single-pass NMEA-0183 GPS sentence
parser, ``class.nmea.parser.php:1-399``) as an idiomatic Spark engine:

- batch + Structured Streaming NMEA ingest → typed ``gps_fix`` table
  (the reference's ``$Nmea`` store, ``class.nmea.parser.php:18,173-187``)
- a full relational operator inventory over the driver test tables
- GPS analytics (haversine, bearing, per-track deltas, sessionization)
- LLM-data-pipeline operators (dedup, similarity search, multimodal
  columns, text analysis) designed for 100 TB scale.

Everything is DataFrame/SQL-first so Catalyst handles pushdown, pruning,
join selection and AQE; Python crosses the JVM boundary only in the two
sanctioned pandas escape hatches (streaming stateful merge, multimodal
decode stubs).
"""

__version__ = "0.1.0"
