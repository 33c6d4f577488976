"""Custom Python Data Source (Spark 4 DataSource API) for NMEA lines.

The reference's only ingest is a per-line push call
(``ParseLine``, class.nmea.parser.php:103-114). Spark's idiomatic
equivalent of "my data arrives via custom code" is a DataSource V2
implementation — since Spark 4 writable in pure Python
(pyspark.sql.datasource) — so the engine ships one: a deterministic
NMEA sentence source, partitioned per track, readable as

    spark.read.format("nmea_fixture").option("n_tracks", 3).load()

Scale notes: ``partitions()`` declares one InputPartition per track, so
a cluster reads tracks in parallel exactly like a directory of
per-receiver files; each partition's ``read`` yields plain tuples that
Spark converts to Arrow batches. The fixture generator is a single
sequential RNG stream (FIXTURES.md §A.1 pins byte-identical output), so
each partition regenerates the stream and keeps its own track's rows —
fine at fixture scale and the price of bit-exact parity with the
committed parquet; a production source would instead seed per
partition or read per-receiver files.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class NmeaFixtureDataSource(DataSource):
    """``format("nmea_fixture")`` — options: n_tracks, n_seconds."""

    @classmethod
    def name(cls) -> str:
        return "nmea_fixture"

    def schema(self) -> str:
        return "line_no long, track_id long, value string"

    def reader(self, schema) -> "NmeaFixtureReader":
        return NmeaFixtureReader(self.options)


class NmeaFixtureReader(DataSourceReader):
    def __init__(self, options) -> None:
        import os

        self.n_tracks = int(options.get("n_tracks", 3))
        self.n_seconds = int(options.get("n_seconds", 120))
        # Captured at plan time on the driver, shipped in the pickled
        # reader: lets the executor-side import succeed even when the
        # worker process doesn't inherit the repo on PYTHONPATH.
        self.repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )

    def partitions(self):
        return [InputPartition(t) for t in range(self.n_tracks)]

    def read(self, partition):
        import sys

        if self.repo_root not in sys.path:
            sys.path.insert(0, self.repo_root)
        from gps_stream_processing_spark.sources.nmea import generate_nmea_rows

        want = partition.value
        for line_no, track, value in generate_nmea_rows(
            n_tracks=self.n_tracks, n_seconds=self.n_seconds
        ):
            if track == want:
                yield (line_no, track, value)


def register_nmea_datasource(spark) -> None:
    """Idempotent per-session registration."""
    try:
        spark.dataSource.register(NmeaFixtureDataSource)
    except Exception:  # noqa: BLE001 — already registered is fine
        pass
