"""Drop-in facade mirroring the reference's public API surface.

The reference engine is one PHP class, ``NmeaParser``
(``class.nmea.parser.php:16``), with a push-based, single-receiver
lifecycle: configure → ``ParseLine`` per line → ``DumpNmea``. This
module offers the same call surface backed by the Spark pipeline so a
reference user can switch without rewriting their ingest loop — while
``to_df()`` exposes the Spark-native path for everything beyond the
reference's reach (windows, joins, streaming).

Method-by-method parity (reference citations):

| method | reference | behavior here |
| --- | --- | --- |
| ``ParseLine(line)``       | ``:103-114`` | buffer one sentence (arrival order preserved) |
| ``DumpNmea()``            | ``:121-123`` | run the pipeline, return ``{utc: {field: value}}`` |
| ``GetNmeaData()``         | ``:369-371`` | alias of ``DumpNmea`` (duplicate accessor, as in ref) |
| ``GoodEnough()``          | ``:126-129`` | completeness of the *latest* fix (date/utc/lat/lon) |
| ``SetMinSatellites(n)``   | ``:40-42``   | ACTUALLY enforced (ref declares, never applies — ``:13``) |
| ``SetMaxHdop(x)``         | ``:62-64``   | enforced |
| ``SetMaxVdop(x)``         | ``:75-77``   | enforced |

The reference keys records by bare UTC string because it models one
receiver; this facade does the same (all pushed lines are one track).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from gps_stream_processing_spark.operators.gps_fix import (
    gps_fix_pipeline,
    quality_filter,
)
from gps_stream_processing_spark.schemas import NMEA_LINE_SCHEMA


class NmeaParser:
    """Push-based, single-receiver facade over the Spark pipeline
    (reference: ``class.nmea.parser.php:16-399``)."""

    def __init__(self, spark: SparkSession) -> None:
        self._spark = spark
        self._lines: list[str] = []
        self._min_sats: int | None = None
        self._max_hdop: float | None = None
        self._max_vdop: float | None = None

    # -- configuration (reference :40-77; declared there, enforced here)

    def SetMinSatellites(self, minSats: int = 4) -> None:  # noqa: N802 — ref casing
        self._min_sats = minSats

    def SetMaxHdop(self, maxHDOP: float = 10) -> None:  # noqa: N802
        self._max_hdop = maxHDOP

    def SetMaxVdop(self, maxVDOP: float = 10) -> None:  # noqa: N802
        self._max_vdop = maxVDOP

    # -- ingest (reference :103-114)

    def ParseLine(self, line: str) -> None:  # noqa: N802
        """Push one NMEA sentence. Unknown/garbage sentences are dropped
        at pipeline time exactly like the reference's ``default:
        return`` (``:112``)."""
        self._lines.append(line)

    def ParseLines(self, lines: list[str]) -> None:  # noqa: N802
        self._lines.extend(lines)

    # -- retrieval (reference :121-129, :369-371)

    def to_df(self) -> DataFrame:
        """The Spark-native view: typed gps_fix DataFrame with the
        configured quality filters applied."""
        rows = [(i, 0, line) for i, line in enumerate(self._lines)]
        df = self._spark.createDataFrame(rows, NMEA_LINE_SCHEMA)
        fixes = gps_fix_pipeline(df)
        if any(
            v is not None for v in (self._min_sats, self._max_hdop, self._max_vdop)
        ):
            fixes = quality_filter(
                fixes,
                min_sats=self._min_sats if self._min_sats is not None else 0,
                max_hdop=self._max_hdop if self._max_hdop is not None else float("inf"),
                max_vdop=self._max_vdop if self._max_vdop is not None else float("inf"),
            )
        return fixes

    def DumpNmea(self) -> dict[str, dict[str, Any]]:  # noqa: N802
        """The reference's ``$Nmea`` shape: ``{utc: {field: value}}``
        (``:121-123``). Null fields are omitted, like fields whose
        sentences never arrived."""
        out: dict[str, dict[str, Any]] = {}
        for row in self.to_df().collect():
            d = {k: v for k, v in row.asDict().items() if v is not None}
            out[d.pop("utc")] = d
        return out

    def GetNmeaData(self) -> dict[str, dict[str, Any]]:  # noqa: N802
        """Duplicate accessor, faithfully (``:369-371``)."""
        return self.DumpNmea()

    def GoodEnough(self) -> bool:  # noqa: N802
        """Does the most recent fix have date/utc/lat/lon (``:126-129``)?
        One job: take the merged table's latest-utc row and evaluate the
        completeness predicate as a column on it (utc is never null on a
        merged row — it is the merge key — so only date/lat/lon can
        fail), instead of running the pipeline twice and comparing two
        collected keys."""
        from pyspark.sql import functions as F

        rows = [(i, 0, line) for i, line in enumerate(self._lines)]
        if not rows:
            return False
        df = self._spark.createDataFrame(rows, NMEA_LINE_SCHEMA)
        latest_ok = (
            gps_fix_pipeline(df)
            .orderBy(F.col("utc").desc())
            .limit(1)
            .select(
                (
                    F.col("date").isNotNull()
                    & F.col("utc").isNotNull()
                    & F.col("lat").isNotNull()
                    & F.col("lon").isNotNull()
                ).alias("ok")
            )
            .collect()
        )
        return bool(latest_ok) and bool(latest_ok[0]["ok"])
