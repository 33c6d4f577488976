"""NMEA scalar functions (SURVEY §2.5-2.6) — pure column expressions.

All of these stay JVM-side (no UDF): even the checksum is a fold over
the character array with bitwise XOR, so the hot parse path is fully
whole-stage-codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sentence_type(line: Column) -> Column:
    """``substr($line,1,5)`` + trim + upper (class.nmea.parser.php:137-140).
    PHP substr is 0-based: chars 1..5 are the five letters after ``$``."""
    return F.upper(F.trim(F.substring(line, 2, 5)))


def strip_fractional_seconds(utc: Column) -> Column:
    """``fixUTC``: drop fractional seconds from ``hhmmss.ss``
    (class.nmea.parser.php:391-394)."""
    return F.substring_index(utc, ".", 1)


def nmea_time_to_timestamp(utc: Column, date: Column) -> Column:
    """``NMEAtoUnixTime(utc hhmmss, date ddmmyy) → epoch``
    (class.nmea.parser.php:86-95). The header comment says ``mmddyy``
    (``:83``) but the code parses **ddmmyy** — NMEA-correct; we follow
    the code. Two-digit year uses the POSIX/PHP pivot (69-99 → 1900s,
    00-68 → 2000s) — matching the reference's ``mktime`` (``:94``, e.g.
    golden date 230394 → 1994) and DuckDB's ``%y``; Spark's own ``yy``
    pattern would map everything to 2000-2099, so we build the year
    explicitly. The reference used local-time ``mktime``; we
    standardize on UTC (session TZ). ``try_*`` keeps malformed input
    null under ANSI mode.
    """
    u = strip_fractional_seconds(utc)
    yy = F.substring(date, 5, 2).try_cast("int")
    year = F.when(yy >= 69, yy + 1900).otherwise(yy + 2000)
    return F.try_make_timestamp(
        year,
        F.substring(date, 3, 2).try_cast("int"),
        F.substring(date, 1, 2).try_cast("int"),
        F.substring(u, 1, 2).try_cast("int"),
        F.substring(u, 3, 2).try_cast("int"),
        F.substring(u, 5, 2).try_cast("double"),
    )


def nmea_body(line: Column) -> Column:
    """Payload between ``$`` and ``*`` (checksum excluded)."""
    return F.substring_index(F.substring(line, 2, 1 << 20), "*", 1)


def nmea_checksum_expr(line: Column) -> Column:
    """Computed checksum: XOR of chars between ``$`` and ``*`` as a
    2-hex-digit string. The reference stores but never validates the
    ``*`` suffix (SURVEY §2.6); we validate. Implemented as an
    ``aggregate`` fold with bitwise XOR over the split char array —
    no Python UDF."""
    chars = F.split(nmea_body(line), "")
    acc = F.aggregate(
        chars,
        F.lit(0),
        lambda a, ch: a.bitwiseXOR(F.ascii(ch)),
    )
    return F.lpad(F.upper(F.hex(acc)), 2, "0")


def nmea_checksum_ok(line: Column) -> Column:
    """True iff the trailing ``*XX`` matches the computed XOR; lines
    without a checksum suffix are false."""
    claimed = F.upper(F.substring_index(line, "*", -1))
    return (
        line.contains("*")
        & (F.length(claimed) == 2)
        & (claimed == nmea_checksum_expr(line))
    )
