"""Binned (bucketized) range join — the scale path for non-equi interval
joins (SURVEY §2.3).

The reference performs no relational joins at all (its only code file is
class.nmea.parser.php:1-399; SURVEY §0) — this is engine surface (`ext`).

A plain range join ``fact.value BETWEEN iv.lo AND iv.hi`` can only plan
as a nested-loop join: every (fact row × interval) pair is tested, which
is O(F·I) work and — when the interval side is too big to broadcast —
forces a single-partition BroadcastNestedLoopJoin that cannot scale.

The standard fix (used by Databricks' range-join optimization and
DuckDB's IEJoin literature) is to discretize the range key into
fixed-width bins so the join becomes an *equi*-join on the bin id:

- fact side:      ``bin = floor(value / w)`` — one row per fact row;
- interval side:  one row per bin the interval overlaps, via
  ``explode(sequence(floor(lo/w), floor(hi/w)))``;
- equi-join on ``bin`` (hash-partitionable, AQE-skew-splittable,
  broadcast-able when the exploded interval side is small), then
- re-apply the exact predicate to discard same-bin false positives.

Each fact row joins only the intervals overlapping its bin instead of
every interval, and the join is a hash join instead of a nested loop.
Output is exactly the plain range join's, so the same SQL oracle covers
both formulations. Bin width trades interval-side blowup (≈ span/w rows
per interval) against candidate false positives; pick w ≈ median
interval span.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BIN = "__range_bin"


def binned_range_join(
    fact: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_width: float = 50.0,
    hi_inclusive: bool = False,
) -> DataFrame:
    """Inner-join ``fact`` to ``intervals`` on lo <= value < hi (or
    <= hi when ``hi_inclusive``) via fixed-width bins; output ≡ the
    plain theta join. Inner only: an outer variant would need the
    refine predicate folded into the join condition rather than a
    post-filter. ``fact`` and ``intervals`` must not share column
    names."""
    w = float(bin_width)
    if w <= 0:
        raise ValueError("bin_width must be positive")

    f_binned = fact.withColumn(_BIN, F.floor(F.col(value_col) / F.lit(w)))
    # One interval row per overlapped bin. For a half-open [lo, hi) the
    # hi boundary bin is still generated (harmless: the refine predicate
    # drops value == hi) — correct and simpler than special-casing exact
    # multiples of w.
    i_binned = intervals.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(w)),
                F.floor(F.col(hi_col) / F.lit(w)),
            )
        ),
    )
    upper: Column = (
        F.col(value_col) <= F.col(hi_col)
        if hi_inclusive
        else F.col(value_col) < F.col(hi_col)
    )
    refined = f_binned.join(
        i_binned,
        on=[_BIN],
        how="inner",
    ).filter((F.col(value_col) >= F.col(lo_col)) & upper)
    return refined.drop(_BIN)
