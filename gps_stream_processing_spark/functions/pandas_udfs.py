"""Sanctioned Arrow-vectorized pandas UDFs (SURVEY §2.10).

NOTE: deliberately NO ``from __future__ import annotations`` here —
pandas_udf resolves the pd.Series type hints at definition time, and
stringified annotations break the signature inference.
"""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


@F.pandas_udf("double")
def haversine_km_np(
    lat1: pd.Series, lon1: pd.Series, lat2: pd.Series, lon2: pd.Series
) -> pd.Series:
    """Vectorized numpy haversine — the pandas-UDF twin of
    functions.geo.haversine_km, used to exercise the Arrow scalar-UDF
    path (pytest cross-checks it against the pure-column version)."""
    rl1, rl2 = np.radians(lat1), np.radians(lat2)
    dlat = np.radians(lat2 - lat1)
    dlon = np.radians(lon2 - lon1)
    a = np.sin(dlat / 2) ** 2 + np.cos(rl1) * np.cos(rl2) * np.sin(dlon / 2) ** 2
    return pd.Series(2 * 6371.0 * np.arcsin(np.minimum(1.0, np.sqrt(a))))


@F.pandas_udf("double")
def trimmed_mean_10(v: pd.Series) -> float:
    """Grouped-agg pandas UDF (SURVEY §2.10): mean of the middle 80%
    (drop the bottom/top decile) — a robust-statistics aggregate with no
    Spark builtin. One Arrow batch per group; at scale the group count,
    not group size, drives parallelism."""
    s = v.dropna().sort_values()
    k = int(len(s) * 0.1)
    trimmed = s.iloc[k : len(s) - k] if len(s) > 2 * k else s
    return float(trimmed.mean()) if len(trimmed) else float("nan")
