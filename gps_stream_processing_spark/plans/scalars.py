"""Scalar-function family queries (SURVEY §2.6): the reference's scalars
(degree2decimal, NMEA time, unit conversion) plus the engine's
string/date/math/array/json families, each verified against the same
arithmetic in DuckDB. All pure column expressions — zero UDFs, fully
whole-stage-codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gps_stream_processing_spark.functions.geo import (
    bearing_deg,
    degree2decimal,
    haversine_km,
    knots_to_kmh,
)
from gps_stream_processing_spark.functions.nmea import nmea_time_to_timestamp
from gps_stream_processing_spark.plans.registry import register, spread_scan, table


@register(
    "q_deg2dec",
    oracle="""
    WITH src AS (
      SELECT l_orderkey, l_linenumber,
             ROUND(fmod(l_extendedprice, 9000.0) + 100.0, 4) AS ddmm,
             CASE WHEN l_returnflag = 'R' THEN 'S' ELSE 'N' END AS hemi
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           ROUND(CASE WHEN hemi IN ('S','W')
                      THEN -(floor(ddmm/100) + (ddmm - floor(ddmm/100)*100)/60)
                      ELSE  (floor(ddmm/100) + (ddmm - floor(ddmm/100)*100)/60)
                 END, 6) AS dec_deg
    FROM src
    """,
    doc="The reference's degree2decimal (class.nmea.parser.php:339-351: "
    "deg=int(x/100); dec=deg+(x-deg*100)/60; negate S/W; 6dp) applied to "
    "synthesized ddmm.mmmm values from lineitem — engine fn vs plain SQL "
    "arithmetic.",
)
def q_deg2dec(spark: SparkSession, sf: str) -> DataFrame:
    src = table(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") % 9000.0 + 100.0, 4).alias("ddmm"),
        F.when(F.col("l_returnflag") == "R", "S").otherwise("N").alias("hemi"),
    )
    return src.select(
        "l_orderkey",
        "l_linenumber",
        degree2decimal(F.col("ddmm"), F.col("hemi")).alias("dec_deg"),
    )


@register(
    "q_nmea_time",
    oracle="""
    SELECT event_id,
           strptime(strftime(ts, '%d%m%y') || strftime(ts, '%H%M%S'),
                    '%d%m%y%H%M%S') AS ts_roundtrip
    FROM events
    """,
    doc="NMEAtoUnixTime (class.nmea.parser.php:86-95): events timestamps "
    "formatted to the reference's ddmmyy + hhmmss wire format and parsed "
    "back through the engine's nmea_time_to_timestamp (2-digit-year POSIX "
    "pivot) — round-trip equals date_trunc('second').",
)
def q_nmea_time(spark: SparkSession, sf: str) -> DataFrame:
    e = table(spark, sf, "events").select(
        "event_id",
        F.date_format("ts", "ddMMyy").alias("d"),
        F.date_format("ts", "HHmmss").alias("u"),
    )
    return e.select(
        "event_id",
        nmea_time_to_timestamp(F.col("u"), F.col("d")).alias("ts_roundtrip"),
    )


@register(
    "q_string_fns",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           trim(p_type) AS type_trim,
           substring(p_name, 1, 5) AS name_pfx,
           split_part(p_name, ' ', 1) AS first_word,
           p_brand || '/' || p_type AS brand_type,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           CAST(length(p_name) AS INTEGER) AS name_len,
           CASE WHEN p_type LIKE '%O%' THEN 1 ELSE 0 END AS has_o
    FROM part
    """,
    doc="String family: upper/lower/trim/substring/split/concat/regexp_"
    "extract/length/like (the reference uses substr/trim/strtoupper/"
    "explode at class.nmea.parser.php:138,171; SURVEY §2.6).",
)
def q_string_fns(spark: SparkSession, sf: str) -> DataFrame:
    return table(spark, sf, "part").select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.trim("p_type").alias("type_trim"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.length("p_name").alias("name_len"),
        F.when(F.col("p_type").like("%O%"), 1).otherwise(0).alias("has_o"),
    )


@register(
    "q_date_fns",
    oracle="""
    SELECT event_id,
           CAST(year(ts) AS INTEGER) AS y,
           CAST(month(ts) AS INTEGER) AS m,
           CAST(day(ts) AS INTEGER) AS d,
           CAST(hour(ts) AS INTEGER) AS h,
           CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
           date_trunc('day', ts) AS day_ts,
           CAST(floor(epoch(ts)) AS BIGINT) AS unix_s,
           CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INTEGER)
             AS days_since_ny
    FROM events
    """,
    doc="Date/time family (SURVEY §2.6). Convention alignment: Spark "
    "dayofweek is 1=Sunday; DuckDB dayofweek is 0=Sunday → oracle adds 1.",
)
def q_date_fns(spark: SparkSession, sf: str) -> DataFrame:
    e = table(spark, sf, "events")
    return e.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.dayofweek("ts").alias("dow"),
        F.date_trunc("day", "ts").alias("day_ts"),
        F.unix_timestamp("ts").alias("unix_s"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "days_since_ny"
        ),
    )


@register(
    "q_math_fns",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1) AS price_r1,
           ROUND(abs(l_quantity - 25.0), 6) AS qty_dev,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
           ROUND(sqrt(l_quantity), 6) AS qty_sqrt,
           ROUND(ln(l_extendedprice), 6) AS price_ln,
           ROUND(pow(l_discount, 2), 6) AS disc_sq,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod
    FROM lineitem
    """,
    doc="Math family: round/abs/floor/sqrt/ln/pow/mod (the reference's "
    "int-cast arithmetic, class.nmea.parser.php:340-343; SURVEY §2.6).",
)
def q_math_fns(spark: SparkSession, sf: str) -> DataFrame:
    # r17: single-split scan -> the per-row math pipeline ran one-core
    # (cpu ~= wall ~= 0.74 s); spread_scan is a no-op at production
    # split widths and values are per-row deterministic (guide S2.2/S6).
    return spread_scan(table(spark, sf, "lineitem"), "l_orderkey").select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.round(F.abs(F.col("l_quantity") - 25.0), 6).alias("qty_dev"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.pow("l_discount", 2), 6).alias("disc_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


# Synthesized coordinates: deterministic lat/lon pairs derived from keys
# so geo scalars are verifiable against DuckDB with integer-exact inputs.
_COORDS_SQL = """
      SELECT l_orderkey, l_linenumber,
             CAST(l_orderkey % 170 - 85 AS DOUBLE) AS lat1,
             CAST(l_partkey % 360 - 180 AS DOUBLE) AS lon1,
             CAST(l_suppkey % 170 - 85 AS DOUBLE) AS lat2,
             CAST((l_orderkey + l_partkey) % 360 - 180 AS DOUBLE) AS lon2
      FROM lineitem
"""


@register(
    "q_haversine",
    oracle=f"""
    WITH c AS ({_COORDS_SQL})
    SELECT l_orderkey, l_linenumber,
           ROUND(2 * 6371.0 * asin(least(1.0, sqrt(
             pow(sin(radians(lat2 - lat1) / 2), 2)
             + cos(radians(lat1)) * cos(radians(lat2))
               * pow(sin(radians(lon2 - lon1) / 2), 2)))), 6) AS dist_km
    FROM c
    """,
    doc="Haversine great-circle distance — the canonical GPS-analytics "
    "scalar (SURVEY §2.6 q_haversine), pure column arithmetic.",
)
def q_haversine(spark: SparkSession, sf: str) -> DataFrame:
    c = _coords(spark, sf, spread=True)
    return c.select(
        "l_orderkey",
        "l_linenumber",
        F.round(haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")), 6).alias(
            "dist_km"
        ),
    )


def _coords(spark: SparkSession, sf: str, spread: bool = False) -> DataFrame:
    # r17: ``spread`` opts a consumer into spread_scan on the single-
    # split lineitem scan (placement-safe: per-row trig / exact counts;
    # guide S2.2/S6). Measured per consumer: the trig-heavy per-row
    # keys (haversine 0.78 s one-core cpu, unit_conv 0.49 s) gain
    # ~2x; the light ones (point_in_polygon 0.33 -> 0.53 s,
    # geofence flat) LOSE to the added exchange and stay unspread.
    l = table(spark, sf, "lineitem")
    if spread:
        l = spread_scan(l, "l_orderkey")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_orderkey") % 170 - 85).cast("double").alias("lat1"),
        (F.col("l_partkey") % 360 - 180).cast("double").alias("lon1"),
        (F.col("l_suppkey") % 170 - 85).cast("double").alias("lat2"),
        ((F.col("l_orderkey") + F.col("l_partkey")) % 360 - 180).cast("double").alias("lon2"),
    )


@register(
    "q_unit_conv",
    oracle=f"""
    WITH c AS ({_COORDS_SQL})
    SELECT l_orderkey, l_linenumber,
           ROUND(CAST(l_orderkey % 50 AS DOUBLE) * 1.852, 6) AS speed_kmh,
           ROUND(fmod(degrees(atan2(
               sin(radians(lon2 - lon1)) * cos(radians(lat2)),
               cos(radians(lat1)) * sin(radians(lat2))
                 - sin(radians(lat1)) * cos(radians(lat2)) * cos(radians(lon2 - lon1))
             )) + 360.0, 360.0), 6) AS bearing
    FROM c
    """,
    doc="Unit conversion (knots→km/h ×1.852, mirroring the reference's "
    "spdknots/spdkmph pair, class.nmea.parser.php:324-326) + initial "
    "bearing via atan2 (SURVEY §2.6).",
)
def q_unit_conv(spark: SparkSession, sf: str) -> DataFrame:
    c = _coords(spark, sf, spread=True)
    return c.select(
        "l_orderkey",
        "l_linenumber",
        F.round(knots_to_kmh((F.col("l_orderkey") % 50).cast("double")), 6).alias("speed_kmh"),
        F.round(
            bearing_deg(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")), 6
        ).alias("bearing"),
    )


@register(
    "q_array_fns",
    oracle="""
    SELECT vec_id, label,
           CAST(len(embedding) AS INTEGER) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
           ROUND(list_sum(embedding::DOUBLE[]), 6) AS vec_sum,
           ROUND(CAST(list_min(embedding) AS DOUBLE), 6) AS vec_min,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS vec_max,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos
    FROM embeddings
    """,
    doc="Array family over embeddings: size/element_at/aggregate-fold "
    "sum/min/max/filter (SURVEY §2.6). Floats widened to double on both "
    "sides so the left-to-right fold matches bit-for-bit.",
)
def q_array_fns(spark: SparkSession, sf: str) -> DataFrame:
    e = table(spark, sf, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(vec, 1), 6).alias("first_elem"),
        F.round(
            F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("vec_sum"),
        F.round(F.array_min(vec), 6).alias("vec_min"),
        F.round(F.array_max(vec), 6).alias("vec_max"),
        F.size(F.filter(vec, lambda x: x > 0)).alias("n_pos"),
    )


@register(
    "q_geofence",
    oracle=f"""
    WITH c AS ({_COORDS_SQL})
    SELECT g.fence, CAST(COUNT(*) AS BIGINT) AS n_inside
    FROM c
    JOIN (VALUES ('equator_band', -10.0, 10.0, -180.0, 180.0),
                 ('north_box',     40.0, 60.0,    0.0,  40.0),
                 ('west_box',     -60.0,  0.0, -120.0, -60.0))
         g(fence, min_lat, max_lat, min_lon, max_lon)
      ON c.lat1 BETWEEN g.min_lat AND g.max_lat
     AND c.lon1 BETWEEN g.min_lon AND g.max_lon
    GROUP BY g.fence
    """,
    doc="Geofence containment (SURVEY §7 step 4, FIXTURES.md §A.3): "
    "point-in-bbox join against a broadcast fence dim — broadcast "
    "nested-loop with a 3-row inner, the right plan at any scale.",
)
def q_geofence(spark: SparkSession, sf: str) -> DataFrame:
    fences = spark.createDataFrame(
        [
            ("equator_band", -10.0, 10.0, -180.0, 180.0),
            ("north_box", 40.0, 60.0, 0.0, 40.0),
            ("west_box", -60.0, 0.0, -120.0, -60.0),
        ],
        "fence string, min_lat double, max_lat double, min_lon double, max_lon double",
    )
    c = _coords(spark, sf)
    return (
        c.join(
            F.broadcast(fences),
            F.col("lat1").between(F.col("min_lat"), F.col("max_lat"))
            & F.col("lon1").between(F.col("min_lon"), F.col("max_lon")),
        )
        .groupBy("fence")
        .agg(F.count("*").alias("n_inside"))
    )


@register(
    "q_json_fns",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS INTEGER) AS k_val,
           CASE WHEN CAST(props->>'$.k' AS INTEGER) >= 50 THEN 'hi' ELSE 'lo' END AS k_band
    FROM events
    """,
    doc="JSON extraction from events.props (SURVEY §2.6): "
    "get_json_object ↔ DuckDB ->> path extraction.",
)
def q_json_fns(spark: SparkSession, sf: str) -> DataFrame:
    e = table(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select(
        "event_id",
        k.alias("k_val"),
        F.when(k >= 50, "hi").otherwise("lo").alias("k_band"),
    )


@register(
    "q_map_fns",
    oracle="""
    SELECT event_id,
           CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
           array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
           CAST(props->>'$.k' AS INTEGER) AS k_val
    FROM events
    """,
    doc="Map family (SURVEY §2.6): events.props JSON decoded to a typed "
    "map<string,int> (from_json with explicit type — never schema_of_json "
    "per row), then size/map_keys/element_at; DuckDB twin via json_keys.",
)
def q_map_fns(spark: SparkSession, sf: str) -> DataFrame:
    e = table(spark, sf, "events")
    m = F.from_json("props", "map<string,int>")
    # materialize the parsed map once; three references below would
    # re-parse the JSON per column otherwise
    withm = e.select("event_id", m.alias("__m"))
    return withm.select(
        "event_id",
        F.size("__m").alias("n_keys"),
        F.array_join(F.sort_array(F.map_keys("__m")), ",").alias("keys_csv"),
        F.element_at("__m", "k").alias("k_val"),
    )


# Pentagon for q_point_in_polygon, (lat, lon) vertices. The .5 offsets
# guarantee no integer-valued fixture coordinate ever equals a vertex
# latitude, so the half-open ray-cast rule never sits on a boundary tie.
_POLY = (
    (10.5, -60.5),
    (40.5, -20.5),
    (20.5, 30.5),
    (-15.5, 40.5),
    (-30.5, -10.5),
)


def _pip_terms_sql(poly: tuple = _POLY) -> str:
    """Ray-cast crossing terms, one per polygon edge, as portable SQL."""
    terms = []
    for i, (ay, ax) in enumerate(poly):
        by, bx = poly[(i + 1) % len(poly)]
        terms.append(
            f"(CASE WHEN (({ay} > lat1) <> ({by} > lat1)) AND "
            f"lon1 < ({bx} - {ax}) * (lat1 - {ay}) / ({by} - {ay}) + {ax} "
            "THEN 1 ELSE 0 END)"
        )
    return " + ".join(terms)


@register(
    "q_point_in_polygon",
    oracle=f"""
    WITH c AS ({_COORDS_SQL})
    SELECT (({_pip_terms_sql()}) % 2 = 1) AS inside,
           CAST(COUNT(*) AS BIGINT) AS n_points
    FROM c GROUP BY 1
    """,
    doc="Point-in-polygon containment by ray casting — the general-"
    "polygon companion to q_geofence's bounding boxes: for each fix "
    "coordinate, count crossings of the eastward ray against the 5 "
    "pentagon edges; odd = inside. The V polygon edges are INLINED as V "
    "pure-column crossing terms — no join, no shuffle beyond the 2-group "
    "count — because containment against a single literal polygon is a "
    "scalar function of the point. A large polygon SET would switch to "
    "the broadcast edge-dim join (the q_geofence shape) with the same "
    "per-edge term. The half-open (ay > y) <> (by > y) rule plus "
    "non-integer vertex latitudes makes every crossing test tie-free; "
    "the division is the same IEEE double op on both engines.",
)
def q_point_in_polygon(spark: SparkSession, sf: str) -> DataFrame:
    c = _coords(spark, sf)
    lat, lon = F.col("lat1"), F.col("lon1")
    crossings = None
    for i, (ay, ax) in enumerate(_POLY):
        by, bx = _POLY[(i + 1) % len(_POLY)]
        term = F.when(
            ((F.lit(ay) > lat) != (F.lit(by) > lat))
            & (lon < (bx - ax) * (lat - ay) / (by - ay) + ax),
            1,
        ).otherwise(0)
        crossings = term if crossings is None else crossings + term
    return (
        c.select((crossings % 2 == 1).alias("inside"))
        .groupBy("inside")
        .agg(F.count("*").alias("n_points"))
    )


@register(
    "q_sql_udf",
    oracle="""
    SELECT event_id,
           ROUND(value * 1.852, 3) AS speed_kmh,
           CASE WHEN value * 1.852 >= 120 THEN 'fast'
                WHEN value * 1.852 >= 40 THEN 'cruise'
                ELSE 'slow' END AS speed_band
    FROM events WHERE event_type = 'view'
    """,
    doc="Declarative SQL UDFs (Spark 4 `CREATE FUNCTION ... RETURNS ... "
    "RETURN <expr>`, SURVEY §2.6/§2.10): the knots->km/h conversion and "
    "a banding function COMPOSED from it, both defined in SQL DDL and "
    "used from a plain query. Unlike Python UDFs these inline into the "
    "Catalyst plan (project over the scan — no serialization boundary, "
    "full codegen/pushdown), so at 100 TB they cost the same as writing "
    "the expression by hand while staying centrally defined — the "
    "sanctioned way to ship a function library with the engine. Oracle "
    "is the inlined expression, which is exactly what the plan runs.",
)
def q_sql_udf(spark: SparkSession, sf: str) -> DataFrame:
    # Idempotent per session; the second function composes the first —
    # SQL-UDF-in-SQL-UDF inlining is part of the surface under test.
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION gps_knots2kmh(v DOUBLE) "
        "RETURNS DOUBLE RETURN v * 1.852"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION gps_speed_band(v DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN gps_knots2kmh(v) >= 120 THEN 'fast' "
        "WHEN gps_knots2kmh(v) >= 40 THEN 'cruise' ELSE 'slow' END"
    )
    e = table(spark, sf, "events")
    e.createOrReplaceTempView("_sql_udf_events")
    out = spark.sql(
        "SELECT event_id, ROUND(gps_knots2kmh(value), 3) AS speed_kmh, "
        "gps_speed_band(value) AS speed_band "
        "FROM _sql_udf_events WHERE event_type = 'view'"
    )
    spark.catalog.dropTempView("_sql_udf_events")
    return out


@register(
    "q_collation",
    # Deterministic output: the collated GROUP BY's representative key
    # is whichever casing a partition sees first, so the projected key
    # is lower()ed on BOTH sides; counts/sums are casing-invariant.
    oracle="""
    SELECT lower(prio_mixed) AS prio,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM (
      SELECT o_totalprice,
             CASE WHEN o_orderkey % 3 = 0 THEN upper(o_orderpriority)
                  WHEN o_orderkey % 3 = 1 THEN lower(o_orderpriority)
                  ELSE o_orderpriority END AS prio_mixed
      FROM orders
    ) GROUP BY 1
    """,
    doc="Collation-aware comparison semantics (Spark 4 COLLATE, SURVEY "
    "§2.6): a deliberately mixed-case priority column grouped under "
    "UTF8_LCASE — equality, grouping, and joins follow the column's "
    "collation in the ENGINE (one hash per collation key) instead of "
    "wrapping every comparison in lower() (which defeats pushdown and "
    "doubles the CPU on a 100 TB string-heavy scan). Oracle: the "
    "lower() rewrite, provably equivalent for grouping.",
)
def q_collation(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    mixed = o.select(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 3 == 0, F.upper("o_orderpriority"))
        .when(F.col("o_orderkey") % 3 == 1, F.lower("o_orderpriority"))
        .otherwise(F.col("o_orderpriority"))
        .alias("prio_mixed"),
    )
    return (
        mixed.groupBy(F.expr("prio_mixed COLLATE UTF8_LCASE").alias("ck"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .select(F.lower("ck").alias("prio"), "n", "sum_price")
    )


@register(
    "q_interval_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS sla_deadline,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(date_trunc('quarter', o_orderdate) + INTERVAL 3 MONTH
                - INTERVAL 1 DAY AS DATE) AS quarter_end,
           CAST(date_diff('day', o_orderdate,
                          date_trunc('quarter', o_orderdate)
                          + INTERVAL 3 MONTH - INTERVAL 1 DAY) AS INTEGER)
             AS days_to_quarter_end
    FROM orders
    """,
    doc="ANSI INTERVAL arithmetic (SURVEY §2.6): day-time and "
    "year-month interval literals composed with date_trunc — SLA "
    "deadlines, calendar-quarter ends, day distances. All "
    "calendar-aware engine arithmetic (codegen'd, no UDF), identical "
    "semantics on DuckDB's interval algebra.",
)
def q_interval_arith(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    qend = F.expr(
        "date_trunc('quarter', o_orderdate) + INTERVAL 3 MONTH - INTERVAL 1 DAY"
    )
    return o.select(
        "o_orderkey",
        F.expr("o_orderdate + INTERVAL 90 DAY").cast("date").alias("sla_deadline"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
        qend.cast("date").alias("quarter_end"),
        F.datediff(qend.cast("date"), F.col("o_orderdate")).alias(
            "days_to_quarter_end"
        ),
    )


@register(
    "q_try_arith",
    # DuckDB has no try_* family: the oracle computes each case in a
    # wider type and CASEs the overflow / zero-divisor / zero-modulus
    # rows to NULL — the exact value semantics Spark's try_ variants
    # implement on INT under ANSI mode.
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity = 25.0 THEN NULL
                ELSE ROUND(l_extendedprice / (l_quantity - 25.0), 6)
           END AS safe_ratio,
           CASE WHEN (l_partkey % 1100) * CAST(2000000 AS BIGINT)
                     > 2147483647 THEN NULL
                ELSE CAST((l_partkey % 1100) * 2000000 AS INTEGER)
           END AS scaled_part,
           CASE WHEN 2147483000
                     + CAST(l_linenumber AS BIGINT) * 80
                     + CASE WHEN l_orderkey % 500 = 0 THEN 1000 ELSE 0 END
                     > 2147483647 THEN NULL
                ELSE CAST(2147483000 + l_linenumber * 80
                          + CASE WHEN l_orderkey % 500 = 0
                                 THEN 1000 ELSE 0 END AS INTEGER)
           END AS bumped,
           CASE WHEN l_linenumber = 1 THEN NULL
                ELSE l_orderkey % (l_linenumber - 1)
           END AS alt_mod
    FROM lineitem
    """,
    doc="ANSI-mode-safe try_* arithmetic (SURVEY §2.6): the engine runs "
    "with spark.sql.ansi.enabled=true (overflow/div-zero THROW — the "
    "production posture), so lossy hot-path arithmetic over untrusted "
    "values uses the try_ family: try_divide (zero divisor), "
    "try_multiply / try_add (INT overflow), try_mod (zero modulus) — "
    "NULL instead of a 100-TB-job-killing exception, still fully "
    "codegen'd JVM column expressions. SCALE NOTE (measured r8, sf0.1): "
    "the zero-divisor/zero-modulus guards are branch-based and free "
    "(~0.13s/600k rows), but the INT overflow path is Java "
    "throw/catch via Math.addExact — ~14 us PER OVERFLOWING ROW (a "
    "95%-overflow column cost 8s vs 0.13s). try_ is for EXCEPTIONAL "
    "bad rows; a column where overflow is the common case must be "
    "pre-guarded with explicit CASE, so the operands here keep the "
    "overflow rate ~2% by construction. Oracle: widened arithmetic "
    "with explicit CASE guards (DuckDB has no try_ family).",
)
def q_try_arith(spark: SparkSession, sf: str) -> DataFrame:
    # r17: spread the one-core per-row try_* pipeline (see q_math_fns)
    li = spread_scan(table(spark, sf, "lineitem"), "l_orderkey")
    rare_bonus = F.when(F.col("l_orderkey") % 500 == 0, 1000).otherwise(0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 25.0), 6
        ).alias("safe_ratio"),
        F.try_multiply(
            (F.col("l_partkey") % 1100).cast("int"), F.lit(2000000).cast("int")
        ).alias("scaled_part"),
        F.try_add(
            F.lit(2147483000).cast("int"),
            (F.col("l_linenumber") * 80 + rare_bonus).cast("int"),
        ).alias("bumped"),
        F.try_mod(F.col("l_orderkey"), F.col("l_linenumber") - 1).alias("alt_mod"),
    )


@register(
    "q_lateral_alias",
    # DuckDB supports lateral column aliases natively, but the oracle
    # expands them anyway so the equivalence being tested is the
    # ENGINE's analyzer resolution, not DuckDB's.
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 6) AS net,
           ROUND(ROUND(l_extendedprice * (1 - l_discount), 6)
                 * (1 + l_tax), 6) AS gross,
           ROUND(ROUND(ROUND(l_extendedprice * (1 - l_discount), 6)
                       * (1 + l_tax), 6)
                 - ROUND(l_extendedprice * (1 - l_discount), 6), 6) AS tax_amt
    FROM lineitem
    """,
    doc="Lateral column aliases (SURVEY §2.6): a SELECT list where each "
    "computed column references the PREVIOUS alias in the same list "
    "(net -> gross -> tax_amt) — the analyzer inlines the chain, so the "
    "plan stays one codegen'd Project (no self-join, no subquery "
    "nesting), the idiom every hand-written revenue pipeline uses. "
    "Oracle: the aliases expanded manually; rounds pinned at each step "
    "so both engines quantize identically.",
)
def q_lateral_alias(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "round(l_extendedprice * (1 - l_discount), 6) AS net",
        "round(net * (1 + l_tax), 6) AS gross",
        "round(gross - net, 6) AS tax_amt",
    )
