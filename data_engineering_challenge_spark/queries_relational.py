"""Relational operator coverage (SURVEY.md §2.2-§2.6) over the TPC-H-ish
driver testdata: scans with pushdown, star joins (broadcast dims), hash
aggregation, windows (rank / lead-lag / running totals), rollup, semi/anti
joins, sessionization (gaps-and-islands), JSON extraction.

Each query exists because the reference implements — or our engine API
exposes (SURVEY.md §2.4 'Not present ... we expose them') — the operator it
exercises.  Aggregates follow the decimal-exact convention from queries.py.

Scale notes are per-query docstrings; the common themes:
* dimension tables (region/nation/supplier/part/customer) are broadcast —
  verified in the plan (BroadcastHashJoin) — so fact-side data never
  shuffles for enrichment;
* group-bys ride partial aggregation; low-cardinality keys do ~all work
  map-side;
* top-k = rank-within-partition + filter (no global sort), or global
  orderBy().limit(k) which Spark executes as TakeOrderedAndProject (no
  full sort at scale).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _dsum_sql, dsum, register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from .sources.io import read_parquet_cached_schema

    return read_parquet_cached_schema(spark, os.path.join(sf_dir, f"{name}.parquet"))


# --------------------------------------------------------------------------
# scans + filters + group-agg (the reference's §2.5 shapes, TPC-H Q1 form)
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    f"""
SELECT l_returnflag,
       l_linestatus,
       {_dsum_sql('l_quantity')} AS sum_qty,
       {_dsum_sql('l_extendedprice')} AS sum_base_price,
       {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {_dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {_dsum_sql('l_quantity')} / COUNT(*) AS avg_qty,
       {_dsum_sql('l_extendedprice')} / COUNT(*) AS avg_price,
       {_dsum_sql('l_discount')} / COUNT(*) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: filtered scan (predicate pushes to parquet) + 2-key
    hash agg with 8 aggregates.  Partial agg does all heavy lifting
    map-side; output is 6 rows regardless of input scale.

    The five decimal-exact sums are the per-row cost here, so the filtered
    scan is fanned out (io.fan_out_scan) when the file layout under-splits:
    the partial aggregation then runs cluster-wide instead of at the scan's
    task count.  No-op on a well-split table; sums are order-independent by
    the decimal convention, so results are bit-identical either way."""
    from .sources.io import fan_out_scan

    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        fan_out_scan(
            li.filter(
                F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
            )
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            (dsum("l_quantity") / F.count("*")).alias("avg_qty"),
            (dsum("l_extendedprice") / F.count("*")).alias("avg_price"),
            (dsum("l_discount") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# star joins + top-k (global)
# --------------------------------------------------------------------------


@register(
    "q3_top_orders",
    f"""
SELECT o.o_orderkey,
       {_dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       CAST(o.o_orderdate AS DATE) AS orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
""",
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> star join -> agg -> global
    top-k.  customer is broadcast; the top-10 runs as
    TakeOrderedAndProject (per-partition heap + driver merge, no full
    sort).  Deterministic: revenue is decimal-exact and ties break on
    o_orderkey."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        li.join(F.broadcast(o), li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_nation_revenue",
    f"""
SELECT n.n_name,
       {_dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM region r
JOIN nation n   ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
""",
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join with a co-nation residual.  All
    dims broadcast; lineitem (the only big fact) never shuffles until the
    final 5-row agg."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(o), li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(s),
            (s["s_suppkey"] == li["l_suppkey"]) & (s["s_nationkey"] == c["c_nationkey"]),
        )
        .join(F.broadcast(n), n["n_nationkey"] == c["c_nationkey"])
        .join(F.broadcast(r), r["r_regionkey"] == n["n_regionkey"])
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "brand_revenue",
    f"""
SELECT p.p_brand,
       s.s_name,
       {_dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
GROUP BY p.p_brand, s.s_name
""",
)
def brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-two-dims enrichment: both dims broadcast, so the fact scan
    streams through two BroadcastHashJoins inside one codegen stage."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .groupBy("p_brand", "s_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# semi / anti joins (engine API surface; SURVEY.md §2.4 'Not present')
# --------------------------------------------------------------------------


@register(
    "semi_join_big_orders",
    """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49
)
""",
)
def semi_join_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (the reference's isin-chunk selection at
    api_client.py:187, distributed form)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_semi").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@register(
    "anti_join_quiet_customers",
    """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
)
""",
)
def anti_join_quiet_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders since 2000."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")
    )
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# --------------------------------------------------------------------------
# windows: rank-per-group top-k, lead/lag running totals
# --------------------------------------------------------------------------


@register(
    "top3_customers_per_nation",
    f"""
WITH cust_rev AS (
    SELECT c.c_nationkey, c.c_custkey, c.c_name,
           {_dsum_sql('o.o_totalprice')} AS revenue
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_nationkey, c.c_custkey, c.c_name
), ranked AS (
    SELECT n.n_name, cr.c_custkey, cr.c_name, cr.revenue,
           ROW_NUMBER() OVER (
               PARTITION BY n.n_name ORDER BY cr.revenue DESC, cr.c_custkey ASC
           ) AS rank_in_nation
    FROM cust_rev cr JOIN nation n ON n.n_nationkey = cr.c_nationkey
)
SELECT n_name, c_custkey, c_name, revenue, rank_in_nation
FROM ranked WHERE rank_in_nation <= 3
""",
)
def top3_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: rank within partition + filter — no global sort,
    shuffles once on the partition key (SURVEY.md §2.6 ranking row)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    cust_rev = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_nationkey", "c_custkey", "c_name")
        .agg(dsum("o_totalprice").alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return (
        cust_rev.join(F.broadcast(n), cust_rev["c_nationkey"] == n["n_nationkey"])
        .select("n_name", "c_custkey", "c_name", "revenue")
        .withColumn("rank_in_nation", F.row_number().over(w))
        .filter(F.col("rank_in_nation") <= 3)
    )


@register(
    "daily_type_running_total",
    f"""
WITH daily AS (
    SELECT event_type,
           CAST(ts AS DATE) AS day,
           {_dsum_sql('value')} AS daily_value,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY event_type, CAST(ts AS DATE)
)
SELECT event_type, day, daily_value, n_events,
       CAST(CAST(SUM(CAST(daily_value AS DECIMAL(28,10))) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS VARCHAR) AS DOUBLE) AS running_value,
       CAST(COALESCE(LAG(daily_value) OVER (
           PARTITION BY event_type ORDER BY day), 0.0) AS DOUBLE) AS prev_day_value
FROM daily
""",
)
def daily_type_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-window coverage: running total (cumulative frame) + lag —
    the rolling-metric shapes SURVEY.md §2.6 lists as engine surface."""
    from . import roles

    events = roles.load_events(spark, sf_dir)
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(dsum("value").alias("daily_value"), F.count("*").alias("n_events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wl = Window.partitionBy("event_type").orderBy("day")
    return daily.select(
        "event_type",
        "day",
        "daily_value",
        "n_events",
        F.sum(F.col("daily_value").cast("decimal(28,10)"))
        .over(w)
        .cast("double")
        .alias("running_value"),
        F.coalesce(F.lag("daily_value").over(wl), F.lit(0.0))
        .cast("double")
        .alias("prev_day_value"),
    )


# --------------------------------------------------------------------------
# rollup / grouping sets
# --------------------------------------------------------------------------


@register(
    "events_rollup",
    f"""
SELECT event_type,
       CAST(ts AS DATE) AS day,
       {_dsum_sql('value')} AS total_value,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY ROLLUP (event_type, CAST(ts AS DATE))
""",
)
def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (SURVEY.md §2.5 'Built-in if ever needed'): subtotal rows per
    event_type and a grand total, one pass."""
    from . import roles

    events = roles.load_events(spark, sf_dir)
    return events.rollup("event_type", F.to_date("ts").alias("day")).agg(
        dsum("value").alias("total_value"), F.count("*").alias("n_events")
    )


# --------------------------------------------------------------------------
# sessionization (gaps-and-islands) + JSON extraction
# --------------------------------------------------------------------------


@register(
    "sessionize_events",
    """
WITH flagged AS (
    SELECT user_id, ts, event_id,
           CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                  OR LAG(ts) OVER w IS NULL
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
    -- same (ts, event_id) total order as the lag window: rows tied on ts
    -- would otherwise get engine/shuffle-dependent session assignment
    SELECT user_id, ts,
           SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS session_no
    FROM flagged
)
SELECT user_id,
       CAST(session_no AS BIGINT) AS session_no,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(epoch_us(ts)) AS BIGINT) AS start_us,
       CAST(MAX(epoch_us(ts)) AS BIGINT) AS end_us
FROM numbered
GROUP BY user_id, session_no
""",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization as gaps-and-islands: 30-min inactivity gap starts a
    new session (lag + cumulative sum — one shuffle on user_id).  The
    streaming twin uses F.session_window (streaming/incremental.py)."""
    from . import roles

    events = roles.load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # cumulative window shares the lag window's (ts, event_id) total order so
    # boundary rows tied on ts get deterministic session assignment
    wc = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap_us = 30 * 60 * 1_000_000
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w) > gap_us)
            | F.lag("ts").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    numbered = flagged.select(
        "user_id", "ts", F.sum("is_new").over(wc).alias("session_no")
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.min(F.unix_micros("ts")).alias("start_us"),
        F.max(F.unix_micros("ts")).alias("end_us"),
    )


@register(
    "events_json_props",
    f"""
SELECT event_type,
       {_dsum_sql("CAST(json_extract_string(props, '$.k') AS BIGINT)")} AS total_k,
       {_dsum_sql("CAST(json_extract_string(props, '$.k') AS BIGINT)")} / COUNT(*) AS avg_k,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY event_type
""",
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column handling (SURVEY.md §2.3): get_json_object on the
    events.props payload + aggregation.  At scale, prefer from_json with an
    explicit schema once the payload shape is known — get_json_object
    re-parses per extraction."""
    from . import roles

    events = roles.load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return events.groupBy("event_type").agg(
        dsum(k).alias("total_k"),
        (dsum(k) / F.count("*")).alias("avg_k"),
        F.count("*").alias("n_events"),
    )


@register(
    "distinct_users_per_type",
    """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY event_type
""",
)
def distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count-distinct (reference cj_builder.py:132 nunique).  At
    100 TB prefer approx_count_distinct (HLL) — exact distinct is a full
    shuffle of the distinct pairs; kept exact here for oracle parity."""
    from . import roles

    events = roles.load_events(spark, sf_dir)
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


# --------------------------------------------------------------------------
# cube / percentiles / set operations (SURVEY.md §2.5/§2.6 'built-in' rows)
# --------------------------------------------------------------------------


@register(
    "events_cube",
    f"""
SELECT event_type,
       CAST(ts AS DATE) AS day,
       {_dsum_sql('value')} AS total_value,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY CUBE (event_type, CAST(ts AS DATE))
""",
)
def events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations in one pass."""
    from . import roles

    events = roles.load_events(spark, sf_dir)
    return events.cube("event_type", F.to_date("ts").alias("day")).agg(
        dsum("value").alias("total_value"), F.count("*").alias("n_events")
    )


@register(
    "quantity_percentiles",
    """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS p50_qty,
       quantile_cont(l_quantity, 0.9) AS p90_qty,
       CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
       CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def quantity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median / p90).  Exact percentile is a
    per-group sort — at 100 TB switch to approx_percentile (t-digest sketch,
    mergeable, single pass); kept exact here for oracle parity."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("p50_qty"),
        F.percentile("l_quantity", F.lit(0.9)).alias("p90_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@register(
    "except_customers",
    """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT o_custkey AS c_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
""",
)
def except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference): BUILDING customers minus recently-active
    ones (SURVEY.md §2.6 'intersect/except' surface)."""
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")
    ).select(F.col("o_custkey").alias("c_custkey"))
    return c.exceptAll(o).distinct()


@register(
    "intersect_active_customers",
    """
SELECT o_custkey FROM orders
WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
INTERSECT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
""",
)
def intersect_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers active in both the first and last order years."""
    o = _t(spark, sf_dir, "orders")
    early = o.filter(
        F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    ).select("o_custkey")
    late = o.filter(
        F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp_ntz")
    ).select("o_custkey")
    return early.intersect(late)


@register(
    "sliding_window_counts",
    f"""
WITH expanded AS (
    SELECT e.*, date_trunc('day', ts) - INTERVAL (d) DAY AS win_start
    FROM events e, UNNEST([0, 1]) AS u(d)
)
SELECT CAST(win_start AS DATE) AS window_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {_dsum_sql('value')} AS total_value
FROM expanded
GROUP BY win_start, event_type
""",
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows in batch (2-day window, 1-day slide): each event
    lands in two windows — F.window handles the expansion; the oracle
    unnests the two window starts explicitly.  The streaming twin is
    streaming/incremental.daily_counts with a window slide."""
    from . import roles

    events = roles.load_events(spark, sf_dir)
    return (
        events.groupBy(
            F.window("ts", "2 days", "1 day").alias("w"), F.col("event_type")
        )
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").cast("date").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# more TPC-H shapes: EXISTS-count, conditional ratio, HAVING, distinct-agg
# --------------------------------------------------------------------------


@register(
    "q4_priority_count",
    """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
""",
)
def q4_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS (left-semi with a cross-table residual) +
    count per priority."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o["o_orderkey"] == li["l_orderkey"])
            & (li["l_shipdate"] > o["o_orderdate"]),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q14_promo_share",
    f"""
SELECT {_dsum_sql("CASE WHEN p.p_type LIKE 'STANDARD%' "
                  "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END")}
       / {_dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS promo_share,
       {_dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS total_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-02-01 00:00:00'
""",
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio (CASE inside SUM) over
    a broadcast dim join."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-02-01 00:00:00").cast("timestamp_ntz"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("STANDARD"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            (dsum(promo) / dsum(rev)).alias("promo_share"),
            dsum(rev).alias("total_revenue"),
        )
    )


@register(
    "q18_large_orders",
    f"""
SELECT o.o_orderkey,
       o.o_custkey,
       {_dsum_sql('l.l_quantity')} AS total_qty
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey, o.o_custkey
HAVING SUM(l.l_quantity) > 150
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: group + HAVING on the aggregate (post-aggregation
    filter — Catalyst runs it after partial+final agg, never on raw rows)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(o), li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderkey", "o_custkey")
        .agg(
            dsum("l_quantity").alias("total_qty"),
            F.sum("l_quantity").alias("_raw_sum"),
        )
        .filter(F.col("_raw_sum") > 150)
        .drop("_raw_sum")
    )


@register(
    "supplier_part_distinct_aggs",
    f"""
SELECT s.s_nationkey,
       CAST(COUNT(DISTINCT l.l_partkey) AS BIGINT) AS n_parts,
       CAST(COUNT(DISTINCT l.l_orderkey) AS BIGINT) AS n_orders,
       {_dsum_sql('l.l_quantity')} AS total_qty
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_nationkey
""",
)
def supplier_part_distinct_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple distinct aggregates alongside a plain sum — Catalyst expands
    to the Expand-based multi-distinct plan (one extra shuffle per distinct
    set, fused into one pass over the input)."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_nationkey")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            dsum("l_quantity").alias("total_qty"),
        )
    )


@register(
    "customer_revenue_quartiles",
    f"""
WITH cust_rev AS (
    SELECT o_custkey, {_dsum_sql('o_totalprice')} AS revenue
    FROM orders GROUP BY o_custkey
)
SELECT o_custkey, revenue,
       CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
       PERCENT_RANK() OVER w AS pct_rank
FROM cust_rev
WINDOW w AS (ORDER BY revenue DESC, o_custkey ASC)
""",
)
def customer_revenue_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile + percent_rank (SURVEY.md §2.6 ranking surface).  A global
    window — fine for customer-cardinality outputs; partition it by a
    region key when the entity count itself is huge."""
    o = _t(spark, sf_dir, "orders")
    cust_rev = o.groupBy("o_custkey").agg(dsum("o_totalprice").alias("revenue"))
    w = Window.orderBy(F.desc("revenue"), F.asc("o_custkey"))
    return cust_rev.select(
        "o_custkey",
        "revenue",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
    )


@register(
    "channel_7day_rolling",
    f"""
WITH daily AS (
    SELECT event_type,
           CAST(ts AS DATE) AS day,
           {_dsum_sql('value')} AS daily_value
    FROM events GROUP BY event_type, CAST(ts AS DATE)
)
SELECT event_type, day, daily_value,
       CAST(CAST(SUM(CAST(daily_value AS DECIMAL(28,10))) OVER (
           PARTITION BY event_type ORDER BY datediff('day', DATE '1970-01-01', day)
           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
       ) AS VARCHAR) AS DOUBLE) AS rolling_7d,
       CAST(COUNT(*) OVER (
           PARTITION BY event_type ORDER BY datediff('day', DATE '1970-01-01', day)
           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS days_in_window
FROM daily
""",
)
def channel_7day_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling metrics via a RANGE frame on the day number — a true
    value-range frame (handles gaps in the date series), not a row frame
    (SURVEY.md §2.6 'frame specs')."""
    from . import roles

    events = roles.load_events(spark, sf_dir)
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(dsum("value").alias("daily_value"))
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_date("day"))
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "event_type",
        "day",
        "daily_value",
        F.sum(F.col("daily_value").cast("decimal(28,10)"))
        .over(w)
        .cast("double")
        .alias("rolling_7d"),
        F.count("*").over(w).alias("days_in_window"),
    )


# --------------------------------------------------------------------------
# multi-dim star joins, correlated-subquery shapes, disjunctive pushdown,
# scalar-subquery + anti join, pivot (TPC-H Q7/Q10/Q17/Q19/Q22 forms)
# --------------------------------------------------------------------------


@register(
    "q7_nation_volume",
    f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
       {_dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE n1.n_nationkey <> n2.n_nationkey
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n1.n_name, n2.n_name, CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER)
""",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: fact ⋈ two fact-sized keys (orders on l_orderkey is
    a genuine shuffle join — orders is NOT broadcast: it scales with the
    fact table) + three broadcast dims, cross-nation filter, year rollup.
    The only shuffles are the orders join and the final agg."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("n1_key") != F.col("n2_key"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
    )


@register(
    "q10_returned_items",
    f"""
SELECT c.c_custkey,
       c.c_name,
       {_dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       c.c_acctbal,
       n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue last quarter.  Fact
    filters push to the scans; the lineitem⋈orders join shuffles on
    orderkey; customer+nation broadcast; top-20 runs as
    TakeOrderedAndProject.  Ties broken on c_custkey (revenue is
    decimal-exact, so the order is deterministic cross-engine)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q17_small_qty_revenue",
    f"""
WITH part_avg AS (
    SELECT l_partkey,
           {_dsum_sql('l_quantity')} / COUNT(*) AS avg_qty
    FROM lineitem GROUP BY l_partkey
)
SELECT {_dsum_sql('l.l_extendedprice')} / 7.0 AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_small
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN part_avg pa ON pa.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND l.l_quantity < 0.2 * pa.avg_qty
""",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part avg quantity)
    decorrelated into an aggregate + equi-join — the rewrite Catalyst
    applies to correlated subqueries, written directly.  The per-part avg
    is computed once over lineitem (one shuffle), then joined back; the
    avg is decimal-exact-sum / count so the 0.2×avg threshold compares
    bit-identically cross-engine."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    part_avg = li.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        (dsum("l_quantity") / F.count("*")).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(part_avg, li["l_partkey"] == F.col("pa_key"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (dsum("l_extendedprice") / 7.0).alias("avg_yearly"),
            F.count("*").alias("n_small"),
        )
    )


@register(
    "q19_disjunctive_preds",
    f"""
SELECT {_dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def q19_disjunctive_preds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive (OR-of-ANDs) mixed-table predicates.
    Catalyst factors the single-table conjuncts out of the OR and pushes
    them below the join (l_quantity 1-30 to lineitem, brand/size union to
    part), so the join sees pre-filtered inputs — check the plan's
    PushedFilters."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    qty = F.col("l_quantity")
    case = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & qty.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & qty.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & qty.between(20, 30)
        )
    )
    return joined.filter(case).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count("*").alias("n_items"),
    )


@register(
    "q22_idle_customers",
    f"""
WITH avg_bal AS (
    SELECT {_dsum_sql('c_acctbal')} / COUNT(*) AS cutoff
    FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       {_dsum_sql('c.c_acctbal')} AS totacctbal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.cutoff
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c.c_nationkey
""",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global positive-balance average)
    + anti join (customers with no RECENT orders — the lapsed-customer
    report) + group-agg.  The scalar is a
    1-row broadcast crossJoin — never a collect to the driver; the anti
    join shuffles on custkey only (AQE may convert to broadcast-anti when
    the order-key side is small)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")
    )
    cutoff = c.filter(F.col("c_acctbal") > 0.0).agg(
        (dsum("c_acctbal") / F.count("*")).alias("cutoff")
    )
    return (
        c.crossJoin(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("cutoff"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("numcust"), dsum("c_acctbal").alias("totacctbal"))
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _pivot_col_sql(t: str) -> str:
    cond = "CASE WHEN event_type = '" + t + "' THEN value END"
    return f"       COALESCE({_dsum_sql(cond)}, 0.0) AS {t}"


@register(
    "events_pivot",
    "SELECT CAST(ts AS DATE) AS day,\n"
    + ",\n".join(_pivot_col_sql(t) for t in _EVENT_TYPES)
    + "\nFROM events GROUP BY CAST(ts AS DATE)",
)
def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: one column per event_type holding that day's value sum.  The
    pivot value list is EXPLICIT — with it, Spark pivots in a single pass
    (no extra distinct-values job) and the output schema is stable, both
    required for production pipelines.  Missing (day,type) combos → 0."""
    from . import roles

    ev = roles.load_events(spark, sf_dir)
    piv = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(dsum("value"))
    )
    return piv.na.fill(0.0, subset=_EVENT_TYPES)


# --------------------------------------------------------------------------
# time-range join (bucketed) + nearest-match as-of join (SURVEY.md §2.4's
# "not present in the reference, exposed by the engine" join family)
# --------------------------------------------------------------------------

_RANGE_W_US = 300_000_000  # ±5 minutes, in microseconds


@register(
    "range_join_error_context",
    f"""
SELECT e.event_id,
       CAST(COUNT(c.event_id) AS BIGINT) AS n_clicks,
       COALESCE({_dsum_sql('c.value')}, 0.0) AS click_value
FROM events e
LEFT JOIN events c
  ON c.event_type = 'click'
 AND ABS(epoch_us(c.ts) - epoch_us(e.ts)) <= {_RANGE_W_US}
WHERE e.event_type = 'error'
GROUP BY e.event_id
""",
)
def q_range_join_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join, bucketized: clicks within ±5 min of each error.

    A naive theta join is O(|errors|·|clicks|) — a cross join at scale.
    The scale-correct plan: assign each click to ONE time bucket of width
    = the window, probe 2-3 adjacent buckets from the error side
    (sequence+explode), equi-join on the bucket, then apply the exact
    range residual.  Each (error, click) pair meets on exactly one bucket
    (the click's own), so no dedup pass is needed.  Cost becomes
    proportional to true temporal co-location, and the join shuffles on a
    well-distributed integer key."""
    from . import roles

    w = F.lit(_RANGE_W_US)
    ev = roles.load_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("c_us"),
        "value",
    ).withColumn("bucket", F.expr(f"c_us div {_RANGE_W_US}"))
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", F.unix_micros("ts").alias("e_us")
    ).withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.expr(f"(e_us - {_RANGE_W_US}) div {_RANGE_W_US}"),
                F.expr(f"(e_us + {_RANGE_W_US}) div {_RANGE_W_US}"),
            )
        ),
    )
    pairs = errors.join(
        clicks,
        (errors["bucket"] == clicks["bucket"])
        & (F.abs(F.col("c_us") - F.col("e_us")) <= w),
        "left",
    )
    return pairs.groupBy("event_id").agg(
        F.count("click_id").alias("n_clicks"),
        F.coalesce(dsum("value"), F.lit(0.0)).alias("click_value"),
    )


def _asof_oracle() -> str:
    from .queries import _SQL_PRELUDE

    return _SQL_PRELUDE + """
SELECT conversion_id, session_id, ts_us, gap_us
FROM (
    SELECT conversion_id,
           session_id,
           CAST(epoch_us(ts) AS BIGINT) AS ts_us,
           CAST(epoch_us(conv_ts) - epoch_us(ts) AS BIGINT) AS gap_us,
           ROW_NUMBER() OVER (PARTITION BY conversion_id
                              ORDER BY ts DESC, session_id DESC) AS rn
    FROM journeys
)
WHERE rn = 1
"""


@register("asof_nearest_session", _asof_oracle())
def q_asof_nearest_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-match as-of join: the single latest session at-or-before
    each conversion (contrast with journeys_build, which keeps ALL prior
    sessions — SURVEY.md §2.4 'do NOT use a last-row as-of' for journeys;
    this query IS the last-row variant, exposed as its own operator).
    Implementation: prefix join + rank-1 window — the decomposition Spark
    executes as shuffle-on-user + per-conversion top-1 (no global sort).
    Ties on ts break on session_id (deterministic cross-engine)."""
    from .queries import _journeys

    j = _journeys(spark, sf_dir)
    w = Window.partitionBy("conversion_id").orderBy(
        F.desc("timestamp"), F.desc("session_id")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "conversion_id",
            "session_id",
            F.unix_micros("timestamp").alias("ts_us"),
            (F.unix_micros("conv_ts") - F.unix_micros("timestamp")).alias("gap_us"),
        )
    )


@register(
    "events_grouping_sets",
    f"""
SELECT event_type,
       CAST(ts AS DATE) AS day,
       {_dsum_sql('value')} AS total_value,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(GROUPING(event_type) AS INTEGER) AS g_type,
       CAST(GROUPING(CAST(ts AS DATE)) AS INTEGER) AS g_day
FROM events
GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)), (event_type, CAST(ts AS DATE)))
""",
)
def q_events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the general form under rollup/cube: three explicit
    aggregation granularities in ONE pass over the input (Catalyst plans an
    Expand + single hash-agg, not three scans).  GROUPING() flags
    disambiguate 'NULL key' from 'aggregated-away key' in the output."""
    from . import roles

    ev = roles.load_events(spark, sf_dir)
    ev.createOrReplaceTempView("_gs_events")
    return spark.sql(f"""
        SELECT event_type,
               CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total_value,
               COUNT(*) AS n_events,
               CAST(GROUPING(event_type) AS INT) AS g_type,
               CAST(GROUPING(CAST(ts AS DATE)) AS INT) AS g_day
        FROM _gs_events
        GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)),
                                (event_type, CAST(ts AS DATE)))
    """)


# --------------------------------------------------------------------------
# round-2 widening: the remaining TPC-H shapes expressible on the reduced
# schema (no partsupp / commit / receipt columns in the testdata)
# --------------------------------------------------------------------------


@register(
    "q6_forecast_revenue",
    f"""
SELECT {_dsum_sql('l_extendedprice * l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 25
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filtered global aggregate — every predicate
    pushes to the parquet scan (row-group pruning on l_shipdate at scale),
    zero joins, one partial+final agg.  The cheapest possible query plan;
    exists to pin that the engine keeps it that way."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 25)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "q8_market_share",
    f"""
WITH volumes AS (
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           l.l_extendedprice * (1 - l.l_discount) AS volume,
           n2.n_name AS supp_nation
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
    JOIN region r ON n1.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE r.r_name = 'AMERICA'
      AND p.p_type = 'PROMO'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
)
SELECT o_year,
       {_dsum_sql("CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END")}
           / {_dsum_sql('volume')} AS mkt_share
FROM volumes
GROUP BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: the same dimension table joined in TWO roles
    (customer's nation filters the region, supplier's nation defines the
    share numerator) — 7 joins total, all broadcast except the
    lineitem⋈orders spine; conditional-aggregate ratio per year."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    n1 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    vol = (
        li.join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
            ),
            li["l_orderkey"] == o["o_orderkey"],
        )
        .join(F.broadcast(c), F.col("o_custkey") == c["c_custkey"])
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "AMERICA")),
            F.col("c_rkey") == F.col("r_regionkey"),
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .join(
            F.broadcast(p.filter(F.col("p_type") == "PROMO")),
            F.col("l_partkey") == p["p_partkey"],
        )
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    national = F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(
        F.lit(0.0)
    )
    return vol.groupBy("o_year").agg(
        (dsum(national) / dsum("volume")).alias("mkt_share")
    )


@register(
    "q13_order_count_distribution",
    """
WITH per_cust AS (
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust
GROUP BY c_count
""",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left outer join with a join-side predicate (the
    predicate must NOT drop customers — it drops matches), double
    aggregation: orders-per-customer, then the histogram of those counts.
    COUNT(col) vs COUNT(*) null semantics are load-bearing: customers with
    only urgent orders count as 0, not 1."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(c["c_custkey"])
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q15_top_supplier",
    f"""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM revenue r
JOIN supplier s ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate-then-argmax — the classic 'view + scalar
    subquery on the same view'.  Spark form: the scalar MAX is a broadcast
    1-row aggregate crossJoined back onto the per-supplier revenue (no
    second scan of lineitem, and — unlike an unpartitioned window — no
    single-partition Exchange funneling every supplier through one task at
    scale); ties all surface, matching the SQL subquery semantics."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("_max"))
    top = (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_max"))
        .drop("_max")
    )
    return top.join(F.broadcast(s), F.col("supplier_no") == s["s_suppkey"]).select(
        "s_suppkey", "s_name", "total_revenue"
    )


_PROFILE_COLS = [
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority",
]


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_COLS:
        parts.append(f"""
SELECT '{c}' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_str,
       CAST(MAX({c}) AS VARCHAR) AS max_str
FROM orders""")
    return "\nUNION ALL\n".join(parts)


@register("profile_orders_columns", _profile_oracle())
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the data-quality sweep every ingest runs): per
    column — null count, exact distinct count, min/max — in ONE pass over
    the table (multi-distinct aggregate + stack unpivot to long format).
    min/max computed in the native type, then stringified, so numeric and
    timestamp columns order correctly.  At 100 TB swap exact distincts for
    approx_count_distinct; the plan shape (single scan, Expand for the
    distinct aggregates, generator unpivot) is the same."""
    o = _t(spark, sf_dir, "orders")
    aggs = [F.count("*").alias("_n")]
    for c in _PROFILE_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(c).cast("string").alias(f"mn_{c}"),
            F.max(c).cast("string").alias(f"mx_{c}"),
        ]
    m = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in _PROFILE_COLS
    )
    return m.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) "
            "AS (col_name, n_nulls, n_distinct, min_str, max_str)"
        ),
        F.col("_n").alias("n_rows"),
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str")


@register(
    "events_json_schema_parse",
    f"""
SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {_dsum_sql('value')} AS total_value
FROM events
WHERE json_extract(props, '$.k') IS NOT NULL
GROUP BY CAST(json_extract(props, '$.k') AS BIGINT) % 10
""",
)
def events_json_schema_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema'd JSON parsing with from_json (SURVEY.md §2.3): unlike
    get_json_object (re-parses per extraction), from_json parses ONCE into
    a typed struct — the scale-preferred path when the payload shape is
    known.  Groups by a derived bucket of the extracted field."""
    from pyspark.sql.types import LongType, StructField, StructType

    from . import roles

    events = roles.load_events(spark, sf_dir)
    schema = StructType([StructField("k", LongType())])
    parsed = events.withColumn("p", F.from_json("props", schema))
    return (
        parsed.filter(F.col("p.k").isNotNull())
        .groupBy((F.col("p.k") % 10).alias("k_bucket"))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
    )


@register(
    "price_histogram",
    f"""
-- DuckDB has no width_bucket; this arithmetic IS its SQL-standard
-- definition for equi-width buckets: 0 below min, n+1 at/above max
SELECT CAST(CASE WHEN l_extendedprice < 0 THEN 0
                 WHEN l_extendedprice >= 120000 THEN 13
                 ELSE FLOOR(l_extendedprice / 10000) + 1 END AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       {_dsum_sql('l_extendedprice')} AS total_price
FROM lineitem
GROUP BY 1
""",
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric histogram via width_bucket — equi-width value distribution
    in one agg pass (the profiling companion to profile_orders_columns).
    Both engines implement SQL-standard width_bucket with identical
    boundary semantics."""
    li = _t(spark, sf_dir, "lineitem")
    b = F.width_bucket(F.col("l_extendedprice"), F.lit(0), F.lit(120000), F.lit(12))
    return li.groupBy(b.cast("bigint").alias("bucket")).agg(
        F.count("*").alias("n_items"), dsum("l_extendedprice").alias("total_price")
    )


@register(
    "event_gap_stats",
    f"""
WITH gaps AS (
    SELECT event_type,
           epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
               - epoch_us(ts) AS gap_us
    FROM events
)
SELECT event_type,
       CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
       {_dsum_sql('gap_us')} / COUNT(gap_us) AS avg_gap_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
FROM gaps
GROUP BY event_type
""",
)
def event_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event time deltas via LEAD (SURVEY.md §2.6 lead/lag): per
    user, microseconds to the NEXT event (deterministic (ts, event_id)
    order), aggregated per event type.  COUNT(gap_us) vs COUNT(*) is
    load-bearing: each user's last event has no successor and must not
    dilute the mean."""
    from . import roles

    events = roles.load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = events.select(
        "event_type",
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias("gap_us"),
    )
    return gaps.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        (dsum("gap_us") / F.count("gap_us")).alias("avg_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
    )


# --------------------------------------------------------------------------
# grouped argmin with join-back (TPC-H Q2's min-cost-supplier shape, adapted
# to the available star: no partsupp table ships, so unit cost derives from
# lineitem) and NOT-IN + distinct-count (Q16's supplier-count shape)
# --------------------------------------------------------------------------


@register(
    "part_min_cost_supplier",
    f"""
WITH cost AS (
    SELECT l_partkey, l_suppkey,
           {_dsum_sql('l_extendedprice / l_quantity')} AS unit_cost
    FROM lineitem
    GROUP BY l_partkey, l_suppkey
), best AS (
    SELECT l_partkey, MIN(unit_cost) AS min_cost
    FROM cost GROUP BY l_partkey
)
SELECT c.l_partkey AS partkey, c.l_suppkey AS suppkey, c.unit_cost
FROM cost c
JOIN best b ON c.l_partkey = b.l_partkey AND c.unit_cost = b.min_cost
""",
)
def part_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-group argmin with join-back — for every part,
    the supplier(s) with the lowest mean unit price (ties all kept, the
    correlated-scalar-subquery semantics).

    Scale design: ONE scan, ONE shuffle.  The explicit
    ``repartition("l_partkey")`` hash-clusters by the OUTER key before the
    composite-key aggregate — hashpartitioning(l_partkey) satisfies both
    the (l_partkey, l_suppkey) aggregate's clustering and the per-part MIN
    window's, so the aggregate and the argmin run Exchange-free on that
    single partitioning.  The alternative aggregate-and-join-back form
    recomputes the whole (part, supplier) aggregate for the MIN branch
    (two lineitem scans — measured in the plan); this is a PER-GROUP
    window, so unlike q15's global argmax there is no single-partition
    funnel.  Decimal-exact unit costs make the MIN/equality tie
    engine-stable."""
    li = _t(spark, sf_dir, "lineitem")
    cost = li.repartition("l_partkey").groupBy("l_partkey", "l_suppkey").agg(
        dsum(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    w = Window.partitionBy("l_partkey")
    return (
        cost.withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
            "unit_cost",
        )
    )


@register(
    "supplier_count_excl",
    """
WITH pairs AS (
    SELECT DISTINCT l_partkey, l_suppkey
    FROM lineitem
    WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
)
SELECT p.p_brand,
       CAST(p.p_size % 5 AS INTEGER) AS size_bucket,
       CAST(COUNT(DISTINCT pr.l_suppkey) AS BIGINT) AS supplier_cnt
FROM pairs pr
JOIN part p ON pr.l_partkey = p.p_partkey
WHERE p.p_type NOT LIKE 'PROMO%'
GROUP BY p.p_brand, size_bucket
""",
)
def supplier_count_excl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per product segment with a
    NOT IN exclusion list (negative-balance suppliers standing in for the
    complaints subquery; the shipped (part, supplier) pairs stand in for
    the absent partsupp table).

    Spark form: the NOT IN is a broadcast left_anti join (never a
    per-row subquery), the pair relation is deduped BEFORE the dimension
    join, and part is broadcast — the fact table shuffles once, for the
    distinct-aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part").filter(~F.col("p_type").like("PROMO%"))
    excluded = sup.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    pairs = (
        li.join(
            F.broadcast(excluded),
            li["l_suppkey"] == excluded["s_suppkey"],
            "left_anti",
        )
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    return (
        pairs.join(F.broadcast(part), pairs["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", (F.col("p_size") % 5).cast("int").alias("size_bucket"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q12_priority_shipping",
    """
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
GROUP BY l.l_linestatus
""",
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact equi-join followed by CASE-conditional
    counts per group — the 'pivot a predicate into two columns' pattern.
    The shipdate range is pushed into the lineitem scan before the join
    (join input shrinks at the source, not after the shuffle)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "channel_spine_fill",
    f"""
WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS day, value FROM events),
daily AS (
    SELECT event_type, day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {_dsum_sql('value')} AS total_value
    FROM ev GROUP BY event_type, day
), bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
spine AS (
    SELECT d0 + CAST(i AS INTEGER) AS day
    FROM bounds, UNNEST(range(0, CAST(d1 - d0 AS INTEGER) + 1)) AS u(i)
), types AS (SELECT DISTINCT event_type FROM ev)
SELECT t.event_type,
       strftime(s.day, '%Y-%m-%d') AS day,
       COALESCE(d.n_events, 0) AS n_events,
       COALESCE(d.total_value, 0.0) AS total_value
FROM types t CROSS JOIN spine s
LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = s.day
""",
)
def channel_spine_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample / gap fill: daily per-type activity with EVERY
    calendar day in the table's range present, zeros where nothing
    happened — the date-spine left join that reporting and forecasting
    stages need (a groupBy alone silently drops empty days).

    Scale design: the spine is generated from a 1-row min/max aggregate
    (``sequence`` + explode — rows = days, never data-sized) and
    crossJoined with the distinct type dimension — both broadcast-small —
    so the only data-sized operation is the daily aggregate itself."""
    from . import roles

    events = roles.load_events(spark, sf_dir)
    ev = events.select(
        "event_type", F.to_date("ts").alias("day"), "value"
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count("*").alias("n_events"), dsum("value").alias("total_value")
    )
    bounds = ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    types = ev.select("event_type").distinct()
    return (
        types.crossJoin(F.broadcast(spine))
        .join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        )
    )


@register(
    "locf_fill_events",
    """
WITH ev AS (
    SELECT user_id, event_id,
           CAST(epoch_us(ts) AS BIGINT) AS ts_us,
           CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
    FROM events
)
SELECT user_id, event_id, ts_us, v,
       last_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS v_filled
FROM ev
""",
)
def locf_fill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward gap fill (the time-series repair
    step): per user, a NULL reading takes the most recent non-null value
    before it — ``last(..., ignorenulls=True)`` over an ordered running
    frame.  Readings before the first observation stay NULL (no lookahead,
    no leakage).  NULLs are synthesized deterministically (event_id % 3)
    so the oracle sees the identical input.

    One hash shuffle on user_id; the running frame is streaming-friendly
    (each partition is processed in ts order, O(1) state per row)."""
    from . import roles

    events = roles.load_events(spark, sf_dir)
    ev = events.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.when(F.col("event_id") % 3 == 0, None).otherwise(F.col("value")).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id", "event_id", "ts_us", "v",
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
    )


@register("distinct_users_hll_rollup", None)  # sketch estimate — rows-only check
def distinct_users_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct counting (DataSketches HLL): per-type user
    sketches, then a grand total by UNIONING the sketches — never
    re-scanning the data.  THE 100 TB pattern for distinct counts across
    rollup levels: exact countDistinct re-shuffles raw keys per level,
    while sketches aggregate once and merge in O(sketch) per level (and
    can be persisted for incremental refresh).

    No SQL oracle — the estimate is implementation-specific; tests bound
    it against exact counts (<2% at lgK=12) and assert union-vs-direct
    sketch agreement."""
    from . import roles

    events = roles.load_events(spark, sf_dir)
    sk = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    per_type = sk.select(
        "event_type", F.hll_sketch_estimate("sk").alias("est_users")
    )
    total = sk.agg(F.hll_union_agg("sk").alias("u")).select(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate("u").alias("est_users"),
    )
    return per_type.unionByName(total)


@register("theta_user_overlap", None)  # sketch estimate — rows-only check
def theta_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch SET OPERATIONS on distinct users (DataSketches Theta):
    how many distinct users clicked AND purchased / clicked OR purchased /
    clicked but never purchased — intersection, union and difference
    computed on two per-type sketches, not by re-joining raw events.

    At 100 TB this replaces three separate semi-join + countDistinct
    pipelines with one sketch aggregation per type and O(sketch) set
    algebra — and the sketches are persistable, so audience-overlap
    questions become metadata lookups.  No SQL oracle (estimates are
    implementation-specific); tests bound all three against exact
    semi-join counts."""
    from . import roles

    events = roles.load_events(spark, sf_dir)
    sk = events.groupBy("event_type").agg(
        F.theta_sketch_agg("user_id").alias("sk")
    )
    a = sk.filter(F.col("event_type") == "click").select(F.col("sk").alias("a"))
    b = sk.filter(F.col("event_type") == "purchase").select(F.col("sk").alias("b"))
    return a.crossJoin(b).select(
        F.round(F.theta_sketch_estimate(F.theta_intersection("a", "b"))).cast("bigint").alias("clicked_and_purchased"),
        F.round(F.theta_sketch_estimate(F.theta_union("a", "b"))).cast("bigint").alias("clicked_or_purchased"),
        F.round(F.theta_sketch_estimate(F.theta_difference("a", "b"))).cast("bigint").alias("clicked_never_purchased"),
    )


@register("kll_value_quantiles", None)  # sketch estimate — rows-only check
def kll_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantiles (DataSketches KLL): per-type p50/p95/p99 of the
    event value from one sketch aggregation, plus the GLOBAL quantiles by
    MERGING the per-type sketches — no second scan, no global sort.

    The scale contrast: exact percentiles need a full sort (or
    percentile_approx's fixed-accuracy digest per group, re-computed per
    rollup level); KLL sketches aggregate once, merge associatively
    across levels, and give rank-error guarantees.  Tests bound the
    estimates against exact percentiles by rank error."""
    from . import roles

    events = roles.load_events(spark, sf_dir)
    sk = events.groupBy("event_type").agg(
        F.kll_sketch_agg_double("value").alias("sk")
    )

    def qs(col):
        return [
            F.kll_sketch_get_quantile_double(col, F.lit(q)).alias(f"p{int(q*100)}")
            for q in (0.5, 0.95, 0.99)
        ]

    per_type = sk.select("event_type", *qs(F.col("sk")))
    # kll_sketch_merge_double is a BINARY merge; the global sketch is a
    # fold over the handful of per-type sketches (bounded by group count)
    merged_sketch = F.aggregate(
        F.expr("slice(arr, 2, size(arr) - 1)"),
        F.element_at(F.col("arr"), 1),
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    )
    merged = sk.agg(F.collect_list("sk").alias("arr")).select(
        F.lit("ALL").alias("event_type"), *qs(merged_sketch)
    )
    return per_type.unionByName(merged)


# --------------------------------------------------------------------------
# round-4 widening: remaining TPC-H join shapes (Q9 profit rollup, Q11
# global-threshold HAVING, Q20 nested-agg semi-join, Q21 exists/not-exists
# chain) adapted to the shipped tables (no partsupp / receiptdate: lineitem
# stands in for stock, returnflag for delivery failure), plus funnel and
# SCD2 history — the event-analytics staples
# --------------------------------------------------------------------------


@register(
    "q9_profit_by_nation_year",
    f"""
SELECT n.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
       {_dsum_sql('l.l_extendedprice * (1 - l.l_discount) '
                  '- 0.6 * p.p_retailprice * l.l_quantity')} AS sum_profit
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN part p     ON l.l_partkey = p.p_partkey
WHERE p.p_name LIKE '%a%'
GROUP BY nation, o_year
""",
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: the widest join tree in the suite — lineitem
    enriched by orders (year), supplier -> nation (seller geography) and
    part (name filter + cost basis; 0.6 * retailprice stands in for the
    absent partsupp supplycost), rolled up to (nation, year) profit.

    Scale design: orders is the only other FACT side (one shuffled join);
    supplier, nation and the name-filtered part are broadcast, so the big
    side never re-shuffles for enrichment.  The p_name predicate prunes
    part BEFORE the broadcast, and the profit expression rides the
    decimal-exact sum convention."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%a%"))
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(dsum(profit).alias("sum_profit"))
    )


@register(
    "q11_important_parts",
    f"""
WITH pv AS (
    SELECT l_partkey, {_dsum_sql('l_extendedprice')} AS part_value
    FROM lineitem GROUP BY l_partkey
), tot AS (
    SELECT {_dsum_sql('l_extendedprice')} AS total_value FROM lineitem
)
SELECT pv.l_partkey AS partkey, pv.part_value
FROM pv CROSS JOIN tot
WHERE pv.part_value > tot.total_value * 0.0007
""",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups kept only if their aggregate exceeds a
    fraction of the GLOBAL aggregate (HAVING against a scalar subquery).

    Spark form: the global total is a broadcast 1-row aggregate crossJoin
    (the q15 pattern — Catalyst rewrites it to BroadcastNestedLoopJoin of
    one row, no single-partition window), derived from the SAME per-part
    aggregate.  The denominator branch statically duplicates that
    aggregate, but the two shuffles are canonically identical, so AQE's
    exchange reuse collapses them at runtime — the executed plan is ONE
    lineitem scan + ONE shuffle with a ReusedExchange feeding the total
    (plan-tested on the final adaptive plan).

    The total is summed while the per-part values are still DECIMAL —
    decimal addition is exact and order-independent, so the global sum
    equals the oracle's direct decimal sum over lineitem bit-for-bit
    (summing the per-part DOUBLES instead would be order-dependent AND
    drift from the oracle by per-part rounding, flipping parts whose
    value sits near total*0.0007 between runs/engines)."""
    li = _t(spark, sf_dir, "lineitem")
    pvd = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(28,10)")).alias("_pv")
    )
    tot = pvd.agg(F.sum("_pv").cast("double").alias("total_value"))
    return (
        pvd.select("l_partkey", F.col("_pv").cast("double").alias("part_value"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("part_value") > F.col("total_value") * 0.0007)
        .select(F.col("l_partkey").alias("partkey"), "part_value")
    )


@register(
    "q20_dominant_suppliers",
    f"""
WITH ps AS (
    SELECT l_partkey, l_suppkey, {_dsum_sql('l_quantity')} AS supp_qty
    FROM lineitem GROUP BY l_partkey, l_suppkey
), pt AS (
    SELECT l_partkey, {_dsum_sql('l_quantity')} AS part_qty
    FROM lineitem GROUP BY l_partkey
)
SELECT DISTINCT s.s_suppkey AS suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (
    SELECT ps.l_suppkey FROM ps JOIN pt USING (l_partkey)
    WHERE ps.supp_qty > pt.part_qty * 0.2
)
""",
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: a semi-join against a NESTED per-group aggregate
    threshold — suppliers shipping over a fifth of some part's total volume
    (availqty vs demand in the original; lineitem volume stands in
    for the absent partsupp).

    Scale design: like the Q2 plan, one lineitem scan and ONE shuffle —
    repartition on the outer key makes hashpartitioning(l_partkey)
    satisfy both the (part, supplier) aggregate and the per-part total
    window; the qualifying supplier set is then deduped (tiny) and
    broadcast into a left_semi against supplier."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    ps = li.repartition("l_partkey").groupBy("l_partkey", "l_suppkey").agg(
        dsum("l_quantity").alias("supp_qty")
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        ps.withColumn("part_qty", F.sum("supp_qty").over(w))
        .filter(F.col("supp_qty") > F.col("part_qty") * 0.2)
        .select("l_suppkey")
        .distinct()
    )
    return (
        sup.join(
            F.broadcast(dominant),
            sup["s_suppkey"] == dominant["l_suppkey"],
            "left_semi",
        )
        .select(F.col("s_suppkey").alias("suppkey"), "s_name")
    )


@register(
    "q21_sole_return_suppliers",
    """
WITH qualifying AS (
    SELECT l1.l_suppkey, l1.l_orderkey
    FROM (SELECT DISTINCT l_suppkey, l_orderkey FROM lineitem
          WHERE l_returnflag = 'R') l1
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM qualifying q JOIN supplier s ON q.l_suppkey = s.s_suppkey
GROUP BY s.s_name
""",
)
def q21_sole_return_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the EXISTS / NOT-EXISTS self-join chain — per
    order, the supplier who alone had a returned line while other
    suppliers shipped clean (returnflag 'R' stands in for the absent
    late-receipt columns).

    Spark-first rewrite: instead of the oracle's two correlated self-joins
    (three lineitem scans), ONE per-order aggregate computes the distinct
    supplier count and the distinct RETURNING supplier count + its sole
    member — the exists (other supplier) and not-exists (other returning
    supplier) conditions collapse to ``n_supps > 1 AND n_ret_supps == 1``.
    One scan, one shuffle, then a broadcast supplier join for the name."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    ret_supp = F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(ret_supp).alias("n_ret_supps"),
        F.min(ret_supp).alias("sole_ret_supp"),
    )
    qualifying = per_order.filter(
        (F.col("n_supps") > 1) & (F.col("n_ret_supps") == 1)
    )
    return (
        qualifying.join(
            F.broadcast(sup),
            qualifying["sole_ret_supp"] == sup["s_suppkey"],
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "funnel_conversion",
    """
WITH stage AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
           MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
           MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
    FROM events GROUP BY user_id
)
SELECT CAST(COUNT(t_view) AS BIGINT) AS n_view,
       CAST(SUM(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS BIGINT)
           AS n_view_then_click,
       CAST(SUM(CASE WHEN t_click > t_view AND t_purchase > t_click
                     THEN 1 ELSE 0 END) AS BIGINT)
           AS n_full_funnel
FROM stage
""",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view -> click -> purchase): users counted
    at each stage only if the stages happened IN ORDER (first click after
    first view, first purchase after that click) — the event-analytics
    staple the reference's session/conversion tables feed.

    One scan, one shuffle (per-user conditional-MIN pivot), then a global
    single-row aggregate — no joins, no windows; NULL stage times fall
    out of the comparisons naturally (NULL > NULL is NULL -> not
    counted)."""
    from . import roles

    events = roles.load_events(spark, sf_dir)

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    stage = events.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    ordered_click = F.col("t_click") > F.col("t_view")
    full = ordered_click & (F.col("t_purchase") > F.col("t_click"))
    return stage.agg(
        F.count("t_view").alias("n_view"),
        F.sum(F.when(ordered_click, 1).otherwise(0)).alias("n_view_then_click"),
        F.sum(F.when(full, 1).otherwise(0)).alias("n_full_funnel"),
    )


@register(
    "scd2_user_event_history",
    """
WITH ordered AS (
    SELECT user_id, event_type, ts, event_id,
           LAG(event_type) OVER w AS prev_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), changes AS (
    SELECT user_id, event_type, ts, event_id
    FROM ordered
    WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type,
       CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
       CAST(epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id)) AS BIGINT)
           AS valid_to_us
FROM changes
""",
)
def scd2_user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build (gaps-and-islands collapse): each user's event-
    type runs become validity intervals — a row per CHANGE with
    [valid_from, valid_to) bounds and NULL valid_to on the current state.
    This is how a CDC feed turns into a slowly-changing dimension without
    a MERGE engine.

    Two window passes over ONE partitioning (user_id): LAG finds change
    points, LEAD over the filtered change rows closes each interval.
    Deterministic under ts ties via the (ts, event_id) composite order."""
    from . import roles

    events = roles.load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("valid_from_us"),
        F.unix_micros(F.lead("ts").over(w2)).alias("valid_to_us"),
    )


@register(
    "retention_cohorts",
    """
WITH cohorted AS (
    SELECT user_id, ts,
           date_trunc('week', MIN(CAST(ts AS DATE))
                              OVER (PARTITION BY user_id)) AS cw
    FROM events
)
SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', cw, CAST(ts AS DATE)) // 7 AS INTEGER) AS week_no,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
FROM cohorted
GROUP BY cohort_week, week_no
""",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen week, counted
    distinct in every subsequent activity week — the growth-analytics
    staple behind every retention curve.

    One user_id shuffle serves the whole query: the cohort week comes from
    a MIN window over the user partition (no self-join back to a first-
    seen aggregate — the window rides the same clustering the
    count-distinct needs).  week_no is an integer day-diff div 7, exact
    and engine-portable; the cohort week is emitted as a yyyy-MM-dd
    string (both engines truncate weeks to Monday)."""
    from . import roles

    events = roles.load_events(spark, sf_dir)
    w = Window.partitionBy("user_id")
    cohorted = events.select(
        "user_id",
        "ts",
        F.date_trunc("week", F.min(F.to_date("ts")).over(w)).alias("cw"),
    )
    return (
        cohorted.groupBy(
            F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
            F.floor(F.datediff(F.to_date("ts"), F.to_date("cw")) / 7)
            .cast("int")
            .alias("week_no"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@register(
    "data_quality_report",
    """
WITH agg AS (
    SELECT SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS e0,
           COUNT(*) - COUNT(DISTINCT o_orderkey) AS e1,
           SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                      OR o_orderstatus IS NULL THEN 1 ELSE 0 END) AS e2,
           SUM(CASE WHEN o_totalprice IS NOT NULL
                     AND (o_totalprice < 0 OR o_totalprice > 1e9)
                    THEN 1 ELSE 0 END) AS e3,
           GREATEST(1 - COUNT(*), 0) AS e4
    FROM orders
)
SELECT u.expectation, u.n_violations, u.n_violations = 0 AS ok
FROM agg, (
    SELECT 'not_null(o_custkey)' AS expectation, CAST(e0 AS BIGINT) AS n_violations FROM agg
    UNION ALL SELECT 'unique(o_orderkey)', CAST(e1 AS BIGINT) FROM agg
    UNION ALL SELECT 'values_in(o_orderstatus)', CAST(e2 AS BIGINT) FROM agg
    UNION ALL SELECT 'between(o_totalprice,0,1000000000.0)', CAST(e3 AS BIGINT) FROM agg
    UNION ALL SELECT 'row_count_min(1)', CAST(e4 AS BIGINT) FROM agg
) u
""",
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-quality expectation suite as a registry query: five rules
    over orders (null keys, duplicate order keys, status domain, price
    range, minimum rows) evaluated by operators/quality.py in ONE
    aggregate pass and emitted as the tidy (expectation, n_violations,
    ok) report — the between-stages gate a production pipeline runs,
    driver-checked against a plain-SQL recomputation of every rule."""
    from .operators import quality as qa

    orders = _t(spark, sf_dir, "orders")
    return qa.check_expectations(
        orders,
        [
            qa.expect_not_null("o_custkey"),
            qa.expect_unique("o_orderkey"),
            qa.expect_values_in("o_orderstatus", ["O", "F", "P"]),
            qa.expect_between("o_totalprice", 0, 1e9),
            qa.expect_row_count_min(1),
        ],
    )


@register(
    "pricing_summary_unpivot",
    # wide -> long reshaping (§2.5/§2.6 melt): same decimal-exact sums as
    # q1, unpivoted to one (metric, value) row per measure.
    f"""
WITH s AS (
    SELECT l_returnflag, l_linestatus,
       {_dsum_sql('l_quantity')} AS sum_qty,
       {_dsum_sql('l_extendedprice')} AS sum_base_price,
       {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {_dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus, metric, value
FROM s UNPIVOT (value FOR metric IN
    (sum_qty, sum_base_price, sum_disc_price, sum_charge))
""",
)
def q_pricing_summary_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt: the Q1 pricing summary reshaped from one wide row
    per (returnflag, linestatus) to one (metric, value) row per measure —
    ``DataFrame.unpivot`` (Expand under the hood: no shuffle beyond the
    aggregate's own, output = rows × measures).  The long form is what
    metric stores and plotting layers ingest; doing the reshape in-engine
    keeps it distributed instead of a driver-side melt."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    wide = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
        )
    )
    return wide.unpivot(
        ["l_returnflag", "l_linestatus"],
        ["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"],
        "metric",
        "value",
    )


@register(
    "events_variant_extract",
    # oracle extracts through DuckDB's JSON path functions; SUM(BIGINT)
    # CAST back to BIGINT per the HUGEINT-lint convention.
    """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS max_k,
       CAST(COUNT(CAST(json_extract_string(props, '$.missing') AS BIGINT))
            AS BIGINT) AS n_missing
FROM events
GROUP BY event_type
""",
)
def events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT surface (SURVEY.md §2.3 JSON family, upgraded):
    the props payload parses ONCE into a VariantType column
    (`parse_json` — the open-format binary encoding Delta/Iceberg v3
    adopted for semi-structured data) and every extraction is a
    `variant_get` path over the parsed value — unlike
    `get_json_object`, which re-parses the string per extraction (the
    documented scale caveat on `events_json_props`).  `try_variant_get`
    on an absent path proves the null semantics (n_missing aggregates
    to 0, not an error).

    At 100 TB this is the difference between parsing the payload k
    times per row and once: shredded variant columns keep extraction
    columnar and pushdown-friendly."""
    from . import roles

    events = roles.load_events(spark, sf_dir)
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "bigint")
    miss = F.try_variant_get(v, "$.missing", "bigint")
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.max(k).cast("bigint").alias("max_k"),
        F.count(miss).alias("n_missing"),
    )
