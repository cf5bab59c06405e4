"""Registered relational queries (SURVEY §2.J).

The reference inherits scans/joins/aggregation/windows from PostgreSQL;
our build inherits them from Spark SQL/Catalyst. These queries pin that
substrate against the oracle: TPC-H-style aggregation, multi-way joins
with broadcast dims, window top-k per group, and the time-windowed
events rollup (the batch twin of the streaming query in
streaming/embed_stream.py).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lantern_spark.queries.common import load_table
from lantern_spark.registry import register


@register(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(sum(l_extendedprice), 4) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*)::BIGINT AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                4,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "revenue_by_nation",
    """
    SELECT n.n_name AS nation, round(sum(o.o_totalprice), 4) AS revenue,
           count(DISTINCT o.o_custkey)::BIGINT AS n_customers
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def revenue_by_nation(spark, sf_dir):
    """3-way join with broadcast dims — nation/customer are broadcast,
    only orders streams (the 100 TB join shape)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


@register(
    "top3_orders_per_segment",
    """
    WITH ranked AS (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             row_number() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT c_mktsegment, o_orderkey, round(o_totalprice, 4) AS o_totalprice
    FROM ranked WHERE rn <= 3
    """,
)
def top3_orders_per_segment(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", F.round("o_totalprice", 4).alias("o_totalprice"))
    )


@register(
    "parts_supplied_summary",
    """
    SELECT p.p_brand, p.p_type,
           count(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt,
           round(sum(l.l_quantity), 4) AS total_qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size >= 10
    GROUP BY p.p_brand, p.p_type
    """,
)
def parts_supplied_summary(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p.filter(F.col("p_size") >= 10)), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt"),
            F.round(F.sum("l_quantity"), 4).alias("total_qty"),
        )
    )


@register(
    "events_hourly_rollup",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*)::BIGINT AS n_events,
           round(sum(value), 6) AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def events_hourly_rollup(spark, sf_dir):
    """Batch twin of the streaming windowed aggregation
    (streaming/embed_stream.py windowed_event_stats)."""
    from lantern_spark.streaming.embed_stream import windowed_event_stats

    events = load_table(spark, sf_dir, "events")
    return windowed_event_stats(events, window="1 hour")


@register(
    "events_sessionization",
    """
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sess AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
      FROM gaps
    )
    SELECT user_id, session_id, count(*)::BIGINT AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
)
def events_sessionization(spark, sf_dir):
    """Gap-based sessionization (lag + cumulative sum) — the batch
    equivalent of session_window in streaming.

    Hash-parity notes (round-1 fixes): both the lag and the cumulative
    windows order by (ts, event_id) so timestamp ties assign sessions
    identically in Spark and the oracle; the gap compares microseconds
    (unix_micros) so sub-second precision matches DuckDB's exact
    ``ts - lag(ts) > INTERVAL 30 MINUTE``.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    us = F.unix_micros(F.col("ts"))
    gaps = events.withColumn(
        "new_session",
        F.when(
            (us - F.lag(us).over(w) > 1800 * 1_000_000)
            | F.lag(us).over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sess = gaps.withColumn("session_id", F.sum("new_session").over(wcum))
    return sess.groupBy("user_id", "session_id").agg(F.count("*").alias("n_events"))


@register(
    "asof_purchase_attribution",
    """
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    views AS (
      SELECT event_id AS view_id, user_id, ts AS view_ts, value AS view_value
      FROM events WHERE event_type = 'view'
    )
    SELECT c.event_id, c.user_id, v.view_id, v.view_value,
           v.view_ts AS view_ts_r
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND c.ts >= v.view_ts
    """,
)
def asof_purchase_attribution(spark, sf_dir):
    """As-of join (point-in-time attribution): every purchase event
    matched to the user's most recent view at-or-before it. Spark has
    no native ASOF JOIN — composed as union-tag + one window (see
    operators/asof.py); oracle = DuckDB's native ASOF LEFT JOIN."""
    from lantern_spark.operators.asof import asof_join
    from lantern_spark.types import load_events

    ev = load_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    )
    return asof_join(
        purchases,
        views,
        on="user_id",
        left_time="ts",
        right_time="view_ts",
        right_cols=["view_id", "view_value"],
    ).select("event_id", "user_id", "view_id", "view_value", "view_ts_r")


def events_rollup_type_hour(spark, sf_dir):
    """ROLLUP grouping-sets aggregate (the Catalyst-freebie §2.J
    surface exercised explicitly): per (type, hour), per type, grand
    total, with grouping level markers.

    Retired from the oracle roster in r11 (50-query driver cap):
    ROLLUP is one Catalyst built-in (``df.rollup``) whose events-agg
    coverage stays hash-checked via ``events_hourly_rollup`` and
    ``events_sessionization``; the slot funds ``wet_documents_docs``
    (the crawl front door, r10's newest first-class layer). Still
    timed in bench (direct import) so the series stays comparable,
    and DuckDB-replayed in tests/test_crawl_queries.py so the
    grouping-sets parity pin survives retirement."""
    from lantern_spark.types import load_events

    ev = load_events(spark, sf_dir).select(
        "event_type", F.hour("ts").alias("hour"), "value"
    )
    return (
        ev.rollup("event_type", "hour")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            (
                F.grouping("event_type").cast("int")
                + 2 * F.grouping("hour").cast("int")
            ).alias("lvl"),
        )
        .select("event_type", "hour", "n", "sum_value", "lvl")
    )


@register(
    "tpch_q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join with selective dim filters — pins
    Catalyst join planning (broadcast of the filtered customer side)
    and date-predicate pushdown."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-03-15"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-03-15"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def tpch_q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: 4-way join (two broadcast dims, one fact-fact)
    + grouped revenue over returned items.

    Retired from the oracle roster in r8 (50-query driver cap): the
    multi-join-breadth coverage row stays starred via
    ``tpch_q3_shipping_priority`` (the same broadcast-dim + fact-fact
    join shape), and the agg-over-join shape is also hash-checked by
    ``revenue_by_nation``; the slot funds ``substr_dup_windows_docs``
    (ExactSubstr's detection layer, the newest first-class pipeline
    op). Still timed in bench (direct import) so the series stays
    comparable."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            "n_name",
            F.round("c_acctbal", 4).alias("c_acctbal"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )
