"""Headline relational queries over the driver star schema.

These are the flagship plans the engine exercises at scale: navigation +
filter + aggregate, multi-table equi-joins (the Spark realization of
RADmapper's ``query{}`` datalog joins — SURVEY.md §2.3: shared query
variables become equi-join keys), and grouped rollups (the realization of
``express{}``/``$reduce`` — SURVEY.md §2.6).

Scale notes (100 TB design):
- Dimension tables (region/nation/supplier/customer at low SF) are joined
  with explicit ``F.broadcast`` hints — no shuffle of the fact table on the
  dimension key; at full scale customer stops being broadcastable and AQE
  falls back to a shuffle join on stats.
- All money/quantity aggregates cast to DECIMAL(18,2) *before* summing:
  exact arithmetic is partition-order-independent, so results are
  deterministic under any degree of parallelism (a double sum is not).
  Final values are cast back to double for a stable public schema.
- Filters are plain Column predicates on scan columns → Catalyst pushes
  them into the parquet scan (verified via .explain: PushedFilters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def _dsum(col, alias):
    """Exact (decimal) sum surfaced as double."""
    return F.sum(col.cast(DEC)).cast("double").alias(alias)


def pricing_summary(t: dict) -> DataFrame:
    """TPC-H Q1-shaped rollup: lineitem scan → groupBy(flag,status) → aggs.

    One shuffle on the (low-cardinality) grouping keys; partial aggregation
    happens map-side, so shuffle volume is O(groups x partitions), not O(rows).
    """
    li = t["lineitem"].filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    disc_price = F.col("l_extendedprice").cast(DEC) * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    charge = disc_price * (F.lit(1).cast(DEC) + F.col("l_tax").cast(DEC))
    sum_qty_dec = F.sum(F.col("l_quantity").cast(DEC))
    cnt = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_qty_dec.cast("double").alias("sum_qty"),
            _dsum(F.col("l_extendedprice"), "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.round(sum_qty_dec.cast("double") / cnt, 6).alias("avg_qty"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def pricing_summary_sql() -> str:
    return """
    SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
        COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """


def top_revenue_orders(t: dict) -> DataFrame:
    """TPC-H Q3-shaped: customer ⋈ orders ⋈ lineitem, top-10 revenue.

    customer is the small side at every SF relative to lineitem → broadcast
    the (filtered) customer keys; orders⋈lineitem shuffles on orderkey.
    """
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t["orders"].filter(F.col("o_orderdate") < F.lit("1998-03-15")).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = t["lineitem"].filter(F.col("l_shipdate") > F.lit("1995-03-15")).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    revenue = F.col("l_extendedprice").cast(DEC) * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    return (
        li.join(F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def top_revenue_orders_sql() -> str:
    return """
    SELECT o_orderkey,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY o_orderkey
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """


def region_nation_revenue(t: dict) -> DataFrame:
    """TPC-H Q5-shaped snowflake join: all dims broadcast, single fact shuffle.

    Join order written smallest-out so even without AQE the fact table is
    probed against broadcast hash maps; no dim-dim shuffles occur.
    """
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    dims = (
        t["customer"].select("c_custkey", "c_nationkey")
        .join(F.broadcast(t["nation"].select("n_nationkey", "n_name", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"].select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
    )
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
    ).select("o_orderkey", "o_custkey")
    return (
        t["lineitem"].select("l_orderkey", "l_extendedprice", "l_discount")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
        .orderBy("r_name", "n_name")
    )


def region_nation_revenue_sql() -> str:
    return """
    SELECT r_name, n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_lines
    FROM lineitem, orders, customer, nation, region
    WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
    """


def events_by_type(t: dict) -> DataFrame:
    """Event rollup (the batch shape of the streaming windowed agg)."""
    cnt = F.count(F.lit(1))
    sum_dec = F.sum(F.col("value").cast(DEC))
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            cnt.alias("n_events"),
            sum_dec.cast("double").alias("sum_value"),
            F.round(sum_dec.cast("double") / cnt, 6).alias("avg_value"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
        )
        .orderBy("event_type")
    )


def events_by_type_sql() -> str:
    return """
    SELECT event_type, COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_value,
        COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """


def large_orders(t: dict) -> DataFrame:
    """TPC-H Q18-shaped: orders whose total lineitem quantity exceeds a
    threshold, with the customer attached.

    Plan: lineitem groupBy(orderkey) with map-side partial sums -> HAVING
    filter cuts the aggregate BEFORE any join (at 100 TB the filter
    passes a tiny fraction, so the orders join probes a small build side)
    -> join orders -> broadcast customer."""
    qty = (t["lineitem"].groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("_q"))
           .filter(F.col("_q") > F.lit(150).cast(DEC)))
    return (qty.join(t["orders"],
                     qty.l_orderkey == t["orders"].o_orderkey)
            .join(F.broadcast(t["customer"]),
                  F.col("o_custkey") == F.col("c_custkey"))
            .select(F.col("c_name"), F.col("c_custkey"),
                    F.col("o_orderkey"), F.col("o_totalprice"),
                    F.col("_q").cast("double").alias("total_qty"))
            .orderBy(F.col("total_qty").desc(), F.col("o_orderkey")))


def large_orders_sql() -> str:
    return """
    SELECT c_name, c_custkey, o_orderkey, o_totalprice,
           CAST(q AS DOUBLE) AS total_qty
    FROM (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
          FROM lineitem GROUP BY l_orderkey
          HAVING q > CAST(150 AS DECIMAL(18,2))) big
    JOIN orders ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY total_qty DESC, o_orderkey
    """


def top_customer_per_nation(t: dict) -> DataFrame:
    """Argmax-per-group: each nation's highest-acctbal customer, with a
    deterministic (acctbal, custkey) tie-break via max(struct(...)) — the
    single-shuffle argmax pattern (no window sort over the whole table,
    no self-join)."""
    best = (t["customer"].groupBy("c_nationkey")
            .agg(F.max(F.struct(F.col("c_acctbal"), F.col("c_custkey"),
                                F.col("c_name"))).alias("b")))
    return (best.join(F.broadcast(t["nation"]),
                      best.c_nationkey == t["nation"].n_nationkey)
            .select(F.col("n_name").alias("nation"),
                    F.col("b.c_custkey").alias("c_custkey"),
                    F.col("b.c_name").alias("c_name"),
                    F.round(F.col("b.c_acctbal"), 2).alias("acctbal")))


def top_customer_per_nation_sql() -> str:
    return """
    SELECT n_name AS nation, c_custkey, c_name, round(c_acctbal, 2) AS acctbal
    FROM (SELECT *, row_number() OVER (
              PARTITION BY c_nationkey
              ORDER BY c_acctbal DESC, c_custkey DESC) AS rn
          FROM customer) c
    JOIN nation ON n_nationkey = c_nationkey
    WHERE rn = 1
    """
