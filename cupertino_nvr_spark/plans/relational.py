"""Batch relational operator inventory (SURVEY §2.4-2.8, driver contract).

Every query here is a pure DataFrame program (Catalyst handles pushdown,
pruning, join strategy) paired with an ANSI-SQL oracle for DuckDB.

Float determinism policy: any SUM/AVG over money-like doubles casts the
*raw 2-decimal column* to DECIMAL(18,2) first (exact in both engines since
the data carries exactly 2 decimals), aggregates exactly in decimal, and
casts the final result to DOUBLE — bit-identical across engines regardless
of accumulation order. Never cast a *computed* double to decimal (Spark
rounds on the decimal string, DuckDB on the binary value — they disagree).
Scalar double arithmetic (a*b, a/2) is IEEE-deterministic and safe unrounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cupertino_nvr_spark.operators.joins import latest_per_key
from cupertino_nvr_spark.plans.registry import register
from cupertino_nvr_spark.sources.tables import load_table, register_views


def _dec(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


# ---------------------------------------------------------------------------
# Aggregations (A-group; TPC-H-flavored)
# ---------------------------------------------------------------------------

@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: hash agg with partial (map-side) combine",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    disc = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    charge = disc * (F.lit(1) + _dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1999-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "revenue_by_nation",
    """
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape: fact-fact sort-merge + broadcast dims, join reorder by Catalyst",
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp"))
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name").isin("ASIA", "EUROPE"))),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "shipping_priority",
    """
    SELECT o.o_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: selective join + agg + deterministic top-10 (TakeOrderedAndProject)",
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "orders_rollup",
    """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="hierarchical ROLLUP totals (Expand operator, single shuffle)",
)
def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
    )


@register(
    "lineitem_cube",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE over two dims",
)
def lineitem_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"),
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
    )


@register(
    "orders_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    doc="GROUPING SETS via SQL (Catalyst Expand)",
)
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "event_type_distinct_users",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    """,
    doc="distinct aggregate (two-phase partial/final under AQE)",
)
def event_type_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(_dec("value")).cast("double").alias("total_value"),
    )


@register(
    "user_event_pivot",
    """
    SELECT user_id,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
           COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error
    FROM events
    GROUP BY user_id
    """,
    doc="pivot (explicit value list so no extra distinct pass)",
)
def user_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    kinds = ["view", "click", "purchase", "signup", "error"]
    out = ev.groupBy("user_id").pivot("event_type", kinds).count()
    return out.select(
        "user_id",
        *[F.coalesce(F.col(k), F.lit(0)).alias(f"n_{k}") for k in kinds],
    )


# ---------------------------------------------------------------------------
# Joins (J-group)
# ---------------------------------------------------------------------------

@register(
    "nation_region_broadcast",
    """
    SELECT r.r_name, COUNT(*) AS n_nations, MIN(n.n_name) AS first_nation
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    doc="J2 dim lookup as broadcast hash join",
)
def nation_region_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_nations"), F.min("n_name").alias("first_nation"))
    )


@register(
    "customers_with_orders",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
    doc="left-semi join (EXISTS)",
)
def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_totalprice") > 300000)
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "customers_without_orders",
    """
    SELECT c.c_custkey, c.c_name, c.c_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="left-anti join (NOT EXISTS)",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


@register(
    "premium_lineitems_theta",
    """
    SELECT p.p_brand, COUNT(*) AS n_premium,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS premium_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
                AND l.l_extendedprice > p.p_retailprice * 60
    GROUP BY p.p_brand
    """,
    doc="theta join: equi key + non-equi residual (stays a hash join, residual filtered post-probe)",
)
def premium_lineitems_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    return (
        li.join(
            F.broadcast(part),
            (li.l_partkey == part.p_partkey)
            & (li.l_extendedprice > part.p_retailprice * 60),
        )
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_premium"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("premium_revenue"),
        )
    )


@register(
    "orders_above_avg",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.5 * (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        FROM orders)
    """,
    doc="scalar subquery (decimal-exact threshold so both engines agree)",
)
def orders_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
            FROM orders)
        """
    )


# ---------------------------------------------------------------------------
# Window functions (§2.6)
# ---------------------------------------------------------------------------

@register(
    "latest_event_per_user",
    """
    SELECT event_id, user_id, ts, event_type, value FROM (
      SELECT event_id, user_id, ts, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
    """,
    doc="A4 last-per-key via max_by (one shuffle, no window sort)",
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    return latest_per_key(ev, key="user_id", ts="ts", tiebreak="event_id")


@register(
    "user_running_value",
    """
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
    FROM events
    """,
    doc="running aggregate window (decimal-exact prefix sums)",
)
def user_running_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(_dec("value")).over(w).cast("double").alias("running_value"),
    )


@register(
    "event_gaps",
    """
    SELECT event_id, user_id, ts,
           LAG(event_type) OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type,
           (epoch_us(ts) - LAG(epoch_us(ts)) OVER w) / 1000000.0 AS gap_sec
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="lag/lead + inter-event gap",
)
def event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        ((us - F.lag(us).over(w)) / 1000000.0).alias("gap_sec"),
    )


@register(
    "top_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn AS order_rank FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 3
    """,
    doc="top-k per group via ranked window",
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("order_rank", F.row_number().over(w))
        .filter(F.col("order_rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "order_rank")
    )


@register(
    "trailing_user_activity",
    """
    SELECT event_id, user_id, ts,
           COUNT(*) OVER w AS n_trailing_24h,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS value_trailing_24h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
    """,
    doc="sliding range window (trailing 24 h per key, micros-exact bounds)",
)
def trailing_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-86400000000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).alias("n_trailing_24h"),
        F.sum(_dec("value")).over(w).cast("double").alias("value_trailing_24h"),
    )


# ---------------------------------------------------------------------------
# Sorts / limits / set ops (§2.7)
# ---------------------------------------------------------------------------

@register(
    "top20_lineitems",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
    doc="global top-k (Catalyst rewrites to TakeOrderedAndProject — no full sort)",
)
def top20_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(20)
    )


@register(
    "nation_presence_set_ops",
    """
    SELECT 'both' AS op, n_nationkey FROM
      (SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
       INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'customer_only' AS op, n_nationkey FROM
      (SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
       EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'all' AS op, n_nationkey FROM
      (SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
       UNION SELECT DISTINCT s_nationkey FROM supplier)
    """,
    doc="INTERSECT / EXCEPT / UNION distinct over nation keys",
)
def nation_presence_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir).select(
        F.col("c_nationkey").alias("n_nationkey")
    ).distinct()
    supp = load_table(spark, "supplier", sf_dir).select(
        F.col("s_nationkey").alias("n_nationkey")
    ).distinct()
    both = cust.intersect(supp).select(F.lit("both").alias("op"), "n_nationkey")
    conly = cust.exceptAll(supp).distinct().select(
        F.lit("customer_only").alias("op"), "n_nationkey"
    )
    allk = cust.union(supp).distinct().select(F.lit("all").alias("op"), "n_nationkey")
    return both.unionByName(conly).unionByName(allk)


@register(
    "order_price_stats",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           round(sqrt((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 - CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   * (CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)))
                / (COUNT(*) - 1)), 6) AS stddev_price,
           quantile_cont(o_totalprice, 0.5) AS median_price,
           quantile_cont(o_totalprice, 0.9) AS p90_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="statistical aggregates: exact-decimal moment sums (map-side "
    "combinable) -> IEEE-deterministic stddev; exact interpolated percentiles",
)
def order_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev from exact decimal moments — sqrt((Σx² − Σx·mean)/(n−1)) —
    so accumulation order cannot perturb the result, unlike stddev_samp
    whose float partials differ between engines."""
    o = load_table(spark, "orders", sf_dir)
    price4 = _dec("o_totalprice")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_dec("o_totalprice")).alias("_sx"),
            F.sum(price4 * price4).alias("_sxx"),
            F.percentile("o_totalprice", F.lit(0.5)).alias("median_price"),
            F.percentile("o_totalprice", F.lit(0.9)).alias("p90_price"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            (F.col("_sx").cast("double") / F.col("n_orders")).alias("avg_price"),
            # round 6: the decimal moment sums are bit-identical across
            # engines, but DuckDB's int128->double conversion double-rounds,
            # leaving 1-2 ulp on the variance
            F.round(
                F.sqrt(
                    (
                        F.col("_sxx").cast("double")
                        - F.col("_sx").cast("double")
                        * (F.col("_sx").cast("double") / F.col("n_orders"))
                    )
                    / (F.col("n_orders") - 1)
                ),
                6,
            ).alias("stddev_price"),
            "median_price",
            "p90_price",
        )
    )


@register(
    "quantity_price_correlation",
    """
    SELECT l_returnflag,
           COUNT(*) AS n,
           round(
           (COUNT(*) * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE))
           / (sqrt(COUNT(*) * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE))
              * sqrt(COUNT(*) * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                     - CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)))
           , 9) AS qty_price_corr
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Pearson correlation from exact decimal co-moment sums (one pass, "
    "map-side combinable) instead of float-partial corr()",
)
def quantity_price_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    q4 = _dec("l_quantity")
    p4 = _dec("l_extendedprice")
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(_dec("l_quantity")).alias("_sq"),
        F.sum(_dec("l_extendedprice")).alias("_sp"),
        F.sum(q4 * p4).alias("_sqp"),
        F.sum(q4 * q4).alias("_sqq"),
        F.sum(p4 * p4).alias("_spp"),
    )
    n = F.col("n")
    sq, sp = F.col("_sq").cast("double"), F.col("_sp").cast("double")
    sqp, sqq, spp = (
        F.col("_sqp").cast("double"),
        F.col("_sqq").cast("double"),
        F.col("_spp").cast("double"),
    )
    return agg.select(
        "l_returnflag",
        "n",
        F.round(
            (n * sqp - sq * sp)
            / (F.sqrt(n * sqq - sq * sq) * F.sqrt(n * spp - sp * sp)),
            9,  # decimal->double casts differ by 1 ulp across engines
        ).alias("qty_price_corr"),
    )


@register(
    "user_value_sketches",
    None,  # sketch estimates are impl-defined (HLL register layout, GK
    # quantile compaction) and cannot hash-match another engine, so this
    # stays OUT of the driver-declared set (bench_only) — a declared
    # no-oracle query is an automatic red whenever sampled (rounds 1-4).
    # The relative-error bound vs exact is asserted in
    # tests/test_sketches.py; the exact oracle-checked companion is
    # user_value_exact_stats below.
    doc="scale-path cardinality/quantile sketches: approx_count_distinct "
    "(HLL) and percentile_approx per group — constant memory per group vs "
    "the exact shuffles, the right trade at 100 TB. Quantiles are emitted "
    "as scalar p50/p90 columns: the driver's canonicalizer cannot sort "
    "array-typed output (CORRECTNESS_r01 harness err).",
    bench_only=True,
)
def user_value_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    sketched = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.percentile_approx("value", F.array(F.lit(0.5), F.lit(0.9)), 10000).alias(
            "_q"
        ),
        F.count("*").alias("n_events"),
    )
    return sketched.select(
        "event_type",
        "approx_users",
        F.element_at("_q", 1).alias("value_p50"),
        F.element_at("_q", 2).alias("value_p90"),
        "n_events",
    )


@register(
    "user_value_exact_stats",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events,
           ROUND(quantile_cont(value, 0.5), 6) AS value_p50,
           ROUND(quantile_cont(value, 0.9), 6) AS value_p90
    FROM events GROUP BY event_type
    """,
    doc="exact companion to user_value_sketches: per-group exact distinct "
    "cardinality and exact interpolated quantiles (Spark `percentile` and "
    "DuckDB `quantile_cont` both interpolate at rank p*(n-1), so the "
    "results hash-match after rounding). This is the oracle-checked row; "
    "the sketch variant stays bench-only with its error bound pinned in "
    "tests/test_sketches.py — at 100 TB the sketches are the right plan "
    "(constant memory per group vs the exact distinct/percentile sorts).",
)
def user_value_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("value_p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("value_p90"),
    )


_ETYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "user_event_unpivot",
    f"""
    WITH wide AS (
      SELECT user_id,
             {", ".join(f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}" for t in _ETYPES)}
      FROM events GROUP BY user_id
    )
    SELECT user_id, event_type, n FROM (
      {" UNION ALL ".join(f"SELECT user_id, '{t}' AS event_type, {t} AS n FROM wide" for t in _ETYPES)}
    ) WHERE n > 0
    """,
    doc="§2.7 unpivot/melt: the wide per-user conditional-count frame is "
    "melted back to long form with Spark's native unpivot operator "
    "(Expand: one pass over the aggregate emitting #types rows per input "
    "row — no self-union, no re-scan per measure; the oracle spells the "
    "portable UNION ALL equivalent). Zero cells are dropped after the "
    "melt, restoring the sparse long form. The expand runs over the "
    "users-sized AGGREGATE, never the event stream.",
)
def user_event_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    wide = ev.groupBy("user_id").agg(
        *[
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
            .cast("bigint")
            .alias(t)
            for t in _ETYPES
        ]
    )
    return (
        wide.unpivot(["user_id"], list(_ETYPES), "event_type", "n")
        .filter(F.col("n") > 0)
        .select("user_id", "event_type", "n")
    )


@register(
    "customer_order_bracket",
    """
    WITH seq AS (
      SELECT o_custkey,
             first_value(o_totalprice) OVER w AS first_price,
             nth_value(o_totalprice, 2) OVER w AS second_price,
             last_value(o_totalprice) OVER w AS last_price,
             COUNT(*) OVER w AS n_orders,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    )
    SELECT o_custkey AS c_custkey, first_price, second_price, last_price,
           n_orders
    FROM seq WHERE rn = 1
    """,
    doc="§2.6 positional window surface (first_value / nth_value / "
    "last_value over an explicit unbounded frame): each customer's "
    "first, second, and latest order price in their (date, key)-ordered "
    "history, one row per customer. All four positional functions and "
    "the row_number share ONE custkey-partitioned sort; second_price is "
    "NULL for single-order customers in both engines.",
)
def customer_order_bracket(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    w_ord = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w = w_ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    seq = orders.select(
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.count("*").over(w).alias("n_orders"),
        F.row_number().over(w_ord).alias("rn"),
    )
    return seq.filter(F.col("rn") == 1).select(
        F.col("o_custkey").alias("c_custkey"),
        "first_price",
        "second_price",
        "last_price",
        "n_orders",
    )
