"""Operator-inventory queries over the driver's TPC-H-ish testdata.

One query per SURVEY.md §2 operator family, phrased over
``region nation customer supplier part orders lineitem events`` so the
driver's DuckDB oracle can verify each against ANSI SQL at sf0.01.

Reference-parity citations in each docstring point at the construct in
/root/reference that the query re-expresses (the reference itself runs on
Airbnb listing tables; the pipeline-shaped build of the same constructs lives
in ``plans/`` — these registry queries are the operator-level contract).

All queries follow the hash-stability rules in registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.dialect import half_up_long
from ..sources.tpch import load_table
from .registry import query


def _dec(c: F.Column, scale: int = 2) -> F.Column:
    return c.cast(f"decimal(18,{scale})")


def _cents_sum(c: F.Column, scale: int = 2) -> F.Column:
    """Bit-stable fast money sum: round to integer 10^scale units, sum as
    LONG (exact, associative, ~2-4x faster than decimal aggregation), then
    divide back to a double. Long overflow would need > ~9e14 currency units
    per group (ANSI mode errors rather than wraps); decimal remains the
    belt-and-braces form for that regime (see q26). The per-row HALF_UP
    round is dialect.half_up_long — value-identical to round().cast(long)
    without the per-row BigDecimal (measured 2x on the q01 map stage)."""
    unit = 10 ** scale
    return F.sum(half_up_long(c * unit)) / float(unit)


def _cents_sum_raw(c: F.Column, scale: int = 2) -> F.Column:
    """As _cents_sum, but keeps the exact integer unit total (no final
    division) — for outputs typed BIGINT."""
    return F.sum(half_up_long(c * 10 ** scale))


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.4)
# ---------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0           AS sum_qty,
           SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0      AS sum_base_price,
           SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0
                                                                          AS sum_disc_price,
           SUM(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 / COUNT(*) AS avg_qty,
           CAST(MIN(l_extendedprice) AS DOUBLE)                        AS min_price,
           CAST(MAX(l_extendedprice) AS DOUBLE)                        AS max_price,
           COUNT(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey_rows=("A1", "A3", "A4", "A5", "A6", "A8", "P5", "P9", "F9"),
    doc="Multi-aggregate groupBy (partial+final hash agg) — the KPI-view "
    "aggregate shape of workfile_populate_data_warehouse.py:506-621.",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _cents_sum(F.col("l_quantity")).alias("sum_qty"),
            _cents_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            _cents_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "sum_disc_price"
            ),
            (_cents_sum(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty"),
            F.min("l_extendedprice").cast("double").alias("min_price"),
            F.max("l_extendedprice").cast("double").alias("max_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q12_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS distinct_customers,
           COUNT(*)                  AS total_orders
    FROM orders GROUP BY o_orderpriority
    """,
    survey_rows=("A2", "A8"),
    doc="Exact COUNT(DISTINCT) per group — workfile_populate_data_warehouse"
    ".py:518 (COUNT(DISTINCT host_id) per LGA/month).",
)
def q12_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("distinct_customers"),
        F.count(F.lit(1)).alias("total_orders"),
    )


@query(
    "q13_distinct_projection",
    oracle="""
    SELECT DISTINCT c_mktsegment, CAST(c_nationkey AS BIGINT) AS c_nationkey
    FROM customer
    """,
    survey_rows=("A10",),
    doc="SELECT DISTINCT dedup — workfile_design_data_warehouse.sql:170, 545.",
)
def q13_distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_mktsegment", F.col("c_nationkey").cast("long").alias("c_nationkey")).distinct()


@query(
    "q11_median_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5) / 100.0
               AS median_price,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    survey_rows=("A7",),
    doc="Exact median (PERCENTILE_CONT 0.5) — workfile_populate_data_warehouse"
    ".py:564. Computed over integer cents so linear interpolation is "
    "bit-identical across engines.",
)
def q11_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cents = half_up_long(F.col("l_extendedprice") * 100)
    return li.groupBy("l_returnflag").agg(
        (F.percentile(cents, F.lit(0.5)) / 100.0).alias("median_price"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q22_conditional_rates",
    oracle="""
    SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
           COUNT(*) AS total_orders,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS finished_orders,
           100 * COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) / COUNT(*)
               AS finished_rate_pct
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    """,
    survey_rows=("A9", "A11", "F10", "J7"),
    doc="Single-pass conditional aggregation — the idiomatic collapse of the "
    "reference's 4-filtered-subaggregate + FULL JOIN KPI shape "
    "(workfile_populate_data_warehouse.py:506-621, SURVEY §2.4 A11).",
)
def q22_conditional_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    finished = F.count(F.when(F.col("o_orderstatus") == "F", 1))
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").cast("long").alias("c_nationkey"))
        .agg(
            F.count(F.lit(1)).alias("total_orders"),
            finished.alias("finished_orders"),
            (F.lit(100) * finished / F.count(F.lit(1))).alias("finished_rate_pct"),
        )
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# ---------------------------------------------------------------------------


@query(
    "q03_join_topk_revenue",
    oracle="""
    SELECT o_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate, o_orderpriority,
           SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0
               AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    survey_rows=("J7", "A5", "A8", "O1", "O3"),
    doc="3-way equi-join + agg + global top-k (TakeOrderedAndProject) — the "
    "fact->dim star-lookup + ORDER BY/LIMIT shape of workfile_ad-hoc_analysis"
    ".sql:43-59. Small sides broadcast.",
)
def q03_join_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(
            _cents_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@query(
    "q04_full_outer_subaggs",
    oracle="""
    WITH t AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
             CAST(month(o_orderdate) AS BIGINT) AS order_month,
             COUNT(*) AS total_orders
      FROM orders GROUP BY 1, 2
    ), a AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
             CAST(month(o_orderdate) AS BIGINT) AS order_month,
             COUNT(*) AS urgent_orders
      FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1, 2
    )
    SELECT t.order_year, t.order_month, t.total_orders, a.urgent_orders
    FROM t FULL OUTER JOIN a
      ON t.order_year = a.order_year AND t.order_month = a.order_month
    """,
    survey_rows=("J3", "A11", "A8"),
    doc="FULL OUTER join of filtered sub-aggregates on a composite key, "
    "projecting the LEFT side's group keys — preserves the NULL-group-key "
    "quirk of workfile_populate_data_warehouse.py:522-619 (SURVEY §2.10(1)).",
)
def q04_full_outer_subaggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    keys = [
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
    ]
    t = o.groupBy(*keys).agg(F.count(F.lit(1)).alias("total_orders")).alias("t")
    a = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("urgent_orders"))
        .alias("a")
    )
    cond = (F.col("t.order_year") == F.col("a.order_year")) & (
        F.col("t.order_month") == F.col("a.order_month")
    )
    return t.join(a, cond, "full").select(
        F.col("t.order_year").alias("order_year"),
        F.col("t.order_month").alias("order_month"),
        "t.total_orders",
        "a.urgent_orders",
    )


@query(
    "q05_left_join_distinct_dim",
    oracle="""
    SELECT d.c_mktsegment, COUNT(*) AS orders_cnt
    FROM orders o
    LEFT JOIN (SELECT DISTINCT c_custkey, c_mktsegment FROM customer) d
      ON o.o_custkey = d.c_custkey
    GROUP BY d.c_mktsegment
    """,
    survey_rows=("J6", "A10", "A1"),
    doc="LEFT join to a deduped dimension before aggregating — the "
    "distinct-before-join row-explosion guard of "
    "workfile_design_data_warehouse.sql:545-548.",
)
def q05_left_join_distinct_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment").distinct()
    return (
        o.join(F.broadcast(d), o.o_custkey == d.c_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("orders_cnt"))
    )


@query(
    "q06_scalar_subquery",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS above_avg_cnt
    FROM lineitem
    WHERE l_quantity > (
      SELECT SUM(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 / COUNT(*)
      FROM lineitem)
    GROUP BY l_returnflag
    """,
    survey_rows=("J9", "A6"),
    doc="Uncorrelated scalar subquery as a predicate operand — "
    "workfile_ad-hoc_analysis.sql:140, 183-187. DataFrame idiom: crossJoin "
    "of a 1-row aggregate (broadcast nested-loop).",
)
def q06_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    avg_qty = li.agg(
        (_cents_sum(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.crossJoin(F.broadcast(avg_qty))
        .filter(F.col("l_quantity") > F.col("avg_qty"))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("above_avg_cnt"))
    )


# ---------------------------------------------------------------------------
# Window functions (SURVEY §2.5)
# ---------------------------------------------------------------------------


@query(
    "q07_dedup_row_number",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n_orders,
           SUM(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty
    FROM (
      SELECT * FROM lineitem
      QUALIFY row_number() OVER (
        PARTITION BY l_orderkey
        ORDER BY l_linenumber DESC, l_partkey, l_suppkey, l_quantity, l_extendedprice) = 1
    )
    GROUP BY l_returnflag
    """,
    survey_rows=("W1", "W7", "P11"),
    doc="ROW_NUMBER dedup, one row per key (the QUALIFY idiom) — "
    "workfile_design_data_warehouse.sql:265-266 keeps one snapshot row per "
    "(id, filename).",
)
def q07_dedup_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_linenumber"), "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    return (
        li.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _cents_sum(F.col("l_quantity")).alias("sum_qty"),
        )
    )


@query(
    "q08_rank_ties_per_group",
    oracle="""
    SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_custkey,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal
    FROM customer
    QUALIFY rank() OVER (
      PARTITION BY c_nationkey ORDER BY round(c_acctbal, 0) DESC) = 1
    """,
    survey_rows=("W3", "W7", "P11"),
    doc="RANK()=1 per group keeping ties — workfile_ad-hoc_analysis.sql:77 "
    "(best listing type per LGA; report p8-10's golden table keeps all tied "
    "rows). Ranking on rounded balance manufactures real ties.",
)
def q08_rank_ties_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc(F.round("c_acctbal", 0)))
    return (
        c.withColumn("__rk", F.rank().over(w))
        .filter(F.col("__rk") == 1)
        .select(
            F.col("c_nationkey").cast("long").alias("c_nationkey"),
            "c_custkey",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
        )
    )


@query(
    "q09_lag_mom_change",
    oracle="""
    WITH m AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
             CAST(month(o_orderdate) AS BIGINT) AS order_month,
             COUNT(*) AS n_orders
      FROM orders GROUP BY 1, 2
    )
    SELECT order_year, order_month, n_orders,
           lag(n_orders) OVER (ORDER BY order_year, order_month) AS prev_orders,
           100 * (n_orders - lag(n_orders) OVER (ORDER BY order_year, order_month))
               / lag(n_orders) OVER (ORDER BY order_year, order_month)
               AS pct_change
    FROM m
    """,
    survey_rows=("W4", "F5", "F10", "A8"),
    doc="LAG of an aggregate for month-over-month % change — "
    "workfile_populate_data_warehouse.py:569-570, 540-544 (first month NULL "
    "preserved, SURVEY §2.10(4)). Pre-aggregated before the global window so "
    "the single-partition sort sees ~84 rows, not the base table.",
)
def q09_lag_mom_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    w = Window.orderBy("order_year", "order_month")
    prev = F.lag("n_orders").over(w)
    return m.select(
        "order_year",
        "order_month",
        "n_orders",
        prev.alias("prev_orders"),
        (F.lit(100) * (F.col("n_orders") - prev) / prev).alias("pct_change"),
    )


@query(
    "q10_windowed_share",
    oracle="""
    SELECT c_custkey,
           CAST(c_nationkey AS BIGINT) AS c_nationkey,
           CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE)
             / CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                    OVER (PARTITION BY c_nationkey) AS DOUBLE) AS nation_share
    FROM customer
    """,
    survey_rows=("W5", "W6"),
    doc="Windowed SUM ratio-to-group (unbounded default frame) — the "
    "largest-area-share rule of workfile_design_data_warehouse.sql:174 and "
    "the per-host share windows of workfile_ad-hoc_analysis.sql:90-104, "
    "141-144.",
)
def q10_windowed_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey")
    bal = _dec(F.col("c_acctbal"))
    return c.select(
        "c_custkey",
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        (bal.cast("double") / F.sum(bal).over(w).cast("double")).alias("nation_share"),
    )


@query(
    "q20_largest_share_owner",
    oracle="""
    WITH per AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 AS total_qty
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT l_partkey, l_suppkey, total_qty
    FROM per
    QUALIFY row_number() OVER (
      PARTITION BY l_partkey ORDER BY total_qty DESC, l_suppkey) = 1
    """,
    survey_rows=("W1", "W5", "P11", "A8"),
    doc="Assign each entity to the owner of its largest share — the "
    "suburb->LGA largest-area resolution rule of "
    "workfile_design_data_warehouse.sql:174-181 (report p4).",
)
def q20_largest_share_owner(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_partkey", "l_suppkey").agg(
        _cents_sum(F.col("l_quantity")).alias("total_qty")
    )
    w = Window.partitionBy("l_partkey").orderBy(F.desc("total_qty"), "l_suppkey")
    return per.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


# ---------------------------------------------------------------------------
# Sorts / limits / top-k (SURVEY §2.6)
# ---------------------------------------------------------------------------


@query(
    "q21_global_topk",
    oracle="""
    SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS c_acctbal
    FROM customer
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 5
    """,
    survey_rows=("O1", "O2", "O3"),
    doc="Global ORDER BY ... LIMIT k -> TakeOrderedAndProject (no full sort, "
    "no shuffle-to-one) — workfile_ad-hoc_analysis.sql:58-59 top-5 LGAs.",
)
def q21_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", "c_name", F.col("c_acctbal").cast("double").alias("c_acctbal"))
        .orderBy(F.desc("c_acctbal"), "c_custkey")
        .limit(5)
    )


# ---------------------------------------------------------------------------
# Projections / filters / CASE (SURVEY §2.2)
# ---------------------------------------------------------------------------


@query(
    "q02_filter_projection",
    oracle="""
    SELECT l_orderkey,
           CAST(l_linenumber AS BIGINT) AS l_linenumber,
           CAST(l_quantity AS DOUBLE)   AS l_quantity,
           l_returnflag, l_linestatus,
           CAST(l_shipdate AS DATE)::VARCHAR AS shipdate
    FROM lineitem
    WHERE l_returnflag = 'R'
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
      AND l_quantity IS NOT NULL
    """,
    survey_rows=("P1", "P6", "P7", "P9", "F8", "O1"),
    doc="Pushed-down filters + pruned projection: equality flag filter "
    "(workfile_populate_data_warehouse.py:580), date-range validity window "
    "(workfile_design_data_warehouse.sql:543), IS NOT NULL "
    "(workfile_design_data_warehouse.sql:459).",
)
def q02_filter_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag") == "R")
        & F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1996-12-31").cast("timestamp")
        )
        & F.col("l_quantity").isNotNull()
    ).select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.col("l_quantity").cast("double").alias("l_quantity"),
        "l_returnflag",
        "l_linestatus",
        F.col("l_shipdate").cast("date").cast("string").alias("shipdate"),
    )


@query(
    "q14_case_ladder",
    oracle="""
    SELECT CASE WHEN o_orderpriority = '1-URGENT'        THEN 'critical'
                WHEN o_orderpriority = '2-HIGH'          THEN 'elevated'
                WHEN o_orderpriority = '1-URGENT'        THEN 'shadowed-duplicate'
                WHEN o_orderpriority = '3-MEDIUM'        THEN 'standard'
                WHEN o_orderpriority IS NULL             THEN 'missing'
                ELSE 'routine' END AS priority_tier,
           COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
    survey_rows=("P3", "P4"),
    doc="Order-sensitive CASE WHEN ladder with a duplicated branch (first "
    "match wins) — the suburb->LGA fallback ladders of "
    "workfile_design_data_warehouse.sql:473-541, incl. the duplicate-branch "
    "quirk SURVEY §2.10(5).",
)
def q14_case_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    p = F.col("o_orderpriority")
    tier = (
        F.when(p == "1-URGENT", "critical")
        .when(p == "2-HIGH", "elevated")
        .when(p == "1-URGENT", "shadowed-duplicate")
        .when(p == "3-MEDIUM", "standard")
        .when(p.isNull(), "missing")
        .otherwise("routine")
    )
    return o.groupBy(tier.alias("priority_tier")).agg(F.count(F.lit(1)).alias("n"))


@query(
    "q18_try_cast_price",
    oracle="""
    WITH priced AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN '$1,234.56'
                  WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE '$' || CAST(o_orderkey % 900 + 100 AS VARCHAR) || '.25'
             END AS price_raw
      FROM orders
    )
    SELECT COUNT(*)                                          AS n_rows,
           COUNT(TRY_CAST(list_extract(str_split(price_raw, '$'), -1)
                          AS DECIMAL(10,2)))                 AS n_parsed,
           CAST(SUM(TRY_CAST(list_extract(str_split(price_raw, '$'), -1)
                             AS DECIMAL(10,2))) AS DOUBLE)   AS sum_parsed
    FROM priced
    """,
    survey_rows=("P2", "F1"),
    doc="TRY_CAST price parse after split_part('$', -1): comma-formatted "
    "prices yield NULL and drop out of the sum — the load-bearing "
    "design-accident of workfile_design_data_warehouse.sql:228 + 459 "
    "(SURVEY §2.10(2)).",
)
def q18_try_cast_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    price_raw = (
        F.when(k % 5 == 0, F.lit("$1,234.56"))
        .when(k % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("$"), (k % 900 + 100).cast("string"), F.lit(".25")))
    )
    parsed = F.split_part(price_raw, F.lit("$"), F.lit(-1)).try_cast("decimal(10,2)")
    return o.select(parsed.alias("p")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("p").alias("n_parsed"),
        F.sum("p").cast("double").alias("sum_parsed"),
    )


# ---------------------------------------------------------------------------
# Scalar functions (SURVEY §2.8)
# ---------------------------------------------------------------------------


@query(
    "q15_string_functions",
    oracle="""
    SELECT p_partkey,
           upper(trim(replace(replace(p_name, 'red', 'crimson'),
                              'small', 'st'))) AS cleaned_name,
           list_extract(str_split(p_name, ' '), -1) AS last_word,
           CAST(list_extract(str_split(c.c_name, '#'), 2) AS BIGINT) AS cust_num
    FROM part p JOIN customer c ON p.p_partkey % 1500 = c.c_custkey
    WHERE p.p_name LIKE '%wid%' OR p.p_name LIKE 'red%'
    """,
    survey_rows=("F1", "F2", "F3", "F4", "P10"),
    doc="SPLIT_PART (incl. negative index), UPPER/TRIM, nested REPLACE "
    "chain, LIKE — workfile_design_data_warehouse.sql:172-173, 228, "
    "451-455, 488, 501.",
)
def q15_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.dialect import multi_replace, split_part

    p = load_table(spark, sf_dir, "part")
    c = load_table(spark, sf_dir, "customer")
    return (
        p.filter(F.col("p_name").like("%wid%") | F.col("p_name").like("red%"))
        .join(F.broadcast(c), p.p_partkey % 1500 == c.c_custkey)
        .select(
            "p_partkey",
            F.upper(
                F.trim(multi_replace(F.col("p_name"), [("red", "crimson"), ("small", "st")]))
            ).alias("cleaned_name"),
            split_part(F.col("p_name"), " ", -1).alias("last_word"),
            split_part(F.col("c_name"), "#", 2).cast("long").alias("cust_num"),
        )
    )


@query(
    "q16_date_functions",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT)  AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_month,
           CAST(make_date(CAST(year(o_orderdate) AS INT),
                          CAST(month(o_orderdate) AS INT), 1) AS VARCHAR)
                                              AS month_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
           COUNT(*) AS n_orders
    FROM orders
    WHERE CAST(o_orderdate AS DATE)
          BETWEEN make_date(CAST(year(o_orderdate) AS INT),
                            CAST(month(o_orderdate) AS INT), 1)
              AND last_day(CAST(o_orderdate AS DATE))
    GROUP BY 1, 2, 3, 4
    """,
    survey_rows=("F5", "F6", "F7", "F8", "P9"),
    doc="YEAR/MONTH extraction, DATE_FROM_PARTS (make_date), LAST_DAY, and "
    "the inclusive month-window validity filter — "
    "workfile_design_data_warehouse.sql:447, 456-457, 543 (SURVEY §2.10(7)).",
)
def q16_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    month_start = F.make_date(F.year(d), F.month(d), F.lit(1))
    return (
        o.filter(d.between(month_start, F.last_day(d)))
        .groupBy(
            F.year(d).cast("long").alias("order_year"),
            F.month(d).cast("long").alias("order_month"),
            month_start.cast("string").alias("month_start"),
            F.last_day(d).cast("string").alias("month_end"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# Set operations / harmonization (SURVEY §2.7)
# ---------------------------------------------------------------------------


@query(
    "q17_union_by_name",
    oracle="""
    SELECT entity_type, entity_key, acctbal, segment, COUNT(*) AS n
    FROM (
      SELECT 'customer' AS entity_type, c_custkey AS entity_key,
             CAST(c_acctbal AS DOUBLE) AS acctbal, c_mktsegment AS segment
      FROM customer
      UNION ALL BY NAME
      SELECT 'supplier' AS entity_type, CAST(s_suppkey AS BIGINT) AS entity_key,
             CAST(s_acctbal AS DOUBLE) AS acctbal, NULL AS segment
      FROM supplier
    )
    GROUP BY 1, 2, 3, 4
    """,
    survey_rows=("§2.7",),
    doc="unionByName(allowMissingColumns=True) schema harmonization — the "
    "Spark equivalent of the notebook's cross-file column alignment "
    "(workfile_preprocess.ipynb cells 11-17, SURVEY §2.7).",
)
def q17_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("entity_type"),
        F.col("c_custkey").alias("entity_key"),
        F.col("c_acctbal").cast("double").alias("acctbal"),
        F.col("c_mktsegment").alias("segment"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("entity_type"),
        F.col("s_suppkey").cast("long").alias("entity_key"),
        F.col("s_acctbal").cast("double").alias("acctbal"),
    )
    return (
        c.unionByName(s, allowMissingColumns=True)
        .groupBy("entity_type", "entity_key", "acctbal", "segment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Scans / sources / catalog (SURVEY §2.1)
# ---------------------------------------------------------------------------


@query(
    "q24_file_lineage",
    oracle="""
    SELECT split_part(filename, '/', -1) AS source_file,
           COUNT(*) AS n_rows
    FROM read_parquet('/root/testdata/sf0.01/lineitem.parquet', filename=true)
    GROUP BY 1
    """,
    survey_rows=("S3", "F1"),
    doc="File-metadata lineage column: SPLIT_PART(metadata$filename,'/',-1) "
    "-> F.input_file_name() (workfile_design_data_warehouse.sql:263). The "
    "oracle hardcodes the sf0.01 path because DuckDB's filename pseudo-column "
    "needs read_parquet(...) directly (t2 always runs at sf0.01).",
)
def q24_file_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.dialect import split_part

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        split_part(F.input_file_name(), "/", -1).alias("source_file")
    ).agg(F.count(F.lit(1)).alias("n_rows"))


@query(
    "q25_sql_view_catalog",
    oracle="""
    WITH high_value_orders AS (
      SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price_dec
      FROM orders WHERE o_totalprice > 200000
    )
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(price_dec) AS DOUBLE) AS sum_price
    FROM high_value_orders v JOIN orders o USING (o_orderkey)
    GROUP BY o_orderstatus
    """,
    survey_rows=("S8", "S12", "P6"),
    doc="CREATE OR REPLACE VIEW + querying through the catalog with Spark "
    "SQL — the datamart view layer (workfile_populate_data_warehouse.py:507, "
    "628, 747, 886; SURVEY §2.1 S12).",
)
def q25_sql_view_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_src")
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW high_value_orders AS
        SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price_dec
        FROM __orders_src WHERE o_totalprice > 200000
        """
    )
    return spark.sql(
        """
        SELECT o.o_orderstatus,
               COUNT(*) AS n,
               CAST(SUM(v.price_dec) AS DOUBLE) AS sum_price
        FROM high_value_orders v JOIN __orders_src o ON v.o_orderkey = o.o_orderkey
        GROUP BY o.o_orderstatus
        """
    )


@query(
    "q26_salted_skew_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
    survey_rows=("A1", "A3", "A5", "SCALE-skew"),
    doc="Two-phase salted aggregation over a 3-value (maximally hot) group "
    "key — results exactly equal a direct groupBy; the salt spreads each "
    "hot key over 16 reducers (operators/skew.py). The scale answer to the "
    "reference's hot suburb keys (SURVEY §4.2).",
)
def q26_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_agg

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "qty_dec", F.col("l_quantity").cast("decimal(18,2)")
    )
    out = salted_agg(
        li,
        group_keys=["l_returnflag"],
        salt_source=["l_orderkey"],
        aggs={
            "sum_qty": ("sum", "qty_dec"),
            "n": ("count", "l_orderkey"),
            "max_price": ("max", "l_extendedprice"),
        },
    )
    return out.select(
        "l_returnflag",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        "n",
        F.col("max_price").cast("double").alias("max_price"),
    )


@query(
    "q27_salted_count_distinct",
    oracle="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_distinct
    FROM orders GROUP BY o_orderstatus
    """,
    survey_rows=("A2", "SCALE-skew"),
    doc="Exact COUNT(DISTINCT) via dedupe-then-count (two spread shuffles, "
    "no hot-key reducer) — equal to the direct form, shaped for scale.",
)
def q27_salted_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_count_distinct

    o = load_table(spark, sf_dir, "orders")
    return salted_count_distinct(o, ["o_orderstatus"], "o_custkey")


@query(
    "q28_approx_sketch_aggregates",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           COUNT(DISTINCT l_orderkey) AS n_orders_exact,
           CAST(CASE WHEN abs(approx_count_distinct(l_orderkey)
                             - COUNT(DISTINCT l_orderkey))
                          <= 0.05 * COUNT(DISTINCT l_orderkey)
                THEN 1 ELSE 0 END AS BIGINT) AS hll_ok,
           CAST(CASE WHEN abs(approx_quantile(l_extendedprice, 0.5)
                             - median(l_extendedprice))
                          <= 0.05 * median(l_extendedprice)
                THEN 1 ELSE 0 END AS BIGINT) AS approx_median_ok
    FROM lineitem GROUP BY l_returnflag
    """,
    survey_rows=("A2", "A7", "SCALE-sketch"),
    doc="The documented 100 TB opt-ins (SURVEY §4.3): approx_count_distinct "
    "(HLL) and percentile_approx replacing exact distinct/median. "
    "Bounded-error oracle: sketch values are engine-specific, so each "
    "engine checks ITS OWN sketch against its own exact aggregate "
    "(|approx-exact| <= 5% relative) and emits the pass flag plus the "
    "exact distinct count — every column hash-matches cross-engine while "
    "still gating the sketch error contract.",
)
def q28_approx_sketch_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two single-purpose aggregates joined on the 3-row group key instead of
    # one combined agg: countDistinct + percentile in the same GROUP BY
    # forces an Expand (row duplication per distinct-aggregate) and was
    # ~20 s at sf0.1; split, it's ~1 s. Percentiles run over integer cents
    # (exact, associative, cheap comparator — the q11 pattern).
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "__cents", half_up_long(F.col("l_extendedprice") * 100)
    )
    counts = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("l_orderkey").alias("n_orders_exact"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("__hll"),
    )
    medians = li.groupBy("l_returnflag").agg(
        F.expr("percentile(__cents, 0.5)").alias("__med"),
        F.percentile_approx("__cents", F.lit(0.5), F.lit(10000)).alias("__amed"),
    )
    return counts.join(medians, "l_returnflag").select(
        "l_returnflag",
        "n",
        "n_orders_exact",
        (F.abs(F.col("__hll") - F.col("n_orders_exact")) <= 0.05 * F.col("n_orders_exact"))
        .cast("long")
        .alias("hll_ok"),
        (F.abs(F.col("__amed") - F.col("__med")) <= 0.05 * F.col("__med"))
        .cast("long")
        .alias("approx_median_ok"),
    )


@query(
    "q29_topk_join_rank_detail",
    oracle="""
    WITH top3 AS (
      SELECT n.n_name,
             SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0
               AS nation_revenue
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n ON c_nationkey = n_nationkey
      GROUP BY n.n_name
      ORDER BY nation_revenue DESC, n.n_name
      LIMIT 3
    ), detail AS (
      SELECT n.n_name, l_returnflag,
             SUM(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 AS flag_qty
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n ON c_nationkey = n_nationkey
      GROUP BY n.n_name, l_returnflag
    )
    SELECT d.n_name, d.l_returnflag, d.flag_qty, t.nation_revenue
    FROM top3 t LEFT JOIN detail d ON t.n_name = d.n_name
    QUALIFY rank() OVER (PARTITION BY t.n_name ORDER BY d.flag_qty DESC) = 1
    """,
    survey_rows=("J8", "W3", "O3", "A5"),
    doc="Top-k aggregate joined back to a finer aggregate of the same "
    "source, RANK()=1 keeping ties — the exact shape of ad-hoc query b "
    "(workfile_ad-hoc_analysis.sql:50-78: top-5 LGAs -> best listing type).",
)
def q29_topk_join_rank_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    top3 = (
        base.groupBy("n_name")
        .agg(
            _cents_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "nation_revenue"
            )
        )
        .orderBy(F.desc("nation_revenue"), "n_name")
        .limit(3)
    )
    detail = base.groupBy("n_name", "l_returnflag").agg(
        _cents_sum(F.col("l_quantity")).alias("flag_qty")
    )
    t, d = top3.alias("t"), detail.alias("d")
    joined = t.join(d, F.col("t.n_name") == F.col("d.n_name"), "left")
    w = Window.partitionBy(F.col("t.n_name")).orderBy(F.desc("flag_qty"))
    return (
        joined.withColumn("__rk", F.rank().over(w))
        .filter(F.col("__rk") == 1)
        .select(
            F.col("d.n_name").alias("n_name"),
            "d.l_returnflag",
            "flag_qty",
            F.col("t.nation_revenue").alias("nation_revenue"),
        )
    )


@query(
    "q30_dedup_max_by",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n_orders,
           SUM(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty
    FROM (
      SELECT * FROM lineitem
      QUALIFY row_number() OVER (
        PARTITION BY l_orderkey
        ORDER BY l_linenumber DESC, l_partkey, l_suppkey, l_quantity, l_extendedprice) = 1
    )
    GROUP BY l_returnflag
    """,
    survey_rows=("W1", "O4", "SCALE-dedup"),
    doc="Same dedup semantics as q07 but as a hash aggregate: "
    "max(struct(sort_keys..., payload)) per key replaces the window "
    "sort-shuffle — partial aggregation halves the shuffled volume and no "
    "per-partition sort is needed. The at-scale form of top-1-per-group "
    "when only the winner's payload matters.",
)
def q30_dedup_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # ordering struct: descending keys negated so plain max() picks the
    # reference ordering's winner; payload fields ride behind the sort keys
    winner = F.max(
        F.struct(
            F.col("l_linenumber").alias("k1"),
            (-F.col("l_partkey")).alias("k2"),
            (-F.col("l_suppkey")).alias("k3"),
            (-F.col("l_quantity")).alias("k4"),
            (-F.col("l_extendedprice")).alias("k5"),
            F.col("l_returnflag").alias("flag"),
            half_up_long(F.col("l_quantity") * 100).alias("qty_cents"),
        )
    ).alias("w")
    return (
        li.groupBy("l_orderkey")
        .agg(winner)
        .groupBy(F.col("w.flag").alias("l_returnflag"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum("w.qty_cents") / 100.0).alias("sum_qty"),
        )
    )


@query(
    "q31_semi_anti_joins",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey
                       AND o.o_orderpriority = '1-URGENT'))  AS customers_with_urgent,
      (SELECT COUNT(*) FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey))   AS customers_without_orders
    """,
    survey_rows=("J-semi", "J-anti"),
    doc="LEFT SEMI / LEFT ANTI joins (EXISTS / NOT EXISTS). Not used by the "
    "reference but core engine surface — e.g. filtering documents against a "
    "blocklist is an anti join. Semi/anti never duplicate or widen rows, so "
    "the build side ships only join keys.",
)
def q31_semi_anti_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    with_urgent = c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi").agg(
        F.count(F.lit(1)).alias("customers_with_urgent")
    )
    without_orders = c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(
        F.count(F.lit(1)).alias("customers_without_orders")
    )
    return with_urgent.crossJoin(without_orders)


@query(
    "q32_rollup_hierarchy",
    oracle="""
    SELECT n_name, o_orderstatus, COUNT(*) AS n,
           CAST(grouping(n_name) AS BIGINT) AS g_nation,
           CAST(grouping(o_orderstatus) AS BIGINT) AS g_status
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, o_orderstatus)
    """,
    survey_rows=("A-rollup",),
    doc="ROLLUP hierarchy totals (nation -> status -> grand total) with "
    "GROUPING markers disambiguating real NULL keys from subtotal rows. "
    "Beyond the reference's surface; one pass, Expand + hash aggregate.",
)
def q32_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.grouping("n_name").cast("long").alias("g_nation"),
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
        )
    )


@query(
    "q34_intersect_except",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM (
         SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
         INTERSECT
         SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'))
        AS custs_with_both,
      (SELECT COUNT(*) FROM (
         SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
         EXCEPT
         SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'))
        AS custs_f_only
    """,
    survey_rows=("SET-intersect", "SET-except"),
    doc="INTERSECT / EXCEPT set operations (unused by the reference — "
    "SURVEY §2.7 — but core engine surface). Both compile to aggregate + "
    "join, not row-by-row set logic.",
)
def q34_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    both = f.intersect(op).agg(F.count(F.lit(1)).alias("custs_with_both"))
    f_only = f.exceptAll(op).agg(F.count(F.lit(1)).alias("custs_f_only"))
    return both.crossJoin(f_only)


@query(
    "q35_pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS status_F,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS status_O,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS status_P
    FROM orders GROUP BY o_orderpriority
    """,
    survey_rows=("A-pivot",),
    doc="PIVOT (long -> wide) with an explicit value list — compiles to "
    "a single conditional aggregation, no extra shuffle vs plain groupBy.",
)
def q35_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("status_F"),
            F.coalesce("O", F.lit(0)).alias("status_O"),
            F.coalesce("P", F.lit(0)).alias("status_P"),
        )
    )


@query(
    "q37_month_spine_gap_fill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
             date_trunc('month', MAX(o_orderdate)) AS hi
      FROM orders WHERE o_orderstatus = 'P'
    ), spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS month_start
      FROM bounds
    ), monthly AS (
      SELECT date_trunc('month', o_orderdate) AS month_start, COUNT(*) AS n
      FROM orders WHERE o_orderstatus = 'P' GROUP BY 1
    )
    SELECT CAST(CAST(s.month_start AS DATE) AS VARCHAR) AS month,
           COALESCE(m.n, 0) AS n_orders,
           lag(COALESCE(m.n, 0)) OVER (ORDER BY s.month_start) AS prev_n
    FROM spine s LEFT JOIN monthly m ON s.month_start = m.month_start
    """,
    survey_rows=("W4", "EXT-timeseries"),
    doc="Month-spine gap fill: generate the complete month sequence "
    "(F.sequence + explode), left-join sparse monthly counts, zero-fill — "
    "so LAG sees every month. Fixes the reference LAG's silent gap-skipping "
    "(kpi_view docstring) for sparse groups like 'P'-status orders.",
)
def q37_month_spine_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    bounds = o.agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))).alias("month_start")
    )
    monthly = o.groupBy(F.date_trunc("month", "o_orderdate").alias("month_start")).agg(
        F.count(F.lit(1)).alias("n")
    )
    from pyspark.sql import Window

    filled = (
        spine.join(monthly, "month_start", "left")
        .select(
            F.col("month_start").cast("date").cast("string").alias("month"),
            F.coalesce("n", F.lit(0)).alias("n_orders"),
            F.col("month_start"),
        )
    )
    w = Window.orderBy("month_start")
    return filled.select(
        "month", "n_orders", F.lag("n_orders").over(w).alias("prev_n")
    )


@query(
    "q38_lateral_top2_per_customer",
    oracle="""
    SELECT c_custkey, o.o_orderkey, CAST(o.o_totalprice AS DOUBLE) AS price
    FROM customer,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey = c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
    """,
    survey_rows=("J-lateral", "O4"),
    doc="Correlated LATERAL subquery with per-row ORDER BY/LIMIT (top-2 "
    "orders per customer) — the join-form alternative to window top-k; "
    "Catalyst decorrelates it into a ranked join.",
)
def q38_lateral_top2_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tpch import register_tables

    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, o.o_orderkey, CAST(o.o_totalprice AS DOUBLE) AS price
        FROM customer,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        """
    )


@query(
    "q39_snowflake_dialect_frontend",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
      FROM orders
      QUALIFY row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) = 1
    )
    SELECT CAST(year(make_date(1995, 1, 1)) AS BIGINT) AS anchor_year,
           COUNT(*) AS n_customers,
           SUM(CAST(round(price * 100) AS BIGINT)) / 100.0 AS sum_best_price
    FROM ranked
    """,
    survey_rows=("P11", "W1", "F6", "DIALECT"),
    doc="Executes reference-dialect (Snowflake-flavored) SQL text through "
    "functions/snowflake_sql.run: QUALIFY rewritten into a nested window "
    "filter, DATE_FROM_PARTS -> make_date, ::casts native — the front-end "
    "that lets the reference's own analytical SQL run unchanged.",
)
def q39_snowflake_dialect_frontend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.snowflake_sql import run
    from ..sources.tpch import register_tables

    register_tables(spark, sf_dir)
    return run(
        spark,
        """
        WITH ranked AS (
          SELECT o_custkey, o_orderkey, o_totalprice::DOUBLE AS price
          FROM orders
          QUALIFY row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) = 1
        )
        SELECT YEAR(DATE_FROM_PARTS(1995, 1, 1))::BIGINT AS anchor_year,
               COUNT(*) AS n_customers,
               SUM(round(price * 100)::BIGINT) / 100.0D AS sum_best_price
        FROM ranked
        """,
    )


@query(
    "q40_moving_average_rows_frame",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day, COUNT(*) AS n
      FROM orders WHERE o_orderdate < TIMESTAMP '1995-04-01' GROUP BY 1
    )
    SELECT day, n,
           CAST(avg(n) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS ma7,
           first_value(n) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               AS window_first,
           last_value(n)  OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               AS window_last
    FROM daily
    """,
    survey_rows=("W-frames",),
    doc="Explicit ROWS BETWEEN frame: 7-day moving average + "
    "first_value/last_value — the frame surface beyond the reference's "
    "default-frame windows (SURVEY §2.5). The average is computed as "
    "sum/count of exact bigints divided as doubles so both engines "
    "produce identical bits.",
)
def q40_moving_average_rows_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp")
    )
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").cast("string").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "day",
        "n",
        (F.sum("n").over(w) / F.count("n").over(w)).cast("double").alias("ma7"),
        F.first("n").over(w).alias("window_first"),
        F.last("n").over(w).alias("window_last"),
    )


@query(
    "q41_trailing_range_frame",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
      FROM events WHERE user_id < 20
    )
    SELECT user_id, sec,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY sec
                          RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
               AS trailing_1h_events
    FROM e
    """,
    survey_rows=("W-frames", "§2.9"),
    doc="Time-based RANGE frame: per-event trailing-1-hour activity count "
    "per user (epoch-second range frame) — per-row sliding aggregates that "
    "tumbling windows can't express.",
)
def q41_trailing_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    e = ev.select("user_id", F.unix_timestamp("ts").alias("sec"))
    w = Window.partitionBy("user_id").orderBy("sec").rangeBetween(-3600, 0)
    return e.select(
        "user_id", "sec", F.count(F.lit(1)).over(w).alias("trailing_1h_events")
    )


@query(
    "q42_quartiles_array",
    oracle="""
    SELECT l_returnflag,
           array_to_string(list_transform(
               quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT),
                             [0.25, 0.5, 0.75]),
               q -> CAST(q / 100.0 AS VARCHAR)), ',') AS quartiles
    FROM lineitem GROUP BY l_returnflag
    """,
    survey_rows=("A7",),
    doc="Multi-quantile aggregation (25/50/75th percentile in one pass) over "
    "integer cents, string-joined for cross-engine hashing.",
)
def q42_quartiles_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cents = half_up_long(F.col("l_extendedprice") * 100)
    qs = F.percentile(cents, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return li.groupBy("l_returnflag").agg(
        F.array_join(
            F.transform(qs, lambda q: (q / 100.0).cast("string")), ","
        ).alias("quartiles")
    )


@query(
    "q43_null_safe_join",
    oracle="""
    WITH a AS (
      SELECT CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderpriority END AS grp,
             COUNT(*) AS n_a
      FROM orders GROUP BY 1
    ), b AS (
      SELECT CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderpriority END AS grp,
             COUNT(DISTINCT o_custkey) AS n_b
      FROM orders GROUP BY 1
    )
    SELECT a.grp, n_a, n_b
    FROM a JOIN b ON a.grp IS NOT DISTINCT FROM b.grp
    """,
    survey_rows=("J-nullsafe",),
    doc="Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL group keys "
    "match each other — the opt-in fix for the FULL-JOIN NULL-key quirk "
    "(SURVEY §2.10(1)) when a pipeline wants NULL groups aligned instead "
    "of duplicated.",
)
def q43_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    grp = F.when(F.col("o_orderkey") % 3 == 0, F.lit(None)).otherwise(
        F.col("o_orderpriority")
    )
    a = o.groupBy(grp.alias("grp")).agg(F.count(F.lit(1)).alias("n_a")).alias("a")
    b = (
        o.groupBy(grp.alias("grp"))
        .agg(F.countDistinct("o_custkey").alias("n_b"))
        .alias("b")
    )
    return a.join(b, F.col("a.grp").eqNullSafe(F.col("b.grp"))).select(
        F.col("a.grp").alias("grp"), "n_a", "n_b"
    )


@query(
    "q44_string_function_breadth",
    oracle="""
    SELECT n_name,
           lpad(n_name, 20, '.')                       AS padded,
           substring(n_name, 2, 3)                     AS mid,
           CAST(strpos(n_name, 'A') AS BIGINT)         AS first_a,
           concat_ws('|', n_name, CAST(n_nationkey AS VARCHAR)) AS joined,
           translate(n_name, 'AEIOU', 'aeiou')         AS vowels_lower,
           reverse(n_name)                             AS rev,
           repeat('-', CAST(n_nationkey AS INT) % 4)   AS dashes,
           CAST(length(trim(BOTH ' ' FROM ('  ' || n_name || ' '))) AS BIGINT) AS trimmed_len
    FROM nation
    """,
    survey_rows=("F-strings",),
    doc="String-function breadth beyond the reference's surface: pad, "
    "substring, position, concat_ws, translate, reverse, repeat, "
    "BOTH-trim — all JVM codegen expressions.",
)
def q44_string_function_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_name",
        F.lpad("n_name", 20, ".").alias("padded"),
        F.substring("n_name", 2, 3).alias("mid"),
        F.instr("n_name", "A").cast("long").alias("first_a"),
        F.concat_ws("|", "n_name", F.col("n_nationkey").cast("string")).alias("joined"),
        F.translate("n_name", "AEIOU", "aeiou").alias("vowels_lower"),
        F.reverse("n_name").alias("rev"),
        F.repeat(F.lit("-"), F.col("n_nationkey").cast("int") % 4).alias("dashes"),
        F.length(F.trim(F.concat(F.lit("  "), F.col("n_name"), F.lit(" "))))
        .cast("long")
        .alias("trimmed_len"),
    )


@query(
    "q45_conditional_expression_breadth",
    oracle="""
    SELECT o_orderpriority,
           COUNT(nullif(o_orderstatus, 'O'))                       AS non_open,
           COUNT(CASE WHEN o_totalprice BETWEEN 100000 AND 200000
                      THEN 1 END)                                  AS mid_price,
           CAST(MAX(greatest(o_totalprice, 150000.0)) AS DOUBLE)   AS max_floor,
           CAST(MIN(least(o_totalprice, 150000.0)) AS DOUBLE)      AS min_cap,
           COUNT(coalesce(nullif(o_orderstatus, 'P'), NULL))       AS not_pending
    FROM orders GROUP BY o_orderpriority
    """,
    survey_rows=("P-conditional",),
    doc="Conditional-expression breadth: NULLIF, COALESCE, LEAST/GREATEST, "
    "BETWEEN — composed under aggregates.",
)
def q45_conditional_expression_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.nullif(F.col("o_orderstatus"), F.lit("O"))).alias("non_open"),
        F.count(F.when(F.col("o_totalprice").between(100000, 200000), 1)).alias("mid_price"),
        F.max(F.greatest(F.col("o_totalprice"), F.lit(150000.0))).cast("double").alias("max_floor"),
        F.min(F.least(F.col("o_totalprice"), F.lit(150000.0))).cast("double").alias("min_cap"),
        F.count(F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit(None))).alias(
            "not_pending"
        ),
    )


@query(
    "q46_math_function_breadth",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(round(sqrt(l_extendedprice) * 1000) AS BIGINT)) AS BIGINT) AS sum_sqrt_milli,
           CAST(SUM(CAST(round(ln(l_extendedprice) * 1000000) AS BIGINT)) AS BIGINT) AS sum_ln_micro,
           CAST(SUM(CAST(abs(l_quantity - 25) AS BIGINT)) AS BIGINT)     AS sum_absdev,
           CAST(SUM(CAST(l_quantity AS BIGINT) % 7) AS BIGINT)           AS sum_mod7,
           CAST(SUM(CAST(ceil(l_discount * 10) AS BIGINT)) AS BIGINT)    AS sum_ceil,
           CAST(SUM(CAST(floor(l_discount * 10) AS BIGINT)) AS BIGINT)   AS sum_floor,
           CAST(SUM(CAST(sign(l_quantity - 25) AS BIGINT)) AS BIGINT)    AS sum_sign
    FROM lineitem GROUP BY l_returnflag
    """,
    survey_rows=("F-math",),
    doc="Math-function breadth: sqrt/ln/abs/mod/ceil/floor/sign — each "
    "rounded to integers BEFORE summing so cross-engine float reduction "
    "order cannot bite (sqrt/ln of identical doubles are bit-identical; "
    "their sums are not).",
)
def q46_math_function_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q, p, d = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")
    return li.groupBy("l_returnflag").agg(
        # arbitrary reals (sqrt/ln outputs): keep round() — half_up_long's
        # floor(x+.5) diverges at half-ulp-below-.5 inputs, whose density
        # here is data-dependent (round-13 ADVICE medium)
        F.sum(F.round(F.sqrt(p) * 1000, 0).cast("long")).alias("sum_sqrt_milli"),
        F.sum(F.round(F.log(p) * 1000000, 0).cast("long")).alias("sum_ln_micro"),
        F.sum(F.abs(q - 25).cast("long")).alias("sum_absdev"),
        F.sum(q.cast("long") % 7).alias("sum_mod7"),
        F.sum(F.ceil(d * 10).cast("long")).alias("sum_ceil"),
        F.sum(F.floor(d * 10).cast("long")).alias("sum_floor"),
        F.sum(F.signum(q - 25).cast("long")).alias("sum_sign"),
    )


@query(
    "q47_date_arithmetic_breadth",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
           COUNT(*) AS n,
           CAST(SUM(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01'))
                AS BIGINT)                                              AS sum_days_to_2002,
           CAST(MIN(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE)) AS VARCHAR)
                                                                        AS min_plus_30d,
           CAST(MAX(CAST(CAST(o_orderdate AS DATE) - INTERVAL 1 MONTH AS DATE)) AS VARCHAR)
                                                                        AS max_minus_1m,
           CAST(SUM(CAST(dayofweek(o_orderdate) + 1 AS BIGINT)) AS BIGINT) AS sum_dow,
           CAST(SUM(CAST(CAST(strftime(o_orderdate, '%j') AS INT) AS BIGINT)) AS BIGINT)
                                                                        AS sum_doy
    FROM orders GROUP BY 1
    """,
    survey_rows=("F-dates",),
    doc="Date-arithmetic breadth: datediff, +/- day and month intervals, "
    "day-of-week (Spark 1=Sunday vs DuckDB 0=Sunday, aligned in the oracle), day-of-year.",
)
def q47_date_arithmetic_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    dt = F.col("o_orderdate").cast("date")
    return o.groupBy(F.year("o_orderdate").cast("long").alias("y")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.datediff(F.lit("2002-01-01").cast("date"), dt).cast("long")).alias(
            "sum_days_to_2002"
        ),
        F.min(F.date_add(dt, 30)).cast("string").alias("min_plus_30d"),
        F.max(F.add_months(dt, -1)).cast("string").alias("max_minus_1m"),
        F.sum(F.dayofweek("o_orderdate").cast("long")).alias("sum_dow"),
        F.sum(F.dayofyear("o_orderdate").cast("long")).alias("sum_doy"),
    )


@query(
    "q51_unpivot_long_form",
    oracle="""
    WITH wide AS (
      SELECT o_orderpriority,
             COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS status_F,
             COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS status_O,
             COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS status_P
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, 'status_F' AS status, status_F AS n FROM wide
    UNION ALL
    SELECT o_orderpriority, 'status_O', status_O FROM wide
    UNION ALL
    SELECT o_orderpriority, 'status_P', status_P FROM wide
    """,
    survey_rows=("A-unpivot",),
    doc="UNPIVOT (wide -> long), the inverse of q35's PIVOT: the DataFrame "
    "unpivot API compiles to an Expand node (3 output rows per input, no "
    "shuffle beyond the feeding aggregate).",
)
def q51_unpivot_long_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("status_F"),
            F.coalesce("O", F.lit(0)).alias("status_O"),
            F.coalesce("P", F.lit(0)).alias("status_P"),
        )
    )
    return wide.unpivot(
        "o_orderpriority", ["status_F", "status_O", "status_P"], "status", "n"
    )


@query(
    "q52_percent_rank_cume_dist",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           percent_rank() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal, c_custkey) AS pr,
           cume_dist() OVER (PARTITION BY c_mktsegment
                             ORDER BY c_acctbal, c_custkey) AS cd
    FROM customer
    """,
    survey_rows=("W-distribution",),
    doc="Distribution window functions (percent_rank, cume_dist) per market "
    "segment with a (acctbal, custkey) total order so rank denominators are "
    "tie-free — small-integer ratios divide to identical doubles in both "
    "engines.",
)
def q52_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@query(
    "q54_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
           CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
           CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), (o_orderpriority), ())
    """,
    survey_rows=("A-rollup",),
    doc="Arbitrary GROUPING SETS (both 1-D margins + 2-D cells + grand "
    "total — a shape ROLLUP can't express) with GROUPING markers and exact "
    "cents accumulators. One pass: Expand (4 replicas) + hash aggregate "
    "with map-side partials; completes the q32 ROLLUP row of the "
    "multidimensional-aggregation family.",
)
def q54_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        _cents_sum_raw(F.col("o_totalprice")).alias("total_cents"),
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.grouping("o_orderpriority").cast("long").alias("g_priority"),
    )


@query(
    "q55_window_value_functions",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           o_orderpriority,
           CAST(first_value(o_orderkey) OVER wf AS BIGINT) AS first_k,
           CAST(last_value(o_orderkey) OVER wf AS BIGINT) AS last_k,
           CAST(nth_value(o_orderkey, 3) OVER wf AS BIGINT) AS third_k,
           CAST(lead(o_orderkey, 2, -1) OVER wo AS BIGINT) AS lead2_k,
           CAST(lag(o_orderkey, 2, -1) OVER wo AS BIGINT) AS lag2_k,
           CAST(ntile(4) OVER wo AS BIGINT) AS quartile
    FROM orders
    WHERE o_orderdate BETWEEN '1995-01-01' AND '1995-01-31'
    WINDOW wf AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
           wo AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey)
    """,
    survey_rows=("W-value",),
    doc="Window value-function breadth: first_value/last_value/nth_value "
    "over an explicit unbounded ROWS frame (default frames differ between "
    "engines: RANGE ... CURRENT ROW would make last_value the running last), "
    "lead/lag with offset 2 and a default, ntile. Total order "
    "(o_orderdate, o_orderkey) makes every output tie-free.",
)
def q55_window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1995-01-01", "1995-01-31")
    )
    wo = W.partitionBy("o_orderpriority").orderBy("o_orderdate", "o_orderkey")
    wf = wo.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    k = F.col("o_orderkey")
    return o.select(
        k.cast("long").alias("o_orderkey"),
        "o_orderpriority",
        F.first(k).over(wf).cast("long").alias("first_k"),
        F.last(k).over(wf).cast("long").alias("last_k"),
        F.nth_value(k, 3).over(wf).cast("long").alias("third_k"),
        F.lead(k, 2, -1).over(wo).cast("long").alias("lead2_k"),
        F.lag(k, 2, -1).over(wo).cast("long").alias("lag2_k"),
        F.ntile(4).over(wo).cast("long").alias("quartile"),
    )


@query(
    "q56_higher_order_array_functions",
    oracle="""
    WITH arrs AS (
      SELECT l_orderkey,
             list_sort(list(CAST(l_quantity AS BIGINT))) AS arr
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           CAST(len(arr) AS BIGINT) AS n_items,
           CAST(list_sum(arr) AS BIGINT) AS sum_qty,
           CAST(len(list_filter(arr, x -> x > 25)) AS BIGINT) AS n_large,
           CAST(arr[1] AS BIGINT) AS min_qty,
           CAST(arr[-1] AS BIGINT) AS max_qty,
           CAST(list_sum(list_transform(arr, x -> x * x)) AS BIGINT) AS sum_sq,
           CAST(list_sum(list_transform(range(1, len(arr) + 1),
                i -> arr[i] * arr[len(arr) - i + 1])) AS BIGINT) AS dot_rev
    FROM arrs
    """,
    survey_rows=("F-arrays",),
    doc="Higher-order array-function breadth over per-order quantity "
    "arrays: collect_list -> array_sort (the sort makes the collect order "
    "irrelevant), aggregate/fold, filter, transform, zip_with against the "
    "reversed array. All element arithmetic integral, so every engine "
    "agrees bit-for-bit. Scale shape: one groupBy building bounded "
    "per-order arrays (~7 items), then map-only array math.",
)
def q56_higher_order_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    arrs = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list(F.col("l_quantity").cast("long"))).alias("arr")
    )
    arr = F.col("arr")
    zero = F.lit(0).cast("long")
    return arrs.select(
        F.col("l_orderkey").cast("long").alias("l_orderkey"),
        F.size(arr).cast("long").alias("n_items"),
        F.aggregate(arr, zero, lambda a, x: a + x).alias("sum_qty"),
        F.size(F.filter(arr, lambda x: x > 25)).cast("long").alias("n_large"),
        F.element_at(arr, 1).alias("min_qty"),
        F.element_at(arr, -1).alias("max_qty"),
        F.aggregate(F.transform(arr, lambda x: x * x), zero, lambda a, x: a + x).alias(
            "sum_sq"
        ),
        F.aggregate(
            F.zip_with(arr, F.reverse(arr), lambda x, y: x * y), zero, lambda a, x: a + x
        ).alias("dot_rev"),
    )


@query(
    "q57_regexp_breadth",
    oracle="""
    SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS BIGINT) AS n_words,
           CAST(CASE WHEN regexp_matches(p_name, '^(red|blue|green)\\b')
                THEN 1 ELSE 0 END AS BIGINT) AS color_first,
           COALESCE(array_to_string(regexp_extract_all(p_name, '\\b[a-z]{5,}\\b'), ','),
                    '') AS long_words
    FROM part
    """,
    survey_rows=("F-regexp",),
    doc="Regexp breadth: anchored group extraction, match counting, "
    "boolean pattern test, extract-all joined to a stable string — all in "
    "the Java-regex/RE2 common subset (anchors, \\b, alternation, bounded "
    "classes). Map-only over the part dim.",
)
def q57_regexp_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    name = F.col("p_name")
    return p.select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        F.regexp_extract(name, r"([a-z]+)$", 1).alias("last_word"),
        F.regexp_count(name, F.lit(r"[a-z]+")).cast("long").alias("n_words"),
        F.when(name.rlike(r"^(red|blue|green)\b"), 1).otherwise(0).cast("long").alias(
            "color_first"
        ),
        F.array_join(F.regexp_extract_all(name, F.lit(r"\b[a-z]{5,}\b"), 0), ",").alias(
            "long_words"
        ),
    )


@query(
    "q58_correlated_scalar_subquery",
    oracle="""
    SELECT CAST(o1.o_custkey AS BIGINT) AS o_custkey,
           COUNT(*) AS n_above_own_avg
    FROM orders o1
    WHERE CAST(round(o1.o_totalprice * 100) AS BIGINT) >
          (SELECT AVG(CAST(round(o2.o_totalprice * 100) AS BIGINT))
           FROM orders o2 WHERE o2.o_custkey = o1.o_custkey)
    GROUP BY o1.o_custkey
    """,
    survey_rows=("J9", "A6"),
    doc="CORRELATED scalar subquery (each order compared to its own "
    "customer's average) — q06 is the uncorrelated J9 twin. Run through "
    "spark.sql so Catalyst performs the decorrelation rewrite: the "
    "subquery becomes a per-custkey aggregate joined back on the "
    "correlation key (one shuffle each side), NOT a per-row re-scan — "
    "which is precisely why the shape survives 100 TB. Averages are over "
    "exact cents (BIGINT sum / count = one double division, bit-stable).",
)
def q58_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_q58")
    return spark.sql(
        """
        SELECT CAST(o1.o_custkey AS BIGINT) AS o_custkey,
               COUNT(*) AS n_above_own_avg
        FROM orders_q58 o1
        WHERE CAST(round(o1.o_totalprice * 100) AS BIGINT) >
              (SELECT AVG(CAST(round(o2.o_totalprice * 100) AS BIGINT))
               FROM orders_q58 o2 WHERE o2.o_custkey = o1.o_custkey)
        GROUP BY o1.o_custkey
        """
    )


@query(
    "q59_intersect_except_all",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM (
         (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
         INTERSECT ALL
         (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')))
        AS multiset_common,
      (SELECT COUNT(*) FROM (
         (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
         EXCEPT ALL
         (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')))
        AS multiset_f_surplus
    """,
    survey_rows=("SET-intersect", "SET-except"),
    doc="Multiset INTERSECT ALL / EXCEPT ALL (bag semantics: per-key "
    "min/difference of multiplicities), completing q34's distinct-set "
    "row. Spark compiles both to a count-aggregate + generate replay, "
    "one shuffle per side.",
)
def q59_intersect_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    common = f.intersectAll(op).agg(F.count(F.lit(1)).alias("multiset_common"))
    surplus = f.exceptAll(op).agg(F.count(F.lit(1)).alias("multiset_f_surplus"))
    return common.crossJoin(surplus)


@query(
    "q60_recursive_cte_spine",
    oracle="""
    WITH RECURSIVE months(m) AS (
      SELECT DATE '1995-01-01'
      UNION ALL
      SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
      WHERE m < DATE '1996-12-01'
    ), per_month AS (
      SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS m, COUNT(*) AS n
      FROM orders GROUP BY 1
    )
    SELECT CAST(months.m AS VARCHAR) AS month,
           CAST(COALESCE(per_month.n, 0) AS BIGINT) AS n_orders
    FROM months LEFT JOIN per_month ON months.m = per_month.m
    """,
    survey_rows=("SET-union", "J6"),
    doc="WITH RECURSIVE (new engine surface in Spark 4): a recursive "
    "month spine (anchor + 23 recursive steps over 1995-1996) gap-filling order counts — "
    "the recursion-based twin of q37's sequence() spine. Each recursive "
    "step is a tiny local union; the real work stays in the one hash "
    "aggregate over orders. Recursion depth is bounded by the date "
    "predicate, so the plan is safe at any corpus scale (the spine is "
    "calendar-sized, not data-sized).",
)
def q60_recursive_cte_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_q60")
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
          SELECT DATE '1995-01-01'
          UNION ALL
          SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
          WHERE m < DATE '1996-12-01'
        ), per_month AS (
          SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS m, COUNT(*) AS n
          FROM orders_q60 GROUP BY 1
        )
        SELECT CAST(months.m AS STRING) AS month,
               CAST(COALESCE(per_month.n, 0) AS BIGINT) AS n_orders
        FROM months LEFT JOIN per_month ON months.m = per_month.m
        """
    )


@query(
    "q61_bitwise_breadth",
    oracle="""
    SELECT CAST(l_linenumber AS BIGINT) AS l_linenumber,
           COUNT(*) AS n,
           CAST(bit_and(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_bit_and,
           CAST(bit_or(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_bit_or,
           CAST(bit_xor(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_bit_xor,
           CAST(SUM(CAST(l_quantity AS BIGINT) & 7) AS BIGINT) AS sum_and7,
           CAST(SUM(CAST(l_quantity AS BIGINT) >> 2) AS BIGINT) AS sum_shr2,
           CAST(SUM(xor(CAST(l_quantity AS BIGINT), CAST(l_orderkey AS BIGINT) & 15))
                AS BIGINT) AS sum_xor_mix
    FROM lineitem GROUP BY 1
    """,
    survey_rows=("F-bitwise", "A8"),
    doc="Bitwise breadth: scalar AND/shift/XOR inside aggregates plus the "
    "bit_and/bit_or/bit_xor aggregate family — integer-exact everywhere, "
    "one hash aggregate with map-side partials. (Spark spells aggregate "
    "XOR bit_xor and scalar XOR ^; DuckDB spells scalar XOR xor() — the "
    "semantics align bit-for-bit.)",
)
def q61_bitwise_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    return li.groupBy(F.col("l_linenumber").cast("long").alias("l_linenumber")).agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_and(q).alias("qty_bit_and"),
        F.bit_or(q).alias("qty_bit_or"),
        F.bit_xor(q).alias("qty_bit_xor"),
        F.sum(q.bitwiseAND(F.lit(7))).cast("long").alias("sum_and7"),
        F.sum(F.shiftright(q, 2)).cast("long").alias("sum_shr2"),
        F.sum(q.bitwiseXOR(F.col("l_orderkey").cast("long").bitwiseAND(F.lit(15))))
        .cast("long")
        .alias("sum_xor_mix"),
    )


@query(
    "q62_cube_status_year",
    oracle="""
    SELECT o_orderstatus, o_year,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
           CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
           CAST(grouping(o_year) AS BIGINT) AS g_year
    FROM (SELECT o_orderstatus,
                 CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
                 o_totalprice
          FROM orders)
    GROUP BY CUBE (o_orderstatus, o_year)
    """,
    survey_rows=("A-rollup",),
    doc="CUBE over (status, order year): all 4 grouping combinations in one "
    "pass — completes the multidimensional-aggregation family next to q32 "
    "ROLLUP and q54 GROUPING SETS. Physically one Expand (4 replicas) + one "
    "hash aggregate with map-side partials; grand total and both margins "
    "come out of the same shuffle rather than 4 scans. GROUPING markers "
    "disambiguate cube NULLs from data NULLs (exact cents accumulators, "
    "registry rule 1).",
)
def q62_cube_status_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.year(F.col("o_orderdate").cast("date")).cast("long").alias("o_year"),
        "o_totalprice",
    )
    return o.cube("o_orderstatus", "o_year").agg(
        F.count(F.lit(1)).alias("n"),
        _cents_sum_raw(F.col("o_totalprice")).alias("total_cents"),
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.grouping("o_year").cast("long").alias("g_year"),
    )


@query(
    "q66_stats_aggregate_breadth",
    oracle="""
    WITH pts AS (
      SELECT l_returnflag AS flag,
             CAST(round(l_quantity) AS BIGINT) AS x,
             CAST(round(l_extendedprice) AS BIGINT) AS y
      FROM lineitem
    ), m AS (
      SELECT flag, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy,
             CAST(SUM(x*y) AS BIGINT) AS sxy,
             corr(CAST(y AS DOUBLE), CAST(x AS DOUBLE)) AS b_corr,
             regr_slope(CAST(y AS DOUBLE), CAST(x AS DOUBLE)) AS b_slope,
             regr_intercept(CAST(y AS DOUBLE), CAST(x AS DOUBLE)) AS b_icept,
             covar_samp(CAST(y AS DOUBLE), CAST(x AS DOUBLE)) AS b_covar,
             stddev_samp(CAST(x AS DOUBLE)) AS b_sd
      FROM pts GROUP BY flag
    ), dm AS (
      SELECT *,
             CAST(n AS DOUBLE) AS dn, CAST(sx AS DOUBLE) AS dsx,
             CAST(sy AS DOUBLE) AS dsy, CAST(sxx AS DOUBLE) AS dsxx,
             CAST(syy AS DOUBLE) AS dsyy, CAST(sxy AS DOUBLE) AS dsxy
      FROM m
    ), d AS (
      SELECT *,
        (dn*dsxy - dsx*dsy)
          / (sqrt(dn*dsxx - dsx*dsx) * sqrt(dn*dsyy - dsy*dsy)) AS d_corr,
        (dn*dsxy - dsx*dsy) / (dn*dsxx - dsx*dsx) AS d_slope,
        (dn*dsxy - dsx*dsy) / (dn*(dn - 1)) AS d_covar,
        sqrt((dn*dsxx - dsx*dsx) / (dn*(dn - 1))) AS d_sd
      FROM dm
    )
    SELECT flag, n, sx, sy, sxx, syy, sxy,
           d_corr, d_slope,
           (CAST(sy AS DOUBLE) - d_slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
             AS d_icept,
           d_covar, d_sd,
           CAST(CASE WHEN abs(b_corr - d_corr) <= 1e-9 THEN 1 ELSE 0 END AS BIGINT) AS ok_corr,
           CAST(CASE WHEN abs(b_slope - d_slope)
                          <= 1e-9 * greatest(abs(d_slope), 1.0) THEN 1 ELSE 0 END AS BIGINT) AS ok_slope,
           CAST(CASE WHEN abs(b_icept - (CAST(sy AS DOUBLE) - d_slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE))
                          <= 1e-9 * greatest(abs(d_slope), 1.0) THEN 1 ELSE 0 END AS BIGINT) AS ok_icept,
           CAST(CASE WHEN abs(b_covar - d_covar)
                          <= 1e-9 * greatest(abs(d_covar), 1.0) THEN 1 ELSE 0 END AS BIGINT) AS ok_covar,
           CAST(CASE WHEN abs(b_sd - d_sd)
                          <= 1e-9 * greatest(abs(d_sd), 1.0) THEN 1 ELSE 0 END AS BIGINT) AS ok_sd
    FROM d
    """,
    survey_rows=("A-stats",),
    doc="Statistical aggregate breadth (corr, regr_slope/intercept, "
    "covar_samp, stddev_samp) with the q28/x36 bounded-error oracle "
    "pattern: exact integer moments (n, Σx, Σy, Σx², Σy², Σxy as BIGINT — "
    "one map-side-combined hash agg, no second pass) hash-match across "
    "engines; the closed-form values derived from those moments in "
    "identical IEEE expression order are bit-exact; and each engine gates "
    "ITS OWN single-pass builtin against the derivation at 1e-9, because "
    "float accumulation order across engines (and across partitionings at "
    "scale) legitimately differs in last ulps.",
)
def q66_stats_aggregate_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_returnflag").alias("flag"),
        half_up_long("l_quantity").alias("x"),
        half_up_long("l_extendedprice").alias("y"),
    )
    xd, yd = F.col("x").cast("double"), F.col("y").cast("double")
    m = pts.groupBy("flag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.corr(yd, xd).alias("b_corr"),
        F.regr_slope(yd, xd).alias("b_slope"),
        F.regr_intercept(yd, xd).alias("b_icept"),
        F.covar_samp(yd, xd).alias("b_covar"),
        F.stddev_samp(xd).alias("b_sd"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    # moment COMBINATIONS in double, not BIGINT: n*syy overflows int64 once
    # n·y² passes ~9.2e18 (hit at the 10x probe), while the raw moments
    # themselves stay exact far longer (y ≤ 1e5 ⇒ Σy² fits to n ≈ 9e8/group;
    # beyond that, switch the accumulators to DECIMAL(38,0) — still exact
    # and mergeable). Both engines evaluate the identical IEEE expression
    # over identical bigint-cast doubles, so derived values stay bit-exact.
    dn, dsx, dsy = n.cast("double"), sx.cast("double"), sy.cast("double")
    dsxx, dsyy, dsxy = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    d_corr = (dn * dsxy - dsx * dsy) / (
        F.sqrt(dn * dsxx - dsx * dsx) * F.sqrt(dn * dsyy - dsy * dsy)
    )
    d_slope = (dn * dsxy - dsx * dsy) / (dn * dsxx - dsx * dsx)
    d_covar = (dn * dsxy - dsx * dsy) / (dn * (dn - 1))
    d_sd = F.sqrt((dn * dsxx - dsx * dsx) / (dn * (dn - 1)))
    d = m.select(
        "flag", "n", "sx", "sy", "sxx", "syy", "sxy",
        d_corr.alias("d_corr"), d_slope.alias("d_slope"), d_covar.alias("d_covar"),
        d_sd.alias("d_sd"), "b_corr", "b_slope", "b_icept", "b_covar", "b_sd",
    )
    d_icept = (sy.cast("double") - F.col("d_slope") * sx.cast("double")) / n.cast("double")
    tol = lambda ref: 1e-9 * F.greatest(F.abs(ref), F.lit(1.0))  # noqa: E731
    return d.select(
        "flag", "n", "sx", "sy", "sxx", "syy", "sxy",
        "d_corr", "d_slope", d_icept.alias("d_icept"), "d_covar", "d_sd",
        (F.abs(F.col("b_corr") - F.col("d_corr")) <= 1e-9).cast("long").alias("ok_corr"),
        (F.abs(F.col("b_slope") - F.col("d_slope")) <= tol(F.col("d_slope")))
        .cast("long").alias("ok_slope"),
        (F.abs(F.col("b_icept") - d_icept) <= tol(F.col("d_slope"))).cast("long").alias("ok_icept"),
        (F.abs(F.col("b_covar") - F.col("d_covar")) <= tol(F.col("d_covar")))
        .cast("long").alias("ok_covar"),
        (F.abs(F.col("b_sd") - F.col("d_sd")) <= tol(F.col("d_sd"))).cast("long").alias("ok_sd"),
    )


@query(
    "q67_map_functions",
    oracle="""
    WITH pc AS (
      SELECT o_orderstatus AS s, o_orderpriority AS p, COUNT(*) AS n
      FROM orders GROUP BY 1, 2
    )
    SELECT s AS o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(MAX(CASE WHEN p = '1-URGENT' THEN n END) AS BIGINT) AS urgent_n,
           CAST(NULL AS BIGINT) AS absent_n,
           CAST(SUM(n) AS BIGINT) AS total_n,
           string_agg(p, ',' ORDER BY p) AS keys_csv
    FROM pc GROUP BY s
    """,
    survey_rows=("F-map",),
    doc="Map-typed column breadth: per-status priority→count maps built "
    "with map_from_entries over sorted entry arrays, split into two "
    "disjoint halves and re-merged with map_concat (null-safe via typed "
    "empty-map coalesce), then read back with element_at / "
    "try_element_at (absent key → NULL, no error) / map_keys / "
    "map_values + aggregate. Maps stay JVM-side expression work over one "
    "(status, priority) hash agg; the oracle recomputes the same facts "
    "relationally — proving the map round-trip loses nothing.",
)
def q67_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    pc = o.groupBy(
        F.col("o_orderstatus").alias("s"), F.col("o_orderpriority").alias("p")
    ).agg(F.count(F.lit(1)).alias("n"))

    def half_map(df, name):
        return df.groupBy("s").agg(
            F.map_from_entries(F.array_sort(F.collect_list(F.struct("p", "n")))).alias(name)
        )

    m1 = half_map(pc.filter(F.col("p") < "3"), "m1")
    m2 = half_map(pc.filter(F.col("p") >= "3"), "m2")
    empty = F.from_json(F.lit("{}"), "map<string, bigint>")
    merged = (
        m1.join(m2, "s", "full_outer")
        .select(
            "s",
            F.map_concat(F.coalesce("m1", empty), F.coalesce("m2", empty)).alias("m"),
        )
    )
    return merged.select(
        F.col("s").alias("o_orderstatus"),
        F.size("m").cast("long").alias("n_keys"),
        F.element_at("m", F.lit("1-URGENT")).alias("urgent_n"),
        F.try_element_at("m", F.lit("NO-SUCH-KEY")).alias("absent_n"),
        F.aggregate(F.map_values("m"), F.lit(0).cast("long"), lambda a, b: a + b).alias(
            "total_n"
        ),
        F.array_join(F.map_keys("m"), ",").alias("keys_csv"),
    )


@query(
    "q69_content_hashing_encoding",
    oracle="""
    SELECT doc_id,
           md5(text) AS md5_hex,
           sha256(text) AS sha256_hex,
           lower(hex(encode(substring(text, 1, 8)))) AS prefix_hex,
           to_base64(encode(substring(text, 1, 8))) AS prefix_b64,
           CAST(CASE WHEN decode(from_base64(to_base64(encode(text)))) = text
                THEN 1 ELSE 0 END AS BIGINT) AS b64_roundtrip_ok
    FROM documents WHERE doc_id < 200
    """,
    survey_rows=("F-hash", "EXT-fingerprint"),
    doc="Content-addressing breadth: md5 / sha2-256 digests (the "
    "cross-engine shared-hash foundation under x07/x16's simhash twins), "
    "hex dump, and base64 round-trip over document text — all JVM "
    "codegen'd expression work, the map-only fingerprinting a content "
    "store keys blobs by. base64 is compared on a short prefix and as a "
    "round-trip flag because Spark MIME-chunks encodings past 76 chars "
    "(CRLF every 76) while DuckDB emits unchunked — same bytes, different "
    "wrapping; hex is case-normalized (Spark upper, DuckDB upper, both "
    "lowered) so the digest columns stay bit-comparable.",
)
def q69_content_hashing_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    prefix = F.encode(F.substring("text", 1, 8), "utf-8")
    full = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2("text", 256).alias("sha256_hex"),
        F.lower(F.hex(prefix)).alias("prefix_hex"),
        F.base64(prefix).alias("prefix_b64"),
        (F.decode(F.unbase64(F.base64(full)), "utf-8") == F.col("text"))
        .cast("long")
        .alias("b64_roundtrip_ok"),
    )


@query(
    "q70_pivot_revenue_matrix",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
           SUM(CASE WHEN o_orderpriority = '1-URGENT'
               THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
               ELSE 0 END) / 10000.0 AS urgent,
           SUM(CASE WHEN o_orderpriority = '2-HIGH'
               THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
               ELSE 0 END) / 10000.0 AS high,
           SUM(CASE WHEN o_orderpriority = '3-MEDIUM'
               THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
               ELSE 0 END) / 10000.0 AS medium,
           SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
               THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
               ELSE 0 END) / 10000.0 AS not_specified,
           SUM(CASE WHEN o_orderpriority = '5-LOW'
               THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
               ELSE 0 END) / 10000.0 AS low
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
    survey_rows=("A5", "A8", "O1"),
    doc="PIVOT breadth: revenue matrix year x order-priority via the native "
    "DataFrame pivot relational operator (explicit value list, so Spark "
    "skips the extra distinct-values job and the pivot stays a single "
    "hash aggregate — the at-scale form; an implicit pivot would add a "
    "collect-distinct pre-pass). Oracle is the canonical conditional-"
    "aggregation expansion, proving the pivot's cell semantics. Missing "
    "cells are COALESCEd to 0.0 to match SUM(CASE..ELSE 0). The inverse "
    "unpivot (DataFrame.unpivot -> Expand) round-trips bit-exactly in "
    "tests/test_pivot.py.",
)
def q70_pivot_revenue_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    _PRIORITIES = [
        ("1-URGENT", "urgent"),
        ("2-HIGH", "high"),
        ("3-MEDIUM", "medium"),
        ("4-NOT SPECIFIED", "not_specified"),
        ("5-LOW", "low"),
    ]
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    wide = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .pivot("o_orderpriority", [p for p, _ in _PRIORITIES])
        .agg(_cents_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4))
    )
    return wide.select(
        "order_year",
        *[F.coalesce(F.col(f"`{p}`"), F.lit(0.0)).alias(a) for p, a in _PRIORITIES],
    )


@query(
    "q71_exists_semi_anti",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '5-LOW')
    ORDER BY c_custkey
    """,
    survey_rows=("J7", "P7"),
    doc="Semi/anti-join breadth: customers with >= 1 URGENT order (EXISTS "
    "-> LeftSemi) and zero LOW orders (NOT EXISTS -> LeftAnti). Both "
    "lower to hash joins that emit the probe row at the first match and "
    "carry NO columns from the build side — at scale the build sides are "
    "key-only projections (8 bytes/row) and broadcast when under "
    "threshold, which is exactly how decontamination filters (x26/x28) "
    "discharge their membership checks.",
)
def q71_exists_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi")
        .join(low, c.c_custkey == low.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@query(
    "q72_group_by_all_ergonomics",
    oracle="""
    SELECT o_orderstatus,
           o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
    """,
    survey_rows=("A8", "O1"),
    doc="Modern SQL ergonomics surface: GROUP BY ALL (group on every "
    "non-aggregate select item) and ORDER BY ALL, run as SQL TEXT "
    "through spark.sql — the same statement executes verbatim on DuckDB, "
    "so the oracle IS the query. Resolves to the identical hash "
    "aggregate + sort a column-list GROUP BY plans (no penalty, purely "
    "front-end sugar users coming from DuckDB/Snowflake expect). Price "
    "summed in integer cents per registry rule 1.",
)
def q72_group_by_all_ergonomics(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS total_cents
        FROM orders
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@query(
    "q73_filter_clause_aggregates",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           COUNT(DISTINCT o_custkey) FILTER (WHERE o_orderpriority = '1-URGENT')
             AS urgent_customers,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS open_cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    survey_rows=("A11", "A2", "A8"),
    doc="ANSI FILTER-clause aggregates run as SQL TEXT through spark.sql — "
    "the statement executes verbatim on DuckDB, so the oracle IS the "
    "query. Each FILTER lowers to the same conditional-aggregation "
    "physical plan as the CASE-WHEN idiom (q22) — one pass, map-side "
    "partial aggregation, including the filtered COUNT(DISTINCT) which "
    "plans as a two-phase distinct aggregate. Price summed in integer "
    "cents per registry rule 1.",
)
def q73_filter_clause_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_mktsegment,
               COUNT(*) AS n_orders,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               COUNT(DISTINCT o_custkey) FILTER (WHERE o_orderpriority = '1-URGENT')
                 AS urgent_customers,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS open_cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """
    )
