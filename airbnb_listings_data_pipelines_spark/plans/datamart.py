"""Datamart layer — the four KPI views
(reference: workfile_populate_data_warehouse.py:506-925).

All four share one shape: the fact table aggregated 4 ways under different
predicates (all / active / superhost / inactive), FULL-OUTER-joined back
together on the group keys, projecting the *total* side's keys — groups that
exist only in a filtered side surface with NULL group keys (SURVEY
§2.10(1)). That quirk is load-bearing, so the join shape is preserved; a
single-pass conditional aggregation would silently drop those rows.

One parametric builder covers kpi1 (neighbourhood_lga), kpi1_raw
(neighbourhood_cleansed — the reference's own A/B comparison view,
populate.py:625-627), and kpi2 (property/room/accommodates). kpi3 is the
two-way variant.

Scale: each sub-aggregate shuffles on the same keys, so AQE plans the full
joins shuffle-free after the first exchange; the LAG windows run over
already-aggregated rows (thousands, not the base table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.dialect import dec


def _stays(col: str = "availability_30") -> F.Column:
    # VARCHAR availability coerced to number, exactly like Snowflake
    # (populate.py:572; SURVEY §2.10(3))
    return F.lit(30) - F.col(col)


def _revenue() -> F.Column:
    return _stays() * F.col("price")


def kpi_view(fact: DataFrame, group_keys: list[str]) -> DataFrame:
    """Generic KPI view: per (group_keys..., listing_year, listing_month).

    Reference columns and casts reproduced 1:1
    (populate.py:506-621 / 627-743 / 746-882).
    """
    keys = [*group_keys, "listing_year", "listing_month"]
    lag_w = Window.partitionBy(*group_keys).orderBy("listing_year", "listing_month")

    t = fact.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("total_listing"),
        F.countDistinct("host_id").alias("distinct_hosts"),
    )
    # the active side splits COUNT(DISTINCT host_id) into its own aggregate
    # joined back on the group keys: mixing a distinct aggregate with the
    # exact percentile in one GROUP BY makes Spark plan an Expand (row
    # duplication per aggregate class) and evaluate the percentile over the
    # expanded input — the q28 lesson; results are identical, the join is
    # over already-aggregated rows
    active = fact.filter(F.col("has_availability") == "t")
    a_nd = active.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("total_active_listings"),
        F.min("price").alias("min_price"),
        F.max("price").alias("max_price"),
        F.percentile("price", F.lit(0.5)).alias("med_price"),
        dec(F.avg("price")).alias("avg_price"),
        dec(F.avg("review_scores_rating"), 10, 0).alias("avg_review_scores_rating"),
        dec(F.avg(_stays()), 10, 0).alias("avg_number_stays"),
        F.sum(_stays()).alias("total_number_stays"),
        dec(F.avg(_revenue())).alias("avg_estimated_revenue_per_active_listings"),
        dec(F.sum(_revenue())).alias("total_estimated_revenue_active_listings"),
        F.sum(_revenue()).alias("__sum_rev"),
    )
    a_d = active.groupBy(*keys).agg(F.countDistinct("host_id").alias("__active_hosts"))
    # null-safe key equality: groups with NULL key values (the §2.10(1)
    # quirk rows, e.g. NULL property_type) must survive the recombination
    nd_, d_ = a_nd.alias("nd"), a_d.alias("d")
    recombine_on = None
    for k in keys:
        e = F.col(f"nd.{k}").eqNullSafe(F.col(f"d.{k}"))
        recombine_on = e if recombine_on is None else (recombine_on & e)
    a = (
        nd_.join(d_, recombine_on)
        .select("nd.*", "d.__active_hosts")
        .withColumn(
            "avg_estimated_revenue_per_active_listings_per_host",
            dec(F.col("__sum_rev") / F.col("__active_hosts")),
        )
        .drop("__sum_rev", "__active_hosts")
        .withColumn(
            "original_total_active_listings",
            F.lag("total_active_listings").over(lag_w),
        )
    )
    s = (
        fact.filter(F.col("host_is_superhost") == "t")
        .groupBy(*keys)
        .agg(F.countDistinct("host_id").alias("super_distinct_hosts"))
    )
    i = (
        fact.filter(F.col("has_availability") == "f")
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("total_inactive_listings"))
        .withColumn(
            "original_total_inactive_listings",
            F.lag("total_inactive_listings").over(lag_w),
        )
    )

    def on(right_alias: str):
        c = None
        for k in keys:
            e = F.col(f"t.{k}") == F.col(f"{right_alias}.{k}")
            c = e if c is None else (c & e)
        return c

    t_, a_, s_, i_ = t.alias("t"), a.alias("a"), s.alias("s"), i.alias("i")
    joined = (
        t_.join(a_, on("a"), "full").join(s_, on("s"), "full").join(i_, on("i"), "full")
    )
    pct_change = lambda cur, orig: dec(  # noqa: E731
        F.lit(100) * (F.col(cur) - F.col(orig)) / F.col(orig)
    )
    return joined.select(
        *[F.col(f"t.{k}").alias(k) for k in keys],  # t-side keys: NULL-key quirk
        dec((F.col("a.total_active_listings") / F.col("t.total_listing")) * 100).alias(
            "active_listing_rate"
        ),
        F.col("a.min_price").alias("min_price"),
        F.col("a.max_price").alias("max_price"),
        F.col("a.med_price").alias("med_price"),
        F.col("a.avg_price").alias("avg_price"),
        F.col("t.distinct_hosts").alias("distinct_hosts"),
        dec((F.col("s.super_distinct_hosts") / F.col("t.distinct_hosts")) * 100).alias(
            "superhost_rate"
        ),
        F.col("a.avg_review_scores_rating").alias("avg_review_scores_rating"),
        pct_change("a.total_active_listings", "a.original_total_active_listings").alias(
            "percentage_change_active_listings"
        ),
        pct_change("i.total_inactive_listings", "i.original_total_inactive_listings").alias(
            "percentage_change_inactive_listings"
        ),
        F.col("a.avg_number_stays").alias("avg_number_stays"),
        F.col("a.total_number_stays").alias("total_number_stays"),
        F.col("a.avg_estimated_revenue_per_active_listings").alias(
            "avg_estimated_revenue_per_active_listings"
        ),
        F.col("a.total_estimated_revenue_active_listings").alias(
            "total_estimated_revenue_active_listings"
        ),
        F.col("a.avg_estimated_revenue_per_active_listings_per_host").alias(
            "avg_estimated_revenue_per_active_listings_per_host"
        ),
    ).orderBy(*keys)


def kpi_view_single_pass(fact: DataFrame, group_keys: list[str]) -> DataFrame:
    """Opt-in fast form of ``kpi_view``: ONE scan + ONE shuffle via
    conditional aggregation (`F.count(F.when(...))` etc.) instead of four
    filtered sub-aggregates FULL-joined back together.

    NOT bit-parity with the reference: the FULL-JOIN shape emits extra
    NULL-group-key rows when a group key is NULL (SURVEY §2.10(1)); this
    form keeps one row per group. Also, the reference's LAG runs inside
    each filtered sub-aggregate (skipping months where a group had no
    active/inactive rows), while this form lags over all months (a no-
    active month contributes NULL). Metrics agree whenever groups are
    continuously present — tested on fixtures. Use at scale where the 4x
    scan + 3 shuffled full joins dominate.
    """
    keys = [*group_keys, "listing_year", "listing_month"]
    lag_w = Window.partitionBy(*group_keys).orderBy("listing_year", "listing_month")
    active = F.col("has_availability") == "t"
    inactive = F.col("has_availability") == "f"
    super_ = F.col("host_is_superhost") == "t"
    act = lambda c: F.when(active, c)  # noqa: E731

    # distinct aggregates live in their own GROUP BY, rejoined null-safely:
    # three count_distincts + the exact percentile in one aggregate would
    # plan a 4-way Expand and run the percentile over quadrupled input
    # (the q28 lesson — "single pass" must not mean "single aggregate")
    agg_nd = fact.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("total_listing"),
        F.count(act(F.lit(1))).alias("total_active_listings"),
        F.min(act(F.col("price"))).alias("min_price"),
        F.max(act(F.col("price"))).alias("max_price"),
        F.percentile(act(F.col("price")), F.lit(0.5)).alias("med_price"),
        dec(F.avg(act(F.col("price")))).alias("avg_price"),
        dec(F.avg(act(F.col("review_scores_rating"))), 10, 0).alias(
            "avg_review_scores_rating"
        ),
        dec(F.avg(act(_stays())), 10, 0).alias("avg_number_stays"),
        F.sum(act(_stays())).alias("total_number_stays"),
        dec(F.avg(act(_revenue()))).alias("avg_estimated_revenue_per_active_listings"),
        dec(F.sum(act(_revenue()))).alias("total_estimated_revenue_active_listings"),
        F.sum(act(_revenue())).alias("__sum_rev"),
        F.count(F.when(inactive, 1)).alias("total_inactive_listings"),
    )
    agg_d = fact.groupBy(*keys).agg(
        F.countDistinct("host_id").alias("distinct_hosts"),
        F.count_distinct(act(F.col("host_id"))).alias("__active_hosts"),
        F.count_distinct(F.when(super_, F.col("host_id"))).alias("super_distinct_hosts"),
    )
    nd_, d_ = agg_nd.alias("nd"), agg_d.alias("d")
    rejoin_on = None
    for k in keys:
        e = F.col(f"nd.{k}").eqNullSafe(F.col(f"d.{k}"))
        rejoin_on = e if rejoin_on is None else (rejoin_on & e)
    agg = (
        nd_.join(d_, rejoin_on)
        .select("nd.*", "d.distinct_hosts", "d.__active_hosts", "d.super_distinct_hosts")
        .withColumn(
            "avg_estimated_revenue_per_active_listings_per_host",
            dec(F.col("__sum_rev") / F.when(F.col("__active_hosts") != 0, F.col("__active_hosts"))),
        )
        .drop("__sum_rev", "__active_hosts")
    )
    nullif = lambda c: F.when(c != 0, c)  # noqa: E731  empty groups -> NULL like the join form
    agg = agg.withColumns(
        {
            "total_active_listings": nullif(F.col("total_active_listings")),
            "super_distinct_hosts": nullif(F.col("super_distinct_hosts")),
            "total_inactive_listings": nullif(F.col("total_inactive_listings")),
        }
    ).withColumns(
        {
            "original_total_active_listings": F.lag("total_active_listings").over(lag_w),
            "original_total_inactive_listings": F.lag("total_inactive_listings").over(lag_w),
        }
    )
    pct_change = lambda cur, orig: dec(  # noqa: E731
        F.lit(100) * (F.col(cur) - F.col(orig)) / F.col(orig)
    )
    return agg.select(
        *keys,
        dec((F.col("total_active_listings") / F.col("total_listing")) * 100).alias(
            "active_listing_rate"
        ),
        "min_price",
        "max_price",
        "med_price",
        "avg_price",
        "distinct_hosts",
        dec((F.col("super_distinct_hosts") / F.col("distinct_hosts")) * 100).alias(
            "superhost_rate"
        ),
        "avg_review_scores_rating",
        pct_change("total_active_listings", "original_total_active_listings").alias(
            "percentage_change_active_listings"
        ),
        pct_change("total_inactive_listings", "original_total_inactive_listings").alias(
            "percentage_change_inactive_listings"
        ),
        "avg_number_stays",
        "total_number_stays",
        "avg_estimated_revenue_per_active_listings",
        "total_estimated_revenue_active_listings",
        "avg_estimated_revenue_per_active_listings_per_host",
    ).orderBy(*keys)


def kpi_neighbourhood_month(fact: DataFrame) -> DataFrame:
    """kpi1 (populate.py:506-621) — per cleaned neighbourhood_lga."""
    return kpi_view(fact, ["neighbourhood_lga"])


def kpi_neighbourhood_month_raw(fact: DataFrame) -> DataFrame:
    """kpi1_raw (populate.py:627-743) — per raw neighbourhood_cleansed;
    exists only to A/B-compare against the cleaned view (populate.py:625)."""
    return kpi_view(fact, ["neighbourhood_cleansed"])


def kpi_property_month(fact: DataFrame) -> DataFrame:
    """kpi2 (populate.py:746-882) — per property/room/accommodates."""
    return kpi_view(fact, ["property_type", "room_type", "accommodates"])


def kpi_host_neighbourhood_month(fact: DataFrame) -> DataFrame:
    """kpi3 (populate.py:885-925): distinct hosts per host_lga/month FULL
    JOIN active-listing revenue aggregates."""
    keys = ["host_lga", "listing_year", "listing_month"]
    t = fact.groupBy(*keys).agg(F.countDistinct("host_id").alias("distinct_count"))
    a = (
        fact.filter(F.col("has_availability") == "t")
        .groupBy(*keys)
        .agg(
            dec(F.sum(_revenue())).alias("total_estimated_revenue_listings"),
            dec(F.avg(_revenue())).alias("avg_estimated_revenue_per_listings"),
            dec(F.sum(_revenue()) / F.countDistinct("host_id")).alias(
                "estimated_revenue_per_host"
            ),
        )
    )
    t_, a_ = t.alias("t"), a.alias("a")
    cond = (
        (F.col("t.host_lga") == F.col("a.host_lga"))
        & (F.col("t.listing_year") == F.col("a.listing_year"))
        & (F.col("t.listing_month") == F.col("a.listing_month"))
    )
    return (
        t_.join(a_, cond, "full")
        .select(
            *[F.col(f"t.{k}").alias(k) for k in keys],
            F.col("t.distinct_count").alias("distinct_count"),
            "total_estimated_revenue_listings",
            "avg_estimated_revenue_per_listings",
            "estimated_revenue_per_host",
        )
        .orderBy(*keys)
    )
