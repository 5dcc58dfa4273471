"""Ad-hoc analytical queries a-d
(reference: workfile_ad-hoc_analysis.sql; golden outputs report p6-11).

Each returns a DataFrame; these are the flagship correctness queries of the
reference pipeline because the report publishes their expected result
tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.dialect import dec


def _revenue() -> F.Column:
    return (F.lit(30) - F.col("availability_30")) * F.col("price")


def query_a_best_worst_demographics(fact: DataFrame, dim_census: DataFrame) -> DataFrame:
    """adhoc a (workfile_ad-hoc_analysis.sql:6-46): best vs worst LGA by
    estimated revenue per active listing, joined to census demographics.

    The global ROW_NUMBER windows run over the per-LGA aggregate (~130
    rows), not the base table — the documented non-scalable spot
    (SURVEY §4.3) stays cheap because aggregation happens first.
    """
    agg = (
        fact.filter(F.col("has_availability") == "t")
        .groupBy("neighbourhood_lga", "neighbourhood_lga_code")
        .agg(dec(F.avg(_revenue())).alias("estimated_revenue_per_active_listings"))
    )
    best = Window.orderBy(F.desc("estimated_revenue_per_active_listings"))
    worst = Window.orderBy("estimated_revenue_per_active_listings")
    cte = (
        agg.withColumn("rk_best", F.row_number().over(best))
        .withColumn("rk_worst", F.row_number().over(worst))
        .filter((F.col("rk_best") == 1) | (F.col("rk_worst") == 1))
        .select(
            "neighbourhood_lga",
            "neighbourhood_lga_code",
            "estimated_revenue_per_active_listings",
        )
    )
    dc = F.broadcast(dim_census)
    age_u35 = F.col("age_15_19_yr_p") + F.col("age_20_24_yr_p") + F.col("age_25_34_yr_p")
    age_35_64 = F.col("age_35_44_yr_p") + F.col("age_55_64_yr_p")
    age_a65 = F.col("age_65_74_yr_p") + F.col("age_75_84_yr_p")
    return (
        cte.join(dc, cte.neighbourhood_lga_code == dc.lga_code, "left")
        .select(
            "neighbourhood_lga",
            "estimated_revenue_per_active_listings",
            "median_age_persons",
            "tot_p_p",
            "indigenous_p_tot_p",
            dec(F.lit(100) * F.col("indigenous_p_tot_p") / F.col("tot_p_p")).alias(
                "percent_indigenous_p_tot_p"
            ),
            "australian_citizen_p",
            dec(F.lit(100) * F.col("australian_citizen_p") / F.col("tot_p_p")).alias(
                "percent_australian_citizen_p"
            ),
            age_u35.alias("age_under_35"),
            dec(F.lit(100) * age_u35 / F.col("tot_p_p")).alias("percent_age_under_35"),
            age_35_64.alias("age_35_64"),
            dec(F.lit(100) * age_35_64 / F.col("tot_p_p")).alias("percent_age_35_64"),
            age_a65.alias("age_above_65"),
            dec(F.lit(100) * age_a65 / F.col("tot_p_p")).alias("percent_age_above_65"),
            (age_35_64 + age_a65).alias("age_above_35"),
            dec(F.lit(100) * (age_35_64 + age_a65) / F.col("tot_p_p")).alias(
                "percent_over_35"
            ),
        )
        .distinct()
        .orderBy(F.desc("estimated_revenue_per_active_listings"))
    )


def query_b_best_listing_type_top5(fact: DataFrame) -> DataFrame:
    """adhoc b (workfile_ad-hoc_analysis.sql:50-78): top-5 LGAs by revenue,
    each with its highest-stays listing type — RANK()=1 keeps ties (the
    golden table report p8-10 includes 24+ tied rows)."""
    active = fact.filter(F.col("has_availability") == "t")
    top5 = (
        active.groupBy("neighbourhood_lga")
        .agg(dec(F.avg(_revenue())).alias("estimated_revenue_per_active_listings"))
        .orderBy(F.desc("estimated_revenue_per_active_listings"))
        .limit(5)
    )
    detail = active.groupBy(
        "neighbourhood_lga", "property_type", "room_type", "accommodates"
    ).agg(dec(F.avg(F.lit(30) - F.col("availability_30")), 10, 0).alias("avg_number_stays"))
    l1 = top5.alias("l1")
    l2 = detail.alias("l2")
    joined = l1.join(l2, F.col("l1.neighbourhood_lga") == F.col("l2.neighbourhood_lga"), "left")
    w = Window.partitionBy(F.col("l1.neighbourhood_lga")).orderBy(F.desc("avg_number_stays"))
    return (
        joined.withColumn("__rk", F.rank().over(w))
        .filter(F.col("__rk") == 1)
        .select(
            F.col("l2.neighbourhood_lga").alias("neighbourhood_lga"),
            "property_type",
            "room_type",
            "accommodates",
            "avg_number_stays",
            F.col("l1.estimated_revenue_per_active_listings").alias("__rev"),
        )
        .orderBy(
            F.desc("__rev"),
            F.desc("avg_number_stays"),
            "property_type",
            "room_type",
            "accommodates",
        )
        .drop("__rev")
    )


def query_c_same_neighbourhood(fact: DataFrame) -> DataFrame:
    """adhoc c (workfile_ad-hoc_analysis.sql:84-150): do multi-listing
    hosts keep listings in their home LGA? Hosts bucketed by the share of
    their listings in the host's own LGA (rounded percent: 100% / 50-99% /
    <50% — report p11 Table 3: 821/611/206 of 5,044)."""
    uniq = (
        fact.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("host_id", "id").orderBy(F.col("id").desc())
            ),
        )
        .filter(F.col("__rn") == 1)
        .select(
            "host_id",
            "id",
            F.when(
                (F.col("neighbourhood_lga") != "MISSING")
                & (F.col("host_lga") != "MISSING")
                & (F.col("neighbourhood_lga") != "OTHER")
                & (F.col("host_lga") != "OTHER"),
                F.when(F.col("neighbourhood_lga") == F.col("host_lga"), "TRUE").when(
                    F.col("neighbourhood_lga") != F.col("host_lga"), "FALSE"
                ),
            )
            .otherwise("NOT_SURE")
            .alias("same_neighbourhood"),
        )
    )
    w_same = Window.partitionBy("host_id", "same_neighbourhood")
    w_host = Window.partitionBy("host_id")
    percent = dec(
        F.lit(100) * F.count("id").over(w_same) / F.count("id").over(w_host), 10, 0
    )
    host_level = (
        uniq.select(
            "host_id",
            "same_neighbourhood",
            F.count("id").over(w_same).alias("ct_same"),
            F.count("id").over(w_host).alias("ct_total"),
            percent.alias("percent"),
        )
        .withColumn(
            "percent_range",
            F.when(F.col("percent") == 100, "100%")
            .when((F.col("percent") >= 50) & (F.col("percent") < 100), "50% - 99%")
            .when(F.col("percent") < 50, "<50%"),
        )
        .distinct()
        .filter(F.col("ct_total") > 1)
    )
    total_multi = host_level.agg(
        F.countDistinct("host_id").alias("total_number_of_host_with_mutiple_listings")
    )
    same_true = host_level.filter(F.col("same_neighbourhood") == "TRUE").crossJoin(
        F.broadcast(total_multi)
    )
    w_all = Window.partitionBy("same_neighbourhood")
    w_range = Window.partitionBy("percent_range")
    return (
        same_true.select(
            F.col("percent_range").alias("percentage_in_same_lga"),
            F.count(F.lit(1)).over(w_range).alias("number_of_host_same_lga_per_range"),
            F.count(F.lit(1)).over(w_all).alias("total_number_of_host_same_lga"),
            "total_number_of_host_with_mutiple_listings",
        )
        .select(
            "percentage_in_same_lga",
            "number_of_host_same_lga_per_range",
            "total_number_of_host_same_lga",
            dec(
                F.lit(100)
                * F.col("number_of_host_same_lga_per_range")
                / F.col("total_number_of_host_same_lga")
            ).alias("percentage_of_host_with_same_lga_mutiple_listings"),
            "total_number_of_host_with_mutiple_listings",
            dec(
                F.lit(100)
                * F.col("number_of_host_same_lga_per_range")
                / F.col("total_number_of_host_with_mutiple_listings")
            ).alias("percentage_of_host_with_mutiple_listings"),
        )
        .distinct()
        .orderBy(F.desc("percentage_of_host_with_mutiple_listings"))
    )


def query_d_mortgage_coverage(fact: DataFrame, dim_census: DataFrame) -> DataFrame:
    """adhoc d (workfile_ad-hoc_analysis.sql:155-188): can unique-listing
    hosts' annual revenue cover the annualized median mortgage of their
    listing's LGA? (report p11 Table 4: 30,305 hosts; 19.48% cover all.)"""
    per_host = (
        fact.filter(F.col("host_listings_count") == 1)
        .groupBy("host_id", "neighbourhood_lga", "neighbourhood_lga_code")
        .agg(F.sum(_revenue()).alias("total_revenue"))
    )
    cte = (
        per_host.join(
            F.broadcast(dim_census.select("lga_code", "median_mortgage_repay_monthly")),
            per_host.neighbourhood_lga_code == F.col("lga_code"),
            "left",
        )
        .select(
            "host_id",
            "neighbourhood_lga",
            "total_revenue",
            (F.col("median_mortgage_repay_monthly") * 12).alias("total_median_mortgage"),
        )
        .distinct()
    )
    rev, mort = F.col("total_revenue"), F.col("total_median_mortgage")
    counts = cte.agg(
        F.count(F.lit(1)).alias("total_number_of_host"),
        F.count(F.when(rev >= mort, 1)).alias("total_number_of_host_can_cover_all"),
        F.count(F.when(rev >= mort * 0.5, 1)).alias("total_number_of_host_can_cover_half"),
        F.count(F.when(rev >= mort * 0.2, 1)).alias("total_number_of_host_can_cover_20per"),
        F.count(F.when(rev < mort, 1)).alias("total_number_of_host_cannot_cover"),
    )
    pct = lambda c: dec(F.lit(100) * F.col(c) / F.col("total_number_of_host"))  # noqa: E731
    return counts.select(
        "*",
        pct("total_number_of_host_can_cover_all").alias("percentage_of_host_can_cover_all"),
        pct("total_number_of_host_can_cover_half").alias("percentage_of_host_can_cover_half"),
        pct("total_number_of_host_can_cover_20per").alias("percentage_of_host_can_cover_20per"),
        pct("total_number_of_host_cannot_cover").alias("percentage_of_host_cannot_cover"),
    )
