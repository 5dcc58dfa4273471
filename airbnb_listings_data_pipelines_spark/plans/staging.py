"""Staging layer — typed, cleaned, deduplicated tables built from the raw
positional CSV reads (reference: workfile_design_data_warehouse.sql:140-267).

Inputs are DataFrames from ``sources.csv.read_positional_csv`` (columns
``c1..cN`` + ``filename``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.dialect import split_part

# 74 canonical listing columns in raw positional order
# (workfile_design_data_warehouse.sql:189-262; workfile_preprocess.ipynb cell 16).
# (position, name, type); price (c40) handled specially.
LISTING_COLUMNS: list[tuple[int, str, str]] = [
    (1, "id", "string"),
    (2, "listing_url", "string"),
    (3, "scrape_id", "string"),
    (4, "last_scraped", "date"),
    (5, "name", "string"),
    (6, "description", "string"),
    (7, "neighborhood_overview", "string"),
    (8, "picture_url", "string"),
    (9, "host_id", "int"),
    (10, "host_url", "string"),
    (11, "host_name", "string"),
    (12, "host_since", "string"),
    (13, "host_location", "string"),
    (14, "host_about", "string"),
    (15, "host_response_time", "string"),
    (16, "host_response_rate", "string"),
    (17, "host_acceptance_rate", "string"),
    (18, "host_is_superhost", "string"),
    (19, "host_thumbnail_url", "string"),
    (20, "host_picture_url", "string"),
    (21, "host_neighbourhood", "string"),
    (22, "host_listings_count", "string"),
    (23, "host_total_listings_count", "string"),
    (24, "host_verifications", "string"),
    (25, "host_has_profile_pic", "string"),
    (26, "host_identity_verified", "string"),
    (27, "neighbourhood", "string"),
    (28, "neighbourhood_cleansed_raw", "string"),  # UPPER() applied below
    (29, "neighbourhood_group_cleansed", "string"),
    (30, "latitude", "string"),
    (31, "longitude", "string"),
    (32, "property_type", "string"),
    (33, "room_type", "string"),
    (34, "accommodates", "string"),
    (35, "bathrooms", "string"),
    (36, "bathrooms_text", "string"),
    (37, "bedrooms", "string"),
    (38, "beds", "string"),
    (39, "amenities", "string"),
    # Deliberate scale choice (SURVEY §2.10 note): Snowflake's bare
    # ``::NUMERIC`` is NUMBER(38,0) — it ROUNDS to whole numbers. We type
    # price as decimal(10,2) (and scores/census as decimal(18,6)) instead:
    # listing prices are whole dollars in every published extract, so the
    # extra scale is lossless there, and fractional census/score columns
    # keep their published precision rather than Snowflake's integer
    # rounding. A run against true-Snowflake golden outputs that depend on
    # NUMBER(38,0) rounding would need `round(...)` added at this cast.
    (40, "price", "decimal(10,2)"),  # TRY_CAST(split_part(c40,'$',-1))
    (41, "minimum_nights", "string"),
    (42, "maximum_nights", "string"),
    (43, "minimum_minimum_nights", "string"),
    (44, "maximum_minimum_nights", "string"),
    (45, "minimum_maximum_nights", "string"),
    (46, "maximum_maximum_nights", "string"),
    (47, "minimum_nights_avg_ntm", "string"),
    (48, "maximum_nights_avg_ntm", "string"),
    (49, "calendar_updated", "string"),
    (50, "has_availability", "string"),
    (51, "availability_30", "string"),
    (52, "availability_60", "string"),
    (53, "availability_90", "string"),
    (54, "availability_365", "string"),
    (55, "calendar_last_scraped", "string"),
    (56, "number_of_reviews", "string"),
    (57, "number_of_reviews_ltm", "string"),
    (58, "number_of_reviews_l30d", "string"),
    (59, "first_review", "string"),
    (60, "last_review", "string"),
    (61, "review_scores_rating", "decimal(18,6)"),
    (62, "review_scores_accuracy", "decimal(18,6)"),
    (63, "review_scores_cleanliness", "decimal(18,6)"),
    (64, "review_scores_checkin", "decimal(18,6)"),
    (65, "review_scores_communication", "decimal(18,6)"),
    (66, "review_scores_location", "decimal(18,6)"),
    (67, "review_scores_value", "decimal(18,6)"),
    (68, "license", "string"),
    (69, "instant_bookable", "string"),
    (70, "calculated_host_listings_count", "int"),
    (71, "calculated_host_listings_count_entire_homes", "int"),
    (72, "calculated_host_listings_count_private_rooms", "int"),
    (73, "calculated_host_listings_count_shared_rooms", "int"),
    (74, "reviews_per_month", "decimal(18,6)"),
]


def build_staging_census(g01: DataFrame, g02: DataFrame) -> DataFrame:
    """staging_census (workfile_design_data_warehouse.sql:140-160): census
    G01 FULL JOIN G02 on the raw LGA code, code stripped of its 'LGA'
    prefix, selected medians/ages typed NUMERIC.

    Both sides aggregate ~130 LGAs — at scale this stays a broadcast join.
    """
    j = g01.alias("r1").join(
        g02.alias("r2"), F.col("r1.c1") == F.col("r2.c1"), "full"
    )
    num = "decimal(18,6)"
    return j.select(
        split_part(F.col("r1.c1"), "LGA", 2).cast("int").alias("lga_code"),
        F.col("r1.c4").cast(num).alias("tot_p_p"),
        F.col("r1.c55").cast(num).alias("indigenous_p_tot_p"),
        F.col("r1.c70").cast(num).alias("australian_citizen_p"),
        F.col("r2.c2").cast(num).alias("median_age_persons"),
        F.col("r2.c3").cast(num).alias("median_mortgage_repay_monthly"),
        F.col("r2.c9").cast(num).alias("average_household_size"),
        F.col("r1.c13").cast(num).alias("age_15_19_yr_p"),
        F.col("r1.c16").cast(num).alias("age_20_24_yr_p"),
        F.col("r1.c19").cast(num).alias("age_25_34_yr_p"),
        F.col("r1.c22").cast(num).alias("age_35_44_yr_p"),
        F.col("r1.c25").cast(num).alias("age_45_54_yr_p"),
        F.col("r1.c28").cast(num).alias("age_55_64_yr_p"),
        F.col("r1.c31").cast(num).alias("age_65_74_yr_p"),
        F.col("r1.c34").cast(num).alias("age_75_84_yr_p"),
    )


def build_staging_location(ssc: DataFrame, lga: DataFrame) -> DataFrame:
    """staging_location (workfile_design_data_warehouse.sql:164-182):
    mesh-block-level SSC FULL JOIN LGA, suburb/LGA names cleaned
    (``TRIM(UPPER(split_part(name,' (',1)))``), then each suburb resolved
    to the LGA owning the largest share of its total area:
    ``SUM(area) OVER (PARTITION BY lga_code)`` + row_number()=1 per suburb
    (rationale: report p4).
    """
    j = (
        ssc.alias("s")
        .join(lga.alias("l"), F.col("s.c1") == F.col("l.c1"), "full")
        .filter(F.col("l.c2").isNotNull())  # WHERE lga_code IS NOT NULL
    )
    base = j.select(
        F.col("l.c2").cast("string").alias("lga_code"),
        F.trim(F.upper(split_part(F.col("s.c3"), " (", 1))).alias("suburb_name"),
        F.trim(F.upper(split_part(F.col("l.c3"), " (", 1))).alias("lga_name"),
        F.col("s.c6").cast("decimal(18,6)").alias("area"),
    )
    total_area = F.sum("area").over(Window.partitionBy("lga_code"))
    distinct = base.select(
        "lga_code", "suburb_name", "lga_name", total_area.alias("total_area")
    ).distinct()
    w = Window.partitionBy("suburb_name").orderBy(F.desc("total_area"))
    return (
        distinct.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("lga_code", "lga_name", "suburb_name")
    )


def build_staging_listing(raw_listing: DataFrame) -> DataFrame:
    """staging_listing (workfile_design_data_warehouse.sql:187-267): typed
    74-column positional extract; price parsed via
    ``TRY_CAST(split_part(c40,'$',-1) AS NUMERIC)`` (comma prices -> NULL,
    SURVEY §2.10(2)); ``UPPER`` on neighbourhood_cleansed_raw; one row per
    (id, filename) via row_number (SURVEY §2.10(6): the reference orders
    the dedup window by the partition key itself — a no-op tiebreak kept
    for plan parity).

    Input must carry the ``filename`` lineage column from the raw reader.
    """
    cols = []
    for pos, name, typ in LISTING_COLUMNS:
        c = F.col(f"c{pos}")
        if name == "price":
            cols.append(split_part(c, "$", -1).try_cast("decimal(10,2)").alias(name))
        elif name == "neighbourhood_cleansed_raw":
            cols.append(F.upper(c).cast("string").alias(name))
        else:
            cols.append(c.cast(typ).alias(name))
    cols.append(F.col("filename"))
    w = Window.partitionBy("id", "filename").orderBy(F.col("id").desc())
    return (
        raw_listing.select(*cols)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
