"""Warehouse layer — star schema: ``dim_census`` + ``fact_listing``
(reference: workfile_design_data_warehouse.sql:278-549).

The fact table is a monthly-snapshot accumulating fact (SCD-by-snapshot):
PK (id, filename), one full row per listing per monthly scrape file
(design.sql:413; report p5). At scale: write partitioned by ``file_date``
so each monthly load appends exactly one partition (SURVEY §4.2(3)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.dialect import multi_replace, split_part

# --- suburb -> LGA fallback ladders (design.sql:473-541) -------------------
# Transcribed branch-for-branch, order preserved (first match wins):
# 'DEE WHY BEACH' appears twice and '悉尼' maps to SYDNEY before RANDWICK —
# both quirks load-bearing (SURVEY §2.10(5)).

_NEIGHBOURHOOD_NB = (
    "AVALON",
    "BILGOLA",
    "COLLAROY BEACH",
    "DEE WHY BEACH",
    "GREAT MACKERAL BEACH",
    "DEE WHY BEACH",  # duplicate kept for parity (design.sql:484)
    "MANLY BEACH",
    "MANLY BEACON HILL",
    "NEWPORT BEACH",
    "NORTH NORTH CURL CURL",
    "NORTHERN BEACHES",
    "WARRIEWOOD BEACH",
)


def _neighbourhood_fallback(suburb: Column) -> Column:
    """The ~30-branch neighbourhood_suburb -> LGA CASE ladder
    (design.sql:477-529), evaluated only when the location join missed."""
    return (
        F.when(
            suburb.isin(*_NEIGHBOURHOOD_NB) | suburb.like("NORTH CURL CURL%"),
            "NORTHERN BEACHES",
        )
        .when(suburb == "BALMORAL BEACH", "MOSMAN")
        .when(suburb == "BARPOINT", "CENTRAL COAST")
        .when(suburb == "BEACONSFIED", "SYDNEY")
        .when(suburb.isin("BEROWRA CREEK", "SYDNEY BEROWRA HEIGHTS"), "HORNSBY")
        .when(suburb == "BONDI JUNCTION SYDNEY", "WAVERLEY")
        .when(suburb == "BRIGHTON LE SANDS", "BAYSIDE")
        .when(
            suburb.like("%DARLING HARBOUR")
            | suburb.isin(
                "DARLINGHURST SYDNEY",
                "KINGS CROSS",
                "PORT JACKSON",
                "SYDNEY HARBOUR",
                "SYNDEY",
                "РЕДФЕРН",
                "悉尼",
            ),
            "SYDNEY",
        )
        .when(suburb == "HURSTVILLE SYDNEY", "GEORGES RIVER")
        .when(
            suburb.isin("KENSIGNTON", "MAROUBRA BEACH", "MAROUBRA JUNCTION", "悉尼"),
            "RANDWICK",  # '悉尼' unreachable here: SYDNEY branch above wins
        )
        .when(suburb == "LIDCOMBE -SYDNEY", "PARRAMATTA")
        .when(suburb == "MANAHAN", "CANTERBURY-BANKSTOWN")
        .when(suburb == "MOSMAN SYDNEY", "MOSMAN")
        .when(suburb == "NSW 2065 AUSTRALIA", "WILLOUGHBY")
        .when(suburb.isin("ROCKDALE CITY", "石谷市"), "BAYSIDE")
        .when(suburb == "TOONGABBIE EAST", "BLACKTOWN")
        .when(suburb == "스트라스필드", "STRATHFIELD")
        .when(suburb.isNull(), "MISSING")
        .otherwise("OTHER")
    )


def _host_fallback(suburb: Column) -> Column:
    """host_suburb -> LGA CASE ladder (design.sql:530-541)."""
    return (
        F.when(suburb == "AVALON", "NORTHERN BEACHES")
        .when(suburb == "BELA VISTA", "THE HILLS SHIRE")
        .when(suburb == "BEVERLY PARK", "GEORGES RIVER")
        .when(suburb == "CENTRAL BUSINESS DISTRICT", "SYDNEY")
        .when(suburb == "DECEYVILLE", "BAYSIDE")
        .when(suburb.isNull(), "MISSING")
        .otherwise("OTHER")
    )


def build_dim_census(staging_census: DataFrame) -> DataFrame:
    """dim_census (design.sql:278-317): staging_census with lga_code as
    VARCHAR PK. ~130 rows — always the broadcast side of star joins."""
    return staging_census.select(
        F.col("lga_code").cast("string").alias("lga_code"),
        *[c for c in staging_census.columns if c != "lga_code"],
    )


def build_fact_listing(staging_listing: DataFrame, staging_location: DataFrame) -> DataFrame:
    """fact_listing (design.sql:419-549), preserved shape:

    1. filter ``price IS NOT NULL AND host_id IS NOT NULL`` (design.sql:459)
    2. derive host_suburb / neighbourhood_suburb (split+replace chains,
       design.sql:451-453), file_month/file_year from the filename
       (design.sql:454-455), listing_year/month (design.sql:456-457)
    3. LEFT JOIN staging_location twice on the derived suburbs
       (design.sql:461-464) — broadcast: location is ~4.5k rows
    4. month-window validity filter on last_scraped vs file_date
       (design.sql:543, inclusive BETWEEN — SURVEY §2.10(7))
    5. CASE-ladder fallbacks -> neighbourhood_lga / host_lga
    6. LEFT JOIN the deduped (lga_name, lga_code) dimension twice
       (design.sql:545-548) to resolve codes.
    """
    f = staging_listing.filter(
        F.col("price").isNotNull() & F.col("host_id").isNotNull()
    )
    f = f.withColumns(
        {
            "host_suburb": F.upper(
                F.trim(split_part(split_part(F.col("host_location"), ",", 1), "-", 1))
            ),
            "neighbourhood_suburb": F.trim(
                multi_replace(
                    F.upper(split_part(split_part(F.col("neighbourhood"), ",", 1), "/", 1)),
                    [("COUNCIL", ""), ("CITY OF", ""), ("OF THE", ""), ("SAINT", "ST")],
                )
            ).cast("string"),
            "file_month": split_part(F.col("filename"), "_", 1).cast("int"),
            "file_year": split_part(split_part(F.col("filename"), ".", 1), "_", 2).cast("int"),
            "listing_year": F.year("last_scraped"),
            "listing_month": F.month("last_scraped"),
        }
    )
    loc = F.broadcast(staging_location)
    s1 = loc.select(
        F.col("suburb_name").alias("__s1_suburb"),
        F.col("suburb_name").alias("neighbourhood_suburbname"),
        F.col("lga_name").alias("neighbourhood_lganame"),
    )
    s2 = loc.select(
        F.col("suburb_name").alias("__s2_suburb"),
        F.col("suburb_name").alias("host_suburbname"),
        F.col("lga_name").alias("host_lganame"),
    )
    cte = (
        f.join(s1, f.neighbourhood_suburb == s1.__s1_suburb, "left")
        .join(s2, f.host_suburb == s2.__s2_suburb, "left")
        .drop("__s1_suburb", "__s2_suburb")
        .withColumn("file_date", F.make_date("file_year", "file_month", F.lit(1)))
    )
    cte = cte.filter(
        (F.col("last_scraped") >= F.col("file_date"))
        & (F.col("last_scraped") <= F.last_day(F.col("file_date")))
    )
    cte = cte.withColumns(
        {
            "neighbourhood_cleansed": F.when(
                F.col("neighbourhood_cleansed_raw").isNull(), "OTHER"
            ).otherwise(F.col("neighbourhood_cleansed_raw")),
            "neighbourhood_lga": F.when(
                F.col("neighbourhood_lganame").isNull(),
                _neighbourhood_fallback(F.col("neighbourhood_suburb")),
            ).otherwise(F.col("neighbourhood_lganame")),
            "host_lga": F.when(
                F.col("host_lganame").isNull(), _host_fallback(F.col("host_suburb"))
            ).otherwise(F.col("host_lganame")),
        }
    )
    dim = F.broadcast(staging_location.select("lga_name", "lga_code").distinct())
    d1 = dim.select(
        F.col("lga_name").alias("__d1_name"), F.col("lga_code").alias("neighbourhood_lga_code")
    )
    d2 = dim.select(
        F.col("lga_name").alias("__d2_name"), F.col("lga_code").alias("host_lga_code")
    )
    return (
        cte.join(d1, cte.neighbourhood_lga == d1.__d1_name, "left")
        .join(d2, cte.host_lga == d2.__d2_name, "left")
        .drop("__d1_name", "__d2_name")
    )


def write_fact_partitioned(fact: DataFrame, path: str) -> None:
    """Persist the fact table partitioned by file_date: each monthly load
    appends one partition — the Spark-idiomatic form of the reference's
    per-file incremental refresh (populate.py:176-178).

    Repartition on the partition column first so each month writes ONE file
    instead of one-per-task (24 input tasks x 12 months = ~288 small files
    otherwise — the small-files problem that kills object-store listings at
    scale)."""
    fact.repartition("file_date").write.mode("overwrite").partitionBy("file_date").parquet(path)
