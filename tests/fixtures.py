"""Reference-shaped CSV fixtures (FIXTURES.md): 3 monthly listing files +
census G01/G02 + LGA + SSC, with every edge case the reference's transforms
depend on (comma prices, dup (id,filename) rows, out-of-month scrapes,
Unicode suburbs, NULL tokens, split-area suburbs, G01/G02-only LGAs).

LGA name/code map:
    10001 SYDNEY   10002 WAVERLEY   10003 NORTHERN BEACHES
    10004 MOSMAN   10005 INNER WEST
NEWTOWN spans SYDNEY and INNER WEST mesh blocks; INNER WEST has the larger
*total LGA area*, so the largest-area rule resolves NEWTOWN -> INNER WEST
(the reference's window partitions by lga_code only — design.sql:174).
"""

from __future__ import annotations

import csv
from pathlib import Path

N_COLS = 74

# header names are irrelevant (positional access) but must be unique
HEADER = [f"col{i}" for i in range(1, N_COLS + 1)]

# (pos, value) defaults for a listing row; positions are 1-based
DEFAULTS = {
    1: "l?",          # id (override)
    2: "https://x",
    3: "scrape1",
    4: "2020-05-10",  # last_scraped (override)
    9: "100",         # host_id (override)
    13: "",           # host_location (override)
    18: "f",          # host_is_superhost
    22: "2",          # host_listings_count
    27: "",           # neighbourhood (override)
    28: "Bondi",      # neighbourhood_cleansed
    32: "Apartment",  # property_type
    33: "Entire home/apt",
    34: "2",          # accommodates
    40: "$100.00",    # price
    50: "t",          # has_availability
    51: "10",         # availability_30
    61: "95",         # review_scores_rating
    # numeric-typed carry-through columns (ANSI cast would reject 'x')
    62: "90", 63: "90", 64: "90", 65: "90", 66: "90", 67: "90",
    70: "1", 71: "1", 72: "0", 73: "0",
    74: "1.5",
}


def listing_row(**overrides: str | None) -> list[str]:
    row = ["x"] * N_COLS
    for pos, val in DEFAULTS.items():
        row[pos - 1] = val
    for key, val in overrides.items():
        pos = int(key[1:])  # keys like c1, c40
        row[pos - 1] = "" if val is None else val
    return row


def _rows_for_month(month: str, year: str = "2020") -> list[list[str]]:
    d = f"{year}-{month}"
    rows = [
        # L1: host 100, Bondi listing, host in Bondi -> same LGA (WAVERLEY)
        listing_row(c1="L1", c4=f"{d}-10", c9="100", c13="Bondi, New South Wales",
                    c27="Bondi, Sydney", c28="Bondi", c40="$100.00", c51="10",
                    c50="t", c18="t", c22="2"),
        # L2: host 100, Manly listing -> different LGA (NORTHERN BEACHES)
        listing_row(c1="L2", c4=f"{d}-11", c9="100", c13="Bondi, New South Wales",
                    c27="Manly, Sydney", c28="Manly", c32="House",
                    c33="Private room", c34="1", c40="$200.00", c51="20",
                    c50="t", c18="t", c22="2"),
        # L3: comma price -> TRY_CAST NULL -> dropped from fact (SURVEY 2.10(2))
        listing_row(c1="L3", c4=f"{d}-12", c9="101", c27="Bondi, Sydney",
                    c40="$1,234.00"),
        # L4: NULL host_id -> dropped
        listing_row(c1="L4", c4=f"{d}-12", c9=None, c27="Bondi, Sydney"),
        # L5: host 102, '悉尼' -> CASE ladder -> SYDNEY; host_location NULL
        # -> MISSING; unique-listing host (count='1')
        listing_row(c1="L5", c4=f"{d}-13", c9="102", c13=None, c27="悉尼",
                    c28="Sydney", c40="$150.00", c51="0", c50="t", c22="1"),
        # L6: NULL neighbourhood -> MISSING; cleansed NULL -> 'OTHER';
        # host in Newtown -> INNER WEST (split-suburb rule); inactive
        listing_row(c1="L6", c4=f"{d}-14", c9="103", c13="Newtown, NSW",
                    c27=None, c28=None, c40="$90.00", c51="30", c50="f",
                    c18="t", c22="1"),
        # L7: exact duplicate of L5 (same id+file) -> deduped in staging
        listing_row(c1="L5", c4=f"{d}-13", c9="102", c13=None, c27="悉尼",
                    c28="Sydney", c40="$150.00", c51="0", c50="t", c22="1"),
        # L8: 'North Curl Curl Beach' -> LIKE branch -> NORTHERN BEACHES;
        # host in Manly -> NORTHERN BEACHES -> same LGA
        listing_row(c1="L8", c4=f"{d}-15", c9="104", c13="Manly - NSW",
                    c27="North Curl Curl Beach", c28="North Curl Curl",
                    c32="House", c33="Entire home/apt", c34="4",
                    c40="$300.00", c51="15", c50="t", c22="1"),
        # L9: out-of-month last_scraped -> dropped by validity filter
        listing_row(c1="L9", c4="2020-01-01", c9="105", c27="Bondi, Sydney"),
        # L10: NULL property_type (via \N token) -> kpi2 NULL-key quirk rows
        listing_row(c1="L10", c4=f"{d}-16", c9="106", c27="Mosman, Sydney",
                    c28="Mosman", c32="\\N", c40="$400.00", c51="5", c50="t",
                    c22="1"),
        # L11/L12: host 105 has both listings in MOSMAN -> '100%' bucket in adhoc c
        listing_row(c1="L11", c4=f"{d}-17", c9="105", c13="Mosman, NSW",
                    c27="Mosman, Sydney", c28="Mosman", c40="$250.00",
                    c51="25", c22="2"),
        listing_row(c1="L12", c4=f"{d}-18", c9="105", c13="Mosman, NSW",
                    c27="Balmoral Beach", c28="Mosman", c40="$260.00",
                    c51="26", c22="2"),
    ]
    return rows


def write_fixtures(root: str | Path) -> str:
    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)

    for month in ("05", "06", "07"):
        with open(root / f"{month}_2020_listings.csv", "w", newline="") as fh:
            w = csv.writer(fh, quoting=csv.QUOTE_MINIMAL)
            w.writerow(HEADER)
            w.writerows(_rows_for_month(month))

    # --- census G01: c1 code, c4 tot, c13..c34 ages, c55 indigenous, c70 citizens
    def g01_row(code: str, tot: int, ages: list[int], indig: int, cit: int) -> list[str]:
        row = ["0"] * 70
        row[0] = code
        row[3] = str(tot)
        for i, pos in enumerate((13, 16, 19, 22, 25, 28, 31, 34)):
            row[pos - 1] = str(ages[i])
        row[54] = str(indig)
        row[69] = str(cit)
        return row

    with open(root / "census_G01_NSW.csv", "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow([f"g{i}" for i in range(1, 71)])
        ages = [100, 100, 200, 150, 150, 100, 100, 100]
        w.writerow(g01_row("LGA10001", 10000, ages, 200, 8000))  # SYDNEY
        w.writerow(g01_row("LGA10002", 5000, ages, 100, 4000))   # WAVERLEY
        w.writerow(g01_row("LGA10003", 8000, ages, 150, 6000))   # NORTHERN BEACHES
        w.writerow(g01_row("LGA10004", 3000, ages, 50, 2500))    # MOSMAN
        w.writerow(g01_row("LGA10005", 6000, ages, 120, 5000))   # INNER WEST
        w.writerow(g01_row("LGA10006", 1000, ages, 10, 900))     # G01-only (full join)

    # --- census G02: c1 code, c2 median_age, c3 mortgage, c9 household size
    def g02_row(code: str, age: int, mortgage: int, hh: str) -> list[str]:
        row = ["0"] * 9
        row[0] = code
        row[1] = str(age)
        row[2] = str(mortgage)
        row[8] = hh
        return row

    with open(root / "census_G02_NSW.csv", "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow([f"h{i}" for i in range(1, 10)])
        w.writerow(g02_row("LGA10001", 35, 2000, "2.1"))
        w.writerow(g02_row("LGA10002", 38, 2600, "2.3"))
        w.writerow(g02_row("LGA10003", 42, 2400, "2.6"))
        w.writerow(g02_row("LGA10004", 44, 3000, "2.2"))
        w.writerow(g02_row("LGA10005", 33, 2200, "2.0"))
        w.writerow(g02_row("LGA10007", 50, 1500, "1.8"))         # G02-only (full join)

    # --- LGA mesh blocks: c1 mb_code, c2 lga_code, c3 "Name (C)"
    lga_rows = [
        ("MB001", "10001", "Sydney (C)"),
        ("MB002", "10001", "Sydney (C)"),
        ("MB003", "10002", "Waverley (A)"),
        ("MB004", "10003", "Northern Beaches (A)"),
        ("MB005", "10004", "Mosman (A)"),
        ("MB006", "10005", "Inner West (A)"),
        ("MB007", "10005", "Inner West (A)"),
        ("MB008", "10001", "Sydney (C)"),
    ]
    with open(root / "LGA_2020_NSW.csv", "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["mb", "lga_code", "lga_name"])
        w.writerows(lga_rows)

    # --- SSC suburbs: c1 mb_code, c3 "Suburb (SA)", c6 area
    # NEWTOWN spans MB002 (SYDNEY) and MB006 (INNER WEST).
    # Total LGA areas: SYDNEY = 10+40+5 = 55, INNER WEST = 30+30 = 60
    # -> NEWTOWN resolves to INNER WEST (larger total area).
    ssc_rows = [
        ("MB001", "Bondi Junction (NSW)", "10"),   # actually SYDNEY mesh in fixture
        ("MB002", "Newtown (NSW)", "40"),
        ("MB003", "Bondi (NSW)", "20"),
        ("MB004", "Manly (NSW)", "25"),
        ("MB005", "Mosman (NSW)", "15"),
        ("MB006", "Newtown (NSW)", "30"),
        ("MB007", "Leichhardt (NSW)", "30"),
        ("MB008", "Sydney (NSW)", "5"),
    ]
    with open(root / "SSC_2016_NSW.csv", "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["mb", "x", "ssc_name", "y", "z", "area"])
        w.writerows([(a, "x", b, "y", "z", c) for a, b, c in ssc_rows])

    return str(root)
