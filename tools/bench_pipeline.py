"""Reference-scale pipeline benchmark: synthesizes 12 monthly listing CSVs
(~30k rows each — the reference's real volume, report p2) plus census/
location files, runs the full ELT (staging -> warehouse -> datamart ->
ad-hoc a-d), and prints one JSON line of phase timings.

Usage: python tools/bench_pipeline.py [rows_per_month] [months]
"""

from __future__ import annotations

import csv
import json
import os
import random
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from fixtures import HEADER, listing_row, write_fixtures  # noqa: E402

from airbnb_listings_data_pipelines_spark.plans.pipeline import run_adhoc, run_pipeline  # noqa: E402
from airbnb_listings_data_pipelines_spark.session import get_spark  # noqa: E402

SUBURBS = ["Bondi", "Manly", "Newtown", "Mosman", "Sydney", "Leichhardt", "Bondi Junction"]
PTYPES = ["Apartment", "House", "Townhouse", "Villa", "Loft"]
RTYPES = ["Entire home/apt", "Private room", "Shared room", "Hotel room"]


def synth(root: Path, rows_per_month: int, months: int) -> None:
    rng = random.Random(42)
    write_fixtures(root)  # census/LGA/SSC + 3 small files (overwritten below)
    for f in root.glob("*_listings.csv"):
        f.unlink()
    for m in range(months):
        month = (4 + m) % 12 + 1
        year = 2020 + (4 + m) // 12
        d = f"{year}-{month:02d}"
        with open(root / f"{month:02d}_{year}_listings.csv", "w", newline="") as fh:
            w = csv.writer(fh, quoting=csv.QUOTE_MINIMAL)
            w.writerow(HEADER)
            for i in range(rows_per_month):
                sub = SUBURBS[rng.randrange(len(SUBURBS))]
                host = rng.randrange(rows_per_month // 3)
                price = rng.randrange(50, 999)
                price_s = f"$1,{price:03d}.00" if rng.random() < 0.02 else f"${price}.00"
                w.writerow(
                    listing_row(
                        c1=f"L{i}",
                        c4=f"{d}-{rng.randrange(1, 28):02d}",
                        c9=str(host),
                        c13=f"{sub}, NSW" if rng.random() > 0.05 else None,
                        c27=f"{sub}, Sydney",
                        c28=sub,
                        c32=PTYPES[rng.randrange(len(PTYPES))],
                        c33=RTYPES[rng.randrange(len(RTYPES))],
                        c34=str(rng.randrange(1, 9)),
                        c40=price_s,
                        c50="t" if rng.random() < 0.8 else "f",
                        c51=str(rng.randrange(0, 31)),
                        c18="t" if rng.random() < 0.3 else "f",
                        c22=str(rng.choice([1, 1, 2, 3, 10])),
                    )
                )


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
    months = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    root = Path(tempfile.mkdtemp(prefix="pipe_bench_"))
    synth(root, rows, months)

    spark = get_spark("pipeline-bench")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    # prime executor pool / codegen / output committer (same methodology as
    # bench.py: session startup is excluded, phases are measured warm)
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    t0 = time.perf_counter()
    res = run_pipeline(
        spark, str(root), persist_dir=str(root / "warehouse"), register_views=False
    )
    timings["elt_to_fact"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    for name in (
        "kpi_neighbourhood_month",
        "kpi_neighbourhood_month_raw",
        "kpi_property_month",
        "kpi_host_neighbourhood_month",
    ):
        getattr(res, name).write.format("noop").mode("overwrite").save()
    timings["kpi_views"] = round(time.perf_counter() - t0, 3)

    # opt-in single-pass form of kpi1/kpi1_raw/kpi2 (parity caveats in
    # plans/datamart.kpi_view_single_pass) — quantifies the 4-scan+3-full-
    # join cost the reference shape pays
    from airbnb_listings_data_pipelines_spark.plans.datamart import kpi_view_single_pass

    t0 = time.perf_counter()
    for keys in (
        ["neighbourhood_lga"],
        ["neighbourhood_cleansed"],
        ["property_type", "room_type", "accommodates"],
    ):
        kpi_view_single_pass(res.fact_listing, keys).write.format("noop").mode(
            "overwrite"
        ).save()
    timings["kpi_views_single_pass"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    for df in run_adhoc(res).values():
        df.write.format("noop").mode("overwrite").save()
    timings["adhoc_a_d"] = round(time.perf_counter() - t0, 3)

    fact_rows = res.fact_listing.count()
    print(
        json.dumps(
            {
                "metric": "pipeline_reference_scale_runtime",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "phases": timings,
                "fact_rows": fact_rows,
                "rows_per_month": rows,
                "months": months,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
