"""Self-check harness replicating the driver's correctness gate, but
stricter: runs every registry query on Spark and its oracle on DuckDB at the
given scale factor, then compares row count, column names, pandas dtypes and
EXACT canonical values (bit-level for floats via repr).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airbnb_listings_data_pipelines_spark.queries.registry import load_all
from airbnb_listings_data_pipelines_spark.session import get_spark
from airbnb_listings_data_pipelines_spark.sources.tpch import TPCH_TABLES


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NA:
                vals.append("NULL")
            elif isinstance(v, float):
                vals.append(repr(v))
            else:
                vals.append(str(v))
        rows.append(tuple(vals))
    return sorted(rows)


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    reg = load_all()
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    # q24 is the ONLY oracle allowed to hardcode a testdata path (DuckDB's
    # filename pseudo-column needs a direct read_parquet scan); a second
    # hardcoded-path oracle would silently dodge the rewrite below.
    offenders = [
        n for n, s in reg.items()
        if s.oracle and "/root/testdata/" in s.oracle and n != "q24_file_lineage"
    ]
    assert not offenders, f"hardcoded testdata paths in oracles: {offenders}"

    n_pass = n_fail = n_rows_only = 0
    for name, spec in sorted(reg.items()):
        if only and name not in only:
            continue
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"rows  {name}: rows-only ({len(sdf)} rows)")
            n_rows_only += 1
            continue
        try:
            # q24's oracle must hardcode the driver's sf0.01 path (DuckDB's
            # filename pseudo-column only exists on a direct read_parquet
            # scan, not through the pre-registered views). Rewrite it to
            # THIS run's sf_dir so cross-SF sweeps compare like with like;
            # the string the driver executes at sf0.01 is unchanged.
            oracle_sql = spec.oracle.replace("/root/testdata/sf0.01", sf_dir)
            odf = con.sql(oracle_sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        else:
            sd = {c: str(sdf[c].dtype) for c in sorted(sdf.columns)}
            od = {c: str(odf[c].dtype) for c in sorted(odf.columns)}
            dt = {c: (sd[c], od[c]) for c in sd if sd[c] != od[c]}
            if dt:
                problems.append(f"dtypes {dt}")
            cs, co = canon(sdf), canon(odf)
            if cs != co and not problems:
                diff = [(a, b) for a, b in zip(cs, co) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(sdf)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
