"""The full 107-query Spark-vs-DuckDB differential sweep as a pytest
target: ``pytest -m oracle``. Same harness the judge runs by hand
(tools/check_oracle.py) — row count, column names, pandas dtypes, exact
canonical values. Deselected from the default run (it is the single
slowest thing in the repo); CI or a pre-commit sweep opts in explicitly.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from .conftest import SF_ORACLE


@pytest.mark.oracle
def test_full_registry_oracle_sweep(spark):
    import check_oracle

    rc = check_oracle.main([SF_ORACLE])
    assert rc == 0, "oracle sweep failed — see stdout for per-query FAIL lines"
