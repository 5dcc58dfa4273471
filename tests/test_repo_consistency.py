"""Guards for the documentation/registry consistency class the round-3 and
round-4 ADVICE flagged (stale counts, window-comment drift): the registry
size cited in README/pyproject and the window bookkeeping in
__spark_entry__.py must match the actual registry, and every _CHECK_FIRST
entry must exist."""

from __future__ import annotations

import importlib.util
import re
from pathlib import Path

from airbnb_listings_data_pipelines_spark.queries.registry import load_all

REPO = Path(__file__).resolve().parents[1]


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_consistency", str(REPO / "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_registry_count_citations_match_reality():
    n = len(load_all())
    readme = open(REPO / "README.md").read()
    m = re.search(r"registry: (\d+) queries", readme)
    assert m and int(m.group(1)) == n, f"README cites {m and m.group(1)}, registry has {n}"
    pyproject = open(REPO / "pyproject.toml").read()
    m2 = re.search(r"differential sweep \((\d+) queries\)", pyproject)
    assert m2 and int(m2.group(1)) == n, f"pyproject cites {m2 and m2.group(1)}, registry has {n}"


def test_check_first_entries_exist_and_are_unique():
    reg = load_all()
    m = _entry_module()
    cf = m._CHECK_FIRST
    missing = [q for q in cf if q not in reg]
    assert not missing, f"_CHECK_FIRST names absent from registry: {missing}"
    assert len(cf) == len(set(cf)), "duplicate _CHECK_FIRST entries"
    # the ordering contract: queries() starts with _CHECK_FIRST, then the rest
    qs = list(m.queries())
    assert qs[: len(cf)] == cf
    assert len(qs) == len(reg)


def test_every_query_has_an_oracle():
    m = _entry_module()
    qs, osql = m.queries(), m.oracle_sql()
    assert set(osql) == set(qs), "every registry query carries an oracle (round-2 invariant)"
