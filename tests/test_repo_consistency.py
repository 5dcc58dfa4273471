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


def _latest_green_rounds():
    """Union over CORRECTNESS_r*.json: each query's newest driver-green round.

    Three round-1 names (x06_minhash_lsh_pairs, x10_lsh_ann_topk,
    x14_ivf_ann_topk) were renamed to *_recall in round 2 when they gained
    invariant oracles; the old names never passed and are excluded by the
    green filter, so renamed history is tolerated automatically.
    """
    import glob
    import json

    import os

    latest: dict[str, int] = {}
    for f in glob.glob(str(REPO / "CORRECTNESS_r*.json")):
        # match on the basename: the absolute path may itself contain
        # "r<digits>" (e.g. /home/user2/), which re.search would hit first
        m = re.search(r"CORRECTNESS_r(\d+)", os.path.basename(f))
        d = json.load(open(f))
        qs = d.get("queries", d)
        for k, v in qs.items():
            if (
                isinstance(v, dict)
                and v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match", True)
            ):
                latest[k] = max(latest.get(k, 0), int(m.group(1)))
    return latest


def test_window_rotation_covers_stalest_evidence():
    """The 50-slot driver window must lead with the queries whose driver
    evidence is oldest, so no query's evidence ages indefinitely. Derived
    from the committed CORRECTNESS_r*.json files rather than a hand-kept
    list (the round-5 verdict's window-totality ask)."""
    latest = _latest_green_rounds()
    if not latest:  # fresh clone without driver artifacts
        return
    reg = load_all()
    m = _entry_module()
    window = list(m.queries())[:50]
    never_checked = [q for q in reg if q not in latest]
    # Brand-new queries (added after the last driver run) may overflow a
    # full window — they are queued for the next rotation; only enforce
    # when slots exist.
    stale_round = min(latest[q] for q in reg if q in latest)
    stalest = [q for q in reg if latest.get(q, 0) == stale_round]
    must_cover = (never_checked + stalest)[:50]
    missing = [q for q in must_cover if q not in window]
    assert not missing, (
        f"driver window misses stalest-evidence queries (round {stale_round}): {missing}"
    )
