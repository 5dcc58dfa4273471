"""Per-query regression compare between two BENCH_DETAIL-shaped files.

Usage: python3 tools/bench_compare.py OLD.json NEW.json [--bar 0.30 --abs 0.5]

Flags a query when new > old * (1 + bar) AND new - old > abs — the
repo's 30%+0.5s regression bar. Refuses (exit 2) when the two files
carry different testdata lineages (cross-lineage comparisons don't
count, the round-8 lesson). Exit 1 when any query is flagged.
"""
from __future__ import annotations

import json
import sys


def main() -> int:
    bar = 0.30
    absf = 0.5
    args: list[str] = []
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--bar":
            bar = float(next(it))
        elif a == "--abs":
            absf = float(next(it))
        elif a.startswith("--"):
            print(f"unknown flag {a!r}")
            return 2
        else:
            args.append(a)
    if len(args) != 2:
        print(__doc__.strip().splitlines()[2])
        return 2
    old = json.load(open(args[0]))
    new = json.load(open(args[1]))
    lo = (old.get("lineage") or {}).get("digest")
    ln = (new.get("lineage") or {}).get("digest")
    if lo != ln:
        print(f"REFUSED: cross-lineage compare ({lo} vs {ln})")
        return 2
    flagged = []
    sp_old = old.get("spread") or {}
    sp_new = new.get("spread") or {}
    for q, t_old in sorted(old["queries"].items()):
        t_new = new["queries"].get(q)
        if t_new is None:
            continue
        stat = "min"
        if q in sp_old and q in sp_new:
            # high-variance class: trend MEDIANS (both files carry the
            # run spread) — the min floor under-reports a real shift and
            # a single outlier run over-reports one
            t_old, t_new = sp_old[q]["median"], sp_new[q]["median"]
            stat = "median"
        if t_new > t_old * (1 + bar) and t_new - t_old > absf:
            flagged.append((q, t_old, t_new, stat))
    for q, a, b, st in flagged:
        print(
            f"REGRESSION {q} ({st}): {a:.2f}s -> {b:.2f}s "
            f"(+{(b / a - 1) * 100:.0f}%)"
        )
    common = [q for q in old["queries"] if q in new["queries"]]
    s_old = sum(old["queries"][q] for q in common)
    s_new = sum(new["queries"][q] for q in common)
    print(
        f"common {len(common)} queries: {s_old:.1f}s -> {s_new:.1f}s "
        f"({(s_new / s_old - 1) * 100:+.1f}%); flagged: {len(flagged)}"
    )
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
