#!/usr/bin/env python3
"""Evidence ledger: union all CORRECTNESS_r*.json driver records, report
each registry entry's freshest driver evidence, and emit the recommended
next driver-window ``_PRIORITY`` list.

The verification driver records rows for the FIRST 50 registry entries
(insertion order = ``registry._PRIORITY``) per round, so the window must
ROTATE. The standing recipe (SURVEY §2, judge-ratified in rounds 4-6):

1. entries with NO driver row yet (newly registered), first;
2. entries whose CODE changed since their last green row (pass these via
   ``--changed name1,name2`` — the ledger can't see git);
3. oldest-evidence backfill, ascending by last-green round then
   registration order, until the 50-slot window is full.

A row is *green* when ``hash_match`` is true (sql entries) or when the
rows-only runner returned > 0 rows with ``err == "no_oracle"``. A red
LAST row always promotes the entry to the head of group 2.

Usage:
  python tools/evidence_ledger.py                 # status table
  python tools/evidence_ledger.py --priority      # emit the 50-slot list
  python tools/evidence_ledger.py --priority --changed a,b,c
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50


def load_rows() -> dict[str, tuple[int, str]]:
    """name -> (last round with a driver row, status of that last row).

    status: 'green' (hash-exact), 'ran' (rows-only, >0 rows), 'empty'
    (rows-only, 0 rows — treated as needing re-exposure), 'fail'.
    """
    last: dict[str, tuple[int, str]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            if row.get("hash_match"):
                status = "green"
            elif row.get("err") == "no_oracle":
                status = "ran" if (row.get("spark_rows") or 0) > 0 else "empty"
            else:
                status = "fail"
            prev = last.get(name)
            if prev is None or rnd >= prev[0]:
                last[name] = (rnd, status)
    return last


def registry_names() -> list[str]:
    from guidance_for_analytics_observability_on_aws_spark.plans.registry import (
        REGISTRY,
    )

    return list(REGISTRY)


def recommend(last: dict[str, tuple[int, str]], names: list[str],
              changed: list[str]) -> list[str]:
    order = {n: i for i, n in enumerate(names)}
    never = [n for n in names if n not in last]
    bad_last = [n for n in names
                if n in last and last[n][1] in ("fail", "empty")]
    chg = [n for n in changed
           if n in order and n not in never and n not in bad_last]
    head = never + bad_last + chg
    backfill = sorted(
        (n for n in names if n in last and n not in head),
        key=lambda n: (last[n][0], order[n]),
    )
    return (head + backfill)[:WINDOW]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--priority", action="store_true",
                    help="emit the recommended next _PRIORITY window")
    ap.add_argument("--changed", default="",
                    help="comma-separated entries whose code changed since "
                         "their last green row")
    args = ap.parse_args()

    last = load_rows()
    names = registry_names()
    unknown = set(last) - set(names)

    if args.priority:
        changed = [c for c in args.changed.split(",") if c]
        bad = [c for c in changed if c not in names]
        if bad:
            ap.error(f"--changed entries not in registry: {bad}")
        window = recommend(last, names, changed)
        print(json.dumps(window, indent=1))
        return

    print(f"{'entry':42s} {'last':>5s} {'status':>7s}")
    for n in sorted(names, key=lambda n: (last.get(n, (0,))[0], n)):
        rnd, status = last.get(n, (0, "NEVER"))
        print(f"{n:42s} {('r%d' % rnd) if rnd else '-':>5s} {status:>7s}")
    greens = sum(1 for r, s in last.values() if s in ("green", "ran"))
    print(f"\n{len(names)} registry entries; {len(last)} with driver rows "
          f"({greens} last-row green/ran); "
          f"{len(names) - len(last)} never checked"
          + (f"; {len(unknown)} stale rows not in registry: {sorted(unknown)}"
             if unknown else ""))


if __name__ == "__main__":
    main()
