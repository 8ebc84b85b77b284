"""Suggest the next round's AUDIT_PRIORITY (catalog.py).

The external driver hash-audits the FIRST 50 entries of all_queries()
per round. This tool reads every CORRECTNESS_r*.json in the repo root,
ranks catalog entries by audit staleness (never-audited first, then
oldest last-audit round, registration order as tiebreak), and prints a
ready-to-paste priority list of 50 — so each round rotates the hard
signal onto the entries that have gone longest without it.

Any entry that FAILED its most recent audit is pinned to the very
front regardless of staleness (a fix must be re-proven before anything
else gets the slot).

Usage: python tools/audit_rotation.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50


def main() -> int:
    from dataengineer_job_scraper_etl_spark import catalog

    # registration order WITHOUT the current priority reordering
    names = list(catalog._REGISTRY) or list(catalog.all_queries())
    if not names:
        names = list(catalog.all_queries())

    last_round: dict[str, int] = {}
    failed_latest: set[str] = set()
    rounds = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    for path in rounds:
        rnd = int("".join(c for c in os.path.basename(path) if c.isdigit()))
        with open(path, encoding="utf-8") as f:
            data = json.load(f)
        for name, rec in data.items():
            last_round[name] = max(rnd, last_round.get(name, 0))
            ok = all(
                rec.get(k) is not False
                for k in ("rows_match", "schema_match", "hash_match")
            ) and rec.get("err") in (None, "no_oracle")
            if not ok:
                failed_latest.add(name)
            elif name in failed_latest and last_round[name] == rnd:
                failed_latest.discard(name)  # later round went green

    order = sorted(
        (n for n in names),
        key=lambda n: (
            0 if n in failed_latest else 1,
            last_round.get(n, -1),  # never audited -> -1 -> earliest
            names.index(n),
        ),
    )
    pick = order[:WINDOW]
    print(f"# next AUDIT_PRIORITY ({len(pick)} of {len(names)} entries; "
          f"source rounds: {[os.path.basename(p) for p in rounds]})")
    for n in pick:
        tag = (
            "FAILED-LAST-AUDIT" if n in failed_latest
            else ("never audited" if n not in last_round
                  else f"last r{last_round[n]}")
        )
        print(f'    "{n}",  # {tag}')
    return 0


if __name__ == "__main__":
    sys.exit(main())
