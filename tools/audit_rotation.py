"""Generate the next round's AUDIT_SCHEDULE (catalog.py).

The external driver hash-audits the FIRST 50 entries of
__spark_entry__.queries() per round; the adapter orders them by
catalog.AUDIT_SCHEDULE (the public all_queries() stays in stable
registration order). This tool reads every CORRECTNESS_r*.json in the
repo root and prints a ready-to-paste 50-entry schedule:

1. entries that FAILED their most recent audit (a fix must be
   re-proven before anything else gets a slot),
2. entries never hash-audited, registration order,
3. everything else by last-audit round, oldest first.

Entries registered with ``oracle=None`` normally DON'T get slots: the
driver records ``err: no_oracle`` plus a rows-only check for them, and
their real contracts are oracle-checked twin entries (planted-recall /
recall-floor / contract queries) — so a recurring window slot on them
is wasted. EXCEPTION (VERDICT r7 ask #4): a no-oracle entry that has
NEVER appeared in any driver window gets one slot, at the head, so it
carries at least rows-only driver evidence (non-null spark_rows, no
real err); once any CORRECTNESS_r*.json shows it, it rotates out of
contention permanently.

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

    qs = catalog.all_queries()  # registration order
    names = [n for n, q in qs.items() if q.oracle is not None]
    skipped = [n for n, q in qs.items() if q.oracle is None]

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

    # One-time rows-only slots for no-oracle entries with zero driver
    # evidence; once seen in any CORRECTNESS file they never re-enter.
    no_oracle_head = [n for n in skipped if n not in last_round]

    order = sorted(
        names,
        key=lambda n: (
            0 if n in failed_latest else 1,
            last_round.get(n, -1),  # never audited -> -1 -> earliest
            names.index(n),
        ),
    )
    pick = no_oracle_head + order[: WINDOW - len(no_oracle_head)]
    print(
        f"# next AUDIT_SCHEDULE ({len(pick)} entries: "
        f"{len(no_oracle_head)} one-time rows-only head "
        f"{no_oracle_head} + oracle-bearing rotation over {len(names)}; "
        f"{len(skipped)} no-oracle entries total;\n"
        f"# source rounds: {[os.path.basename(p) for p in rounds]})"
    )
    for n in pick:
        tag = (
            "never audited, rows-only one-time slot"
            if n in no_oracle_head
            else "FAILED-LAST-AUDIT" if n in failed_latest
            else ("never audited" if n not in last_round
                  else f"last r{last_round[n]}")
        )
        print(f'    "{n}",  # {tag}')
    return 0


if __name__ == "__main__":
    sys.exit(main())
