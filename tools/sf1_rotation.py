"""Rotate sf1-scale correctness evidence like the driver audit window.

VERDICT r7 #3: the monolithic full-catalog sf1 sweep is too slow to
re-run per round (~4 entries/15 min through the clustering family), so
without a rotation the sf1 rung stale-drifts exactly like driver
audits did in r5/r6. This tool keeps a per-entry ledger of the last
round each entry was verified against the sf1 fixture
(``SF1_EVIDENCE.json``) and emits a ~25-entry stalest-first slice to
run each round.

The sf1 fixture is generated OUTSIDE the repo (multi-GB):

    python tools/gen_sf.py            # -> /tmp/spark_graft_testdata/sf1

Usage:
    python tools/sf1_rotation.py plan [N]
        print the N (default 25) stalest oracle-bearing entries, plus
        the ready-to-run check.py command.
    python tools/sf1_rotation.py record <round> <entry> [entry ...]
        mark entries as sf1-verified in <round> (run AFTER check.py
        reports them green — the ledger is evidence bookkeeping, not
        the check itself).

Ledger seed (round 8): every entry that existed in round 6 carries
r6's full-catalog sf1 sweep; the 21 round-7 additions carry their
individual 3-rung checks (PLANS.md r7). Entries absent from the
ledger (new this round) sort first.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LEDGER = os.path.join(REPO, "SF1_EVIDENCE.json")
SLICE = 25
SF1_DIR = "/tmp/spark_graft_testdata/sf1"


def _load() -> dict[str, dict]:
    """Ledger rows are {"round": N, ...optional metrics fields}.
    Legacy bare-int rows (rounds <= 8) normalize on read; the next
    record/metrics write migrates them on disk (VERDICT r8 ask #7:
    the 100 TB extrapolation wants peak-memory/shuffle/state numbers
    next to the round stamp, not just plan shapes)."""
    if not os.path.exists(LEDGER):
        return {}
    with open(LEDGER, encoding="utf-8") as f:
        raw = json.load(f)
    return {
        k: (v if isinstance(v, dict) else {"round": v})
        for k, v in raw.items()
    }


def _save(ledger: dict[str, dict]) -> None:
    with open(LEDGER, "w", encoding="utf-8") as f:
        json.dump(dict(sorted(ledger.items())), f, indent=1)
        f.write("\n")


def main() -> int:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "plan"
    ledger = _load()

    if cmd == "record":
        rnd = int(sys.argv[2])
        for name in sys.argv[3:]:
            row = ledger.get(name, {"round": 0})
            row["round"] = max(rnd, row.get("round", 0))
            ledger[name] = row
        _save(ledger)
        print(f"recorded r{rnd} for {len(sys.argv) - 3} entries")
        return 0

    from dataengineer_job_scraper_etl_spark import catalog

    n = int(sys.argv[2]) if len(sys.argv) > 2 else SLICE
    qs = catalog.all_queries()
    names = [m for m, q in qs.items() if q.oracle is not None]
    stalest = sorted(
        names,
        key=lambda m: (ledger.get(m, {}).get("round", -1), names.index(m)),
    )[:n]
    print(f"# sf1 slice ({n} stalest of {len(names)} oracle-bearing):")
    for m in stalest:
        print(
            f"#   {m}  (last sf1: "
            f"r{ledger.get(m, {}).get('round', '—never—')})"
        )
    print(
        f"timeout 3000 python tools/check.py {SF1_DIR} "
        + " ".join(stalest)
    )
    print(
        "# then: python tools/sf1_rotation.py record <round> "
        + " ".join(stalest)
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
