"""Regenerate the audit window AND splice it into catalog.py.

Wraps tools/audit_rotation.py's plan_window(): computes the next
50-entry window (updating the source-hash ledger), then rewrites the
``AUDIT_SCHEDULE_META`` / ``AUDIT_SCHEDULE`` block in
dataengineer_job_scraper_etl_spark/catalog.py in place. The window
comment above the block is NOT touched — update it by hand when the
round story changes (it documents WHY the head looks the way it does).

Run after every new @register() so the late-registration rule seats
the entry immediately (tests/test_audit_rotation.py's
evidenced-or-scheduled and matches-regeneration tests both go red on a
registered-but-unscheduled entry).

Usage: python tools/install_schedule.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CATALOG = os.path.join(
    REPO, "dataengineer_job_scraper_etl_spark", "catalog.py"
)


def main() -> int:
    from audit_rotation import plan_window

    plan = plan_window(update_ledger=True)
    lines = []
    for n in plan["pick"]:
        tag = (
            "rows-only head slot (never seen or stale evidence)"
            if n in plan["no_oracle_head"]
            else "FAILED-LAST-AUDIT" if n in plan["failed_latest"]
            else "never audited - leads (late registration)"
            if n not in plan["last_round"]
            else "SOURCE-CHANGED since last snapshot"
            if n in plan["changed"]
            else f"last r{plan['last_round'][n]}"
        )
        lines.append(f'    "{n}",  # {tag}')

    with open(CATALOG, encoding="utf-8") as f:
        src = f.read()
    meta_marker = "AUDIT_SCHEDULE_META = "
    m_start = src.index(meta_marker)
    m_end = src.index("\n", m_start)
    src = (
        src[:m_start]
        + meta_marker
        + f'{{"generated_after_round": {plan["next_round"] - 1}}}'
        + src[m_end:]
    )
    list_marker = "AUDIT_SCHEDULE: list[str] = ["
    l_start = src.index(list_marker) + len(list_marker)
    l_end = src.index("\n]", l_start)
    src = src[:l_start] + "\n" + "\n".join(lines) + src[l_end:]

    # validate BEFORE overwriting: a bad splice must fail side-effect
    # free, not leave an unparseable catalog.py on disk
    import ast

    ast.parse(src)
    with open(CATALOG, "w", encoding="utf-8") as f:
        f.write(src)
    print(
        f"installed: {len(plan['pick'])} entries, clock r"
        f"{plan['next_round'] - 1}; head "
        f"{len(plan['no_oracle_head'])} rows-only + "
        f"{sum(1 for n in plan['pick'] if n not in plan['last_round'] and n not in plan['no_oracle_head'])}"
        f" never-audited + {len(plan['changed'] & set(plan['pick']))} changed"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
