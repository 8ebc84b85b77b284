"""Generate the round-wrap numbers instead of hand-writing them.

VERDICT r8 "What's wrong" #3: PLANS.md said "303 passed" where the
judge measured 304 — wrap counts drift when written by hand. This
prints one JSON object with every number a wrap note cites:

- tests_collected: pytest --collect-only count (NOT a pass count —
  still run the suite; this pins the denominator),
- registry_entries / oracle_bearing / no_oracle: from the imported
  catalog (the same recount the judge performs),
- audit_window: len(catalog.AUDIT_SCHEDULE),
- headline_entries: len(bench.HEADLINE) that are registered,
- loc_source / loc_tests: non-blank line counts (diagnostic LoC, the
  judge's prescribed measure),
- unevidenced_not_scheduled: registered entries with NO driver
  CORRECTNESS row that are ALSO missing from the next window
  (VERDICT r9 ask #2: corpus_pipeline_decontaminated registered after
  the r9 schedule froze and silently missed a round; a late
  registration must either have evidence or lead the next window).
  Non-empty -> exit 1, so the wrap step fails loudly.
- pytest skip bookkeeping (VERDICT r11 ask #7): the schedule-equality
  test (tests/test_audit_rotation.py) RUNS while the committed
  schedule's clock is current and BY DESIGN starts skipping the
  moment the driver's next CORRECTNESS artifact lands — so the skip
  count the judge measures on the judged tree exceeds the at-wrap
  count by exactly one whenever the clock is current at wrap. Pass
  the final full run's skip count via --pytest-skips N and this tool
  records both numbers; without it, it still records whether the
  clock-gated flip is armed.

Usage: python tools/wrap_counts.py [--pytest-skips N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _loc(root: str, skip_tests: bool) -> int:
    total = 0
    for dirpath, _, files in os.walk(root):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            if skip_tests and os.sep + "tests" + os.sep in path:
                continue
            with open(path, encoding="utf-8") as f:
                total += sum(1 for ln in f if ln.strip())
    return total


def unevidenced_not_scheduled() -> list[str]:
    """Registered entries with no driver CORRECTNESS row in any round
    AND no slot in the next AUDIT_SCHEDULE — must be empty at wrap
    (also pinned by tests/test_audit_rotation.py)."""
    import glob
    import json as _json

    from dataengineer_job_scraper_etl_spark import catalog

    evidenced: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path, encoding="utf-8") as f:
            evidenced.update(_json.load(f))
    sched = set(catalog.AUDIT_SCHEDULE)
    return sorted(
        n for n in catalog.all_queries() if n not in evidenced and n not in sched
    )


def clock_gated_skip_armed() -> bool:
    """True when the schedule-equality test currently RUNS (the
    committed clock matches the evidence on disk) and will therefore
    flip to a skip once the driver's next CORRECTNESS file lands —
    the +1 the judged tree's skip count carries over the wrap's."""
    import glob

    from dataengineer_job_scraper_etl_spark import catalog

    on_disk = 0
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int("".join(c for c in os.path.basename(path) if c.isdigit()))
        on_disk = max(on_disk, rnd)
    return catalog.AUDIT_SCHEDULE_META["generated_after_round"] == on_disk


def main() -> int:
    from dataengineer_job_scraper_etl_spark import catalog

    qs = catalog.all_queries()
    oracle_bearing = sum(1 for q in qs.values() if q.oracle is not None)

    skips_at_wrap = None
    if "--pytest-skips" in sys.argv:
        skips_at_wrap = int(sys.argv[sys.argv.index("--pytest-skips") + 1])
    armed = clock_gated_skip_armed()

    import bench

    headline = sum(1 for n in bench.HEADLINE if n in qs)

    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    collected = None
    for line in reversed(proc.stdout.splitlines()):
        # "N tests collected in Xs" or "N/M tests collected"
        if "collected" in line or "test" in line:
            toks = [t for t in line.replace("/", " ").split() if t.isdigit()]
            if toks:
                collected = int(toks[0])
                break

    gap = unevidenced_not_scheduled()
    print(
        json.dumps(
            {
                "tests_collected": collected,
                "unevidenced_not_scheduled": gap,
                # ask r11 #7: the judged tree's skip count = at-wrap
                # count + 1 iff the clock-gated flip is armed
                "pytest_skips_at_wrap": skips_at_wrap,
                "clock_gated_skip_armed": armed,
                "pytest_skips_expected_post_driver": (
                    None
                    if skips_at_wrap is None
                    else skips_at_wrap + (1 if armed else 0)
                ),
                # VERDICT r12 ask #3: the full triple the judge will
                # measure on the judged tree (a fresh run AFTER the
                # driver's artifact lands), not just the skip count —
                # the r12 wrap prose derived "passed" from the at-wrap
                # skip count (423) where the armed clock-gated flip
                # converts one PASS to a SKIP (measured 422/2/424).
                # Assumes the suite is green at wrap (0 failed), which
                # the wrap workflow requires anyway.
                "expected_post_driver_triple": (
                    None
                    if skips_at_wrap is None or collected is None
                    else {
                        "passed": collected
                        - skips_at_wrap
                        - (1 if armed else 0),
                        "skipped": skips_at_wrap + (1 if armed else 0),
                        "collected": collected,
                    }
                ),
                "registry_entries": len(qs),
                "oracle_bearing": oracle_bearing,
                "no_oracle": len(qs) - oracle_bearing,
                "audit_window": len(catalog.AUDIT_SCHEDULE),
                "headline_entries": headline,
                # repo-wide non-test (the judge's prescribed measure —
                # VERDICT r9 "What's wrong" #3: counting only the
                # package dir drifted 4k LoC from the judge's rerun)
                "loc_source": _loc(REPO, skip_tests=True),
                "loc_tests": _loc(os.path.join(REPO, "tests"), skip_tests=False),
            },
            indent=1,
        )
    )
    if gap:
        print(
            f"FAIL: {len(gap)} registered entries have no driver "
            f"evidence and no slot in the next window: {gap}",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
