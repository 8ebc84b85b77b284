"""Compare BENCH_r*.json rounds: per-query deltas, new/retired entries.

Usage: python tools/bench_compare.py [old.json new.json]
Defaults to the two most recent BENCH_r*.json in the repo root.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    if len(sys.argv) == 3:
        paths = [sys.argv[1], sys.argv[2]]
    else:
        paths = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))[-2:]
    if len(paths) < 2:
        print("need two bench files")
        return 1
    runs = []
    for p in paths:
        with open(p, encoding="utf-8") as f:
            d = json.load(f)
        # driver rounds wrap bench.py's JSON line under 'parsed';
        # a capture-truncated round lands parsed:null (r9) — name it
        # instead of crashing on the subscript
        parsed = d.get("parsed", d)
        if parsed is None:
            print(f"{os.path.basename(p)}: parsed is null "
                  "(truncated driver capture) — pick another round")
            return 1
        runs.append(parsed)
    old, new = runs
    oq, nq = old["queries"], new["queries"]
    print(f"{os.path.basename(paths[0])} -> {os.path.basename(paths[1])}")
    wo = old.get("warmup_version", 1)
    wn = new.get("warmup_version", 1)
    if wo != wn:
        print(
            f"NOTE: warm-up methodology changed (v{wo} -> v{wn}; see "
            "bench.py WARMUP_VERSION) — per-query deltas conflate "
            "methodology with genuine plan changes for entries whose "
            "one-time costs moved in/out of the timed region."
        )
    print(f"headline: {old['value']:.2f}s -> {new['value']:.2f}s "
          f"({len(oq)} -> {len(nq)} queries)")
    # round-9 noise-adjudication fields: a flagged run's deltas should
    # be read against its reruns, not taken at face value. r10 slimmed
    # the stdout line (stall_flagged dict -> stall_n/stall_clean counts,
    # uniform baseline detail -> bench_runs.json), so read both shapes.
    for label, run in (("old", old), ("new", new)):
        ui = run.get("uniform_inflation") or {}
        if ui.get("suspected"):
            base = ui.get("baseline") or ui.get("kind") or "?"
            print(
                f"NOTE: {label} run self-reports UNIFORM host slowdown "
                f"(median {ui.get('median_ratio')}x vs {base}) — treat "
                "its numbers as inflated."
            )
        flagged = run.get("stall_flagged") or {}
        n_flagged = len(flagged) or run.get("stall_n", 0)
        if n_flagged:
            names = (
                f": {sorted(flagged)[:6]}"
                + (" ..." if len(flagged) > 6 else "")
                if flagged
                else f" ({run.get('stall_clean', '?')} clean-bracketed)"
            )
            print(
                f"NOTE: {label} run flagged {n_flagged} stalled "
                f"entries (isolated-rerun timings in its "
                f"bench_runs.json 'reruns'){names}"
            )
    shared = sorted(set(oq) & set(nq), key=lambda k: oq[k] - nq[k])
    tot_o = sum(oq[k] for k in shared)
    tot_n = sum(nq[k] for k in shared)
    print(f"like-for-like ({len(shared)} shared): "
          f"{tot_o:.2f}s -> {tot_n:.2f}s "
          f"({100 * (tot_n - tot_o) / tot_o:+.1f}%)\n")
    # Per-query medians + spread (bench.py reps>=3 since round 6): a
    # delta within the combined spread of the two rounds is noise, not
    # a regression/speedup — label it so.
    os_, ns_ = old.get("spread", {}), new.get("spread", {})
    for k in shared:
        d = nq[k] - oq[k]
        if abs(d) >= 0.3:
            noise = os_.get(k, 0.0) + ns_.get(k, 0.0)
            tag = "  [within spread]" if abs(d) <= noise else ""
            print(f"  {k:45s} {oq[k]:6.2f} -> {nq[k]:6.2f}  ({d:+.2f}){tag}")
    for k in sorted(set(nq) - set(oq)):
        print(f"  {k:45s}    new -> {nq[k]:6.2f}")
    for k in sorted(set(oq) - set(nq)):
        print(f"  {k:45s} {oq[k]:6.2f} -> retired")
    return 0


if __name__ == "__main__":
    sys.exit(main())
