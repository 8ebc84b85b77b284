"""Host-stall detection in bench.py (VERDICT r8 ask #2 + ADVICE r8).

The round-8 driver bench stalled MID-pass: per-entry rep spreads hit
25 s on entries whose plans were untouched, while every pass-boundary
sentinel probe stayed at 0.24-0.31 s — so ``stall_passes`` published
empty and the 114 s headline carried no machine-readable noise flag.
These tests REPLAY that exact artifact (numbers copied from the r8
``bench_runs.json``) against the new per-entry rule, and pin the
bounding-sentinel pass attribution ADVICE r8 flagged as off by one.
No loaded-host integration run: deliberately saturating the host from
a test is flaky by construction; the replay is deterministic and uses
the real failure's numbers.
"""

from __future__ import annotations

import statistics

from bench import stalled_passes, suspect_entries

# Verbatim from the r8 driver artifact: three reps, mid-pass stall in
# rep 2, boundary sentinels clean.
R8_SENTINELS = [0.237, 0.307, 0.285, 0.301]
R8_RUNS = {
    "tpch_q9_product_profit": [1.492, 26.478, 1.643],
    "ann_ivf_topk": [1.721, 26.261, 1.362],
    "vec_semdedup_survivors": [6.808, 28.525, 6.665],
    "corpus_pipeline_full": [4.276, 25.51, 4.842],
    # clean entries from the same run — must NOT flag
    "tpch_q1_pricing_summary": [3.473, 2.756, 2.186],
    "vec_cosine_topk": [1.074, 0.821, 0.858],
}


def test_r8_replay_flags_the_stalled_entries_not_the_clean_ones():
    flagged = set(suspect_entries(R8_RUNS))
    assert flagged == {
        "tpch_q9_product_profit",
        "ann_ivf_topk",
        "vec_semdedup_survivors",
        "corpus_pipeline_full",
    }


def test_r8_replay_boundary_sentinels_alone_stay_silent():
    """The r8 failure mode itself: clean boundary probes -> no pass
    flagged — which is exactly why the per-entry rule exists."""
    assert stalled_passes(R8_SENTINELS) == []


def test_median_publication_already_sheds_a_single_stalled_rep():
    """The published number was never the gap — a 1-of-3 stalled rep
    doesn't move the median. The gap was the missing FLAG: consumers
    saw spread=25 s with stall_passes=[] and no adjudication. The
    rerun record (not a median merge) closes it; medians stay
    comparable with prior rounds."""
    assert statistics.median(R8_RUNS["tpch_q9_product_profit"]) == 1.643


def test_pass_attribution_uses_both_bounding_sentinels():
    """ADVICE r8: sentinels[i] is timed BEFORE pass i and sentinels[i+1]
    closes it, so a stall inside pass i mostly lands in probe i+1. A
    hot probe must flag BOTH passes it bounds."""
    # probe 2 hot -> pass 1 (closed by it) AND pass 2 (opened by it)
    assert stalled_passes([0.2, 0.2, 3.0, 0.2]) == [1, 2]
    # hot opening probe of the first pass
    assert stalled_passes([3.0, 0.2, 0.2, 0.2]) == [0]
    # hot closing probe of the last pass
    assert stalled_passes([0.2, 0.2, 0.2, 3.0]) == [2]


def test_thresholds_do_not_trip_on_jitter():
    # ratio without the 1 s absolute excess: sub-second probe tripling
    assert stalled_passes([0.1, 0.35, 0.1, 0.1]) == []
    # single-rep runs can't have a spread
    assert suspect_entries({"q": [9.9]}) == []
    # 30%-class spread on a seconds-scale entry stays clean
    assert suspect_entries({"q": [3.4, 2.7, 2.2]}) == []
    # small absolute wobble on a sub-second entry stays clean
    assert suspect_entries({"q": [0.2, 0.5, 0.3]}) == []


def test_uniform_inflation_replays_the_r8_driver_pass():
    """Mode-2 host noise (whole-run ~1.2-1.8x inflation, clean
    sentinels, normal spreads): replay the actual r7 -> r8 driver
    artifacts — 52 shared entries, median ratio 1.359, 92% inflated
    >= 1.1x — the flag the r8 verdict had to derive by hand."""
    import json
    import os

    from bench import uniform_inflation

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def queries(name):
        with open(os.path.join(repo, name)) as f:
            doc = json.load(f)
        return (doc.get("parsed") or doc)["queries"]

    r7, r8 = queries("BENCH_r07.json"), queries("BENCH_r08.json")
    verdict = uniform_inflation(r7, r8)
    assert verdict["suspected"]
    assert verdict["shared"] >= 50
    assert verdict["median_ratio"] > 1.3

    # a round compared against itself never trips
    self_check = uniform_inflation(r7, r7)
    assert not self_check["suspected"]
    assert self_check["median_ratio"] == 1.0


def test_uniform_inflation_ignores_localized_regressions():
    """A genuine code regression moves the entries it touched, not the
    whole catalog: 3 of 30 entries going 5x slower must NOT trip the
    whole-run flag (those show up in per-entry deltas instead)."""
    from bench import uniform_inflation

    prev = {f"q{i}": 1.0 for i in range(30)}
    cur = dict(prev)
    for i in range(3):
        cur[f"q{i}"] = 5.0
    verdict = uniform_inflation(prev, cur)
    assert not verdict["suspected"]
    # and tiny overlap never judges
    assert not uniform_inflation({"a": 1.0}, {"a": 9.0})["suspected"]
