"""Bench stdout-line budget + rolling clean baseline (VERDICT r9 #1/#6,
ADVICE r9 #1).

BENCH_r09.json landed ``parsed: null`` because the stdout line outgrew
the driver's ~2000-char tail capture — the new stall-detection fields
pushed the head of the line out of the window. These tests make the
budget STATIC: the line is rendered at CURRENT catalog size with
worst-case values and must stay under bench.STDOUT_BUDGET (1800), so
catalog growth breaks a test instead of silently breaking the round's
only driver-facing perf artifact.
"""

from __future__ import annotations

import json
import os

import bench

WORST_UNIFORM = {
    "shared": 99,
    "median_ratio": 99.999,
    "frac_inflated": 1.0,
    "suspected": True,
    "kind": "min_clean3",
    "sources": ["BENCH_r07.json", "BENCH_r08.json", "BENCH_r09.json"],
}


def _render(value: float) -> str:
    timings = {n: value for n in bench.HEADLINE}
    return bench.render_stdout_line(
        timings=timings,
        reps=3,
        sf=0.1,
        stall_n=len(bench.HEADLINE),
        stall_clean=len(bench.HEADLINE),
        uniform=WORST_UNIFORM,
    )


def test_stdout_line_fits_budget_at_current_catalog_size():
    """Every HEADLINE entry at a worst-case 3-digit timing, every noise
    flag at its widest: the rendered line must still clear the budget.
    If adding headline entries trips this, grow STDOUT_OMIT — never the
    budget (the driver's capture window is the hard wall)."""
    line = _render(999.99)
    assert len(line) <= bench.STDOUT_BUDGET, (
        f"stdout line {len(line)} chars > budget {bench.STDOUT_BUDGET}; "
        "move stable entries into bench.STDOUT_OMIT"
    )
    # and it parses back as the driver would parse it
    doc = json.loads(line)
    assert doc["metric"] == "headline_total"
    assert doc["unit"] == "sec"
    assert doc["runs_file"] == "bench_runs.json"


def test_stdout_line_headroom_for_growth():
    """Keep >= 150 chars of headroom (~4 future headline entries) so a
    single round's additions can't land exactly on the wall."""
    assert len(_render(999.99)) <= bench.STDOUT_BUDGET - 150


def test_omitted_entries_are_absent_value_still_sums_all():
    line = _render(2.0)
    doc = json.loads(line)
    for name in bench.STDOUT_OMIT:
        assert name not in doc["queries"]
    # value is the FULL headline total, not the shown subset's sum
    assert doc["value"] == round(2.0 * len(bench.HEADLINE), 3)
    assert doc["n_run"] == len(bench.HEADLINE)
    shown = set(bench.HEADLINE) - bench.STDOUT_OMIT
    assert set(doc["queries"]) == shown


def test_omit_list_names_are_real_headline_entries():
    """A typo'd STDOUT_OMIT name would silently omit nothing."""
    assert bench.STDOUT_OMIT <= set(bench.HEADLINE)


def _write_bench(dirpath: str, n: int, queries: dict, *, sf=0.1, wv=5,
                 parsed=True) -> None:
    doc = {
        "n": n,
        "rc": 0,
        "parsed": (
            {"queries": queries, "sf": sf, "warmup_version": wv}
            if parsed
            else None
        ),
    }
    with open(os.path.join(dirpath, f"BENCH_r{n:02d}.json"), "w") as f:
        json.dump(doc, f)


def test_clean_baseline_takes_per_entry_min_over_rounds(tmp_path):
    """A stalled baseline round only ever inflates, so min-over-rounds
    recovers the clean reference (VERDICT r9 ask #6: a stalled rN vs a
    stalled rN-1 must not read 'normal')."""
    d = str(tmp_path)
    _write_bench(d, 7, {"a": 1.0, "b": 2.0})           # clean round
    _write_bench(d, 8, {"a": 1.4, "b": 2.9, "c": 5.0})  # stalled round
    meta, base = bench.clean_baseline(d, 0.1, 5)
    assert meta["kind"] == "min_clean3"
    assert meta["sources"] == ["BENCH_r08.json", "BENCH_r07.json"]
    assert base == {"a": 1.0, "b": 2.0, "c": 5.0}


def test_clean_baseline_skips_incompatible_and_unparsed(tmp_path):
    """ADVICE r9 #1: a different-sf or different-warmup artifact fakes
    (or masks) uniform inflation; an unparsed artifact (r9's
    parsed:null) contributes nothing."""
    d = str(tmp_path)
    _write_bench(d, 5, {"a": 0.1}, sf=0.01)        # wrong sf
    _write_bench(d, 6, {"a": 0.2}, wv=4)           # wrong methodology
    _write_bench(d, 7, {"a": 3.0})                 # compatible
    _write_bench(d, 8, {"a": 9.9}, parsed=False)   # r9-style parsed:null
    meta, base = bench.clean_baseline(d, 0.1, 5)
    assert meta["sources"] == ["BENCH_r07.json"]
    assert base == {"a": 3.0}


def test_clean_baseline_caps_at_three_rounds(tmp_path):
    d = str(tmp_path)
    for n in range(4, 10):
        _write_bench(d, n, {"a": float(n)})
    meta, base = bench.clean_baseline(d, 0.1, 5)
    assert len(meta["sources"]) == 3
    assert meta["sources"][0] == "BENCH_r09.json"
    # min over r07..r09 only — the older, smaller values don't leak in
    assert base == {"a": 7.0}


def test_clean_baseline_empty_repo(tmp_path):
    meta, base = bench.clean_baseline(str(tmp_path), 0.1, 5)
    assert base == {}
    assert meta["sources"] == []
