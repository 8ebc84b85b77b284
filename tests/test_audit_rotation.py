"""Audit-window bookkeeping: the driver hash-audits the first 50
names of __spark_entry__.queries(), ordered by catalog.AUDIT_SCHEDULE.
A typo'd or stale schedule silently burns audit slots, and VERDICT r8
"What's wrong" #1 showed pure round-staleness rotation lets freshly
rewired entries miss their window — so the rotation tool snapshots
per-entry source hashes and these tests pin both the schedule's
integrity and the change-detection mechanics."""

from __future__ import annotations

import json
import os

from dataengineer_job_scraper_etl_spark import catalog

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _last_rounds(upto: int | None = None):
    """Latest CORRECTNESS round per entry, restricted to rounds
    <= ``upto`` when given — the schedule's generation-time view.
    VERDICT r10 "What's wrong" #1: evaluating the committed schedule
    against evidence that POSTDATES it (the driver's new CORRECTNESS
    file audits the window head) made the head read as wasted slots;
    the clock is catalog.AUDIT_SCHEDULE_META, not max(rounds on disk).
    """
    import glob

    last = {}
    for p in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int("".join(c for c in os.path.basename(p) if c.isdigit()))
        if upto is not None and rnd > upto:
            continue
        with open(p, encoding="utf-8") as f:
            for n in json.load(f):
                last[n] = max(rnd, last.get(n, 0))
    return last


def _wasted_no_oracle_slots(schedule, qs, last, next_round):
    """No-oracle entries holding a slot despite fresh evidence under
    the given clock — the waste rule shared by the freshness test and
    the future-evidence replay test."""
    return [
        n
        for n in schedule
        if qs[n].oracle is None
        and n in last
        and next_round - last[n] <= 2
    ]


def test_schedule_names_are_registered_and_unique():
    qs = catalog.all_queries()
    missing = [n for n in catalog.AUDIT_SCHEDULE if n not in qs]
    assert not missing, f"schedule names not in catalog: {missing}"
    assert len(set(catalog.AUDIT_SCHEDULE)) == len(catalog.AUDIT_SCHEDULE)
    # no-oracle entries only earn slots under the head rules: never any
    # driver evidence, or evidence >2 rounds stale by the next round
    # (VERDICT r9 ask #5) — anything fresher is a wasted slot. The
    # clock is the schedule's OWN generation stamp: evidence written
    # after generation must not retroactively invalidate it.
    gen = catalog.AUDIT_SCHEDULE_META["generated_after_round"]
    last = _last_rounds(upto=gen)
    wasted = _wasted_no_oracle_slots(
        catalog.AUDIT_SCHEDULE, qs, last, gen + 1
    )
    assert not wasted, f"wasted slots on fresh no-oracle entries: {wasted}"


def test_schedule_meta_clock_is_plausible():
    """The stamp must not POSTdate the evidence on disk at commit time
    (a schedule can't have been generated after rounds that don't
    exist yet it claims to know), and must not lag so far that the
    window was generated blind to >1 existing round — the driver
    writes exactly one CORRECTNESS file per round, so at most one may
    postdate a freshly generated schedule."""
    gen = catalog.AUDIT_SCHEDULE_META["generated_after_round"]
    on_disk = max(_last_rounds().values(), default=0)
    assert gen <= on_disk
    assert on_disk - gen <= 1, (
        f"schedule generated after r{gen} but evidence reaches "
        f"r{on_disk} — regenerate tools/audit_rotation.py"
    )


def test_schedule_survives_next_round_evidence_landing():
    """The replay test (VERDICT r10 "What's wrong" #2): simulate the
    driver landing CORRECTNESS_r{gen+1}.json containing the ENTIRE
    committed window head — the exact event that flipped r10's
    committed schedule red — and assert the waste rule still returns
    empty because the clock pins evaluation to the generation stamp."""
    qs = catalog.all_queries()
    gen = catalog.AUDIT_SCHEDULE_META["generated_after_round"]
    last = _last_rounds(upto=gen)
    # synthetic next-round evidence: the driver audits the window head
    future = dict(last)
    for n in catalog.AUDIT_SCHEDULE:
        future[n] = gen + 1
    # a clock-less evaluation (max of evidence + 1) over the future
    # file WOULD flag every no-oracle head slot as wasted...
    clockless = _wasted_no_oracle_slots(
        catalog.AUDIT_SCHEDULE, qs, future, max(future.values()) + 1
    )
    heads = [
        n for n in catalog.AUDIT_SCHEDULE
        if qs[n].oracle is None and n in last
    ]
    assert set(clockless) == set(heads), (
        "replay premise broke: clock-less evaluation should flag "
        "exactly the evidenced no-oracle head slots"
    )
    # ...while the stamped clock ignores evidence past the stamp:
    stamped_view = {n: r for n, r in future.items() if r <= gen}
    assert not _wasted_no_oracle_slots(
        catalog.AUDIT_SCHEDULE, qs, stamped_view, gen + 1
    )


def test_every_registered_entry_evidenced_or_scheduled():
    """VERDICT r9 ask #2 (the wrap-time assertion, also enforced by
    tools/wrap_counts.py exit code): a late-registered entry must
    never silently miss a round — no driver CORRECTNESS row in any
    round means it MUST hold a slot in the next window."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from wrap_counts import unevidenced_not_scheduled

    assert unevidenced_not_scheduled() == []


def test_r12_head_leads_and_tail_drains_the_r7_cohort():
    """The 4 never-audited r12 registrations (asks #3/#5/#6) + the
    ask #4 source-changed basket entry lead; the tail holds 45 of the
    48-entry r7 cohort (ask #1) — the 3 deferred entries are the
    zero-sum cost of the head seats and must lead r13's staleness
    tier. No rows-only slots: the five r10-dated no-oracle entries
    are exactly 2 rounds stale at this clock (the >2 rule seats them
    in r13 — ask #2's bar '≤2 rounds stale after r12' holds either
    way)."""
    never_audited = {
        "streaming_hopping_window",
        "events_type_markov2_transitions",
        "events_user_markov2_anomaly",
        "docs_topic_balanced_sample",
    }
    source_changed = {"lineitem_copurchase_lift"}
    head = catalog.AUDIT_SCHEDULE[: len(never_audited) + len(source_changed)]
    assert never_audited | source_changed == set(head)
    # ask #1: every r7-dated oracle-bearing entry is in the window,
    # except exactly the 3 documented zero-sum deferrals
    gen = catalog.AUDIT_SCHEDULE_META["generated_after_round"]
    last = _last_rounds(upto=gen)
    qs = catalog.all_queries()
    r7_dated = {
        n for n, q in qs.items()
        if q.oracle is not None and last.get(n) == 7
    }
    deferred = r7_dated - set(catalog.AUDIT_SCHEDULE)
    assert deferred == {
        "agg_distinct_counts",
        "streaming_pc1_drift_monitor",
        "tpch_q1_pricing_summary",
    }, deferred
    # the tail is ONLY r7 drain — nothing fresher holds a slot ahead
    # of the cohort
    tail = catalog.AUDIT_SCHEDULE[len(head):]
    assert all(last.get(n) == 7 for n in tail), [
        (n, last.get(n)) for n in tail if last.get(n) != 7
    ]
    # no rows-only head slot exists in this window
    assert all(qs[n].oracle is not None for n in catalog.AUDIT_SCHEDULE)


def test_no_oracle_refresh_rule_seats_r10_cohort_in_r13():
    """VERDICT r11 ask #2, pinned as the RULE (not this window's
    composition): a no-oracle entry with r10 evidence is exactly 2
    rounds stale when the r12 window is generated (next_round=12 ->
    NOT seated: 12-10 is not >2) and 3 rounds stale at the r13
    generation (13-10 > 2 -> seated). The five r10-dated entries
    therefore stay ≤2 rounds stale after r12 and refresh in r13
    automatically."""
    gen = catalog.AUDIT_SCHEDULE_META["generated_after_round"]
    last = _last_rounds(upto=gen)
    qs = catalog.all_queries()
    r10_no_oracle = {
        n for n, q in qs.items()
        if q.oracle is None and last.get(n) == 10
    }
    assert len(r10_no_oracle) == 5, r10_no_oracle
    # the rule, exactly as audit_rotation.plan_window computes it
    for n in r10_no_oracle:
        assert not (12 - last[n] > 2)  # r12: no slot
        assert 13 - last[n] > 2        # r13: refresh slot
    # and the other three no-oracle entries are fresher still
    others = {
        n for n, q in qs.items() if q.oracle is None
    } - r10_no_oracle
    assert all(last[n] == 11 for n in others), others


def test_audit_order_puts_schedule_first():
    ordered = list(catalog.audit_ordered_queries())
    n = len(catalog.AUDIT_SCHEDULE)
    assert ordered[:n] == catalog.AUDIT_SCHEDULE
    # and the rest is exactly the remaining registry, stable order
    rest = [n_ for n_ in catalog.all_queries()
            if n_ not in set(catalog.AUDIT_SCHEDULE)]
    assert ordered[n:] == rest


def test_source_hash_sees_entry_body_oracle_and_operator_modules():
    """The staleness snapshot must change when (a) the entry fn body
    changes, (b) the oracle SQL changes, (c) an operators/ module the
    fn imports changes — the r8 failure mode was exactly a rewire
    invisible to round-based staleness."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from audit_rotation import entry_source_hash

    class Q:
        def __init__(self, fn, oracle):
            self.spark_fn = fn
            self.oracle = oracle

    def fn_a(spark, sf_dir):
        return 1

    def fn_b(spark, sf_dir):
        return 2

    h1 = entry_source_hash(Q(fn_a, "SELECT 1"))
    assert entry_source_hash(Q(fn_a, "SELECT 1")) == h1  # deterministic
    assert entry_source_hash(Q(fn_b, "SELECT 1")) != h1  # body
    assert entry_source_hash(Q(fn_a, "SELECT 2")) != h1  # oracle

    # (c): a prefix-importing entry's hash covers operators/prefix.py
    def fn_prefix(spark, sf_dir):
        from dataengineer_job_scraper_etl_spark.operators.prefix import (
            global_prefix,
        )

        return global_prefix

    import audit_rotation as ar

    h_real = entry_source_hash(Q(fn_prefix, None))
    orig = ar._OPS_DIR
    try:
        ar._OPS_DIR = "/nonexistent"  # simulate module text changing
        h_other = entry_source_hash(Q(fn_prefix, None))
    finally:
        ar._OPS_DIR = orig
    assert h_real != h_other


def test_source_hash_sees_the_defining_module_text(tmp_path):
    """ADVICE r9 #2: two functions with IDENTICAL source in modules
    whose surrounding text differs (e.g. a shared helper edited) must
    hash differently — the r8 rewire-misses-window failure mode lived
    exactly in module-level helpers the fn-body hash couldn't see."""
    import importlib.util
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from audit_rotation import entry_source_hash

    class Q:
        def __init__(self, fn, oracle):
            self.spark_fn = fn
            self.oracle = oracle

    def load(name, extra):
        p = tmp_path / f"{name}.py"
        p.write_text(f"def fn(spark, sf_dir):\n    return 7\n{extra}")
        spec = importlib.util.spec_from_file_location(name, p)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.fn

    fn1 = load("m_one", "")
    fn2 = load("m_two", "\nHELPER = 42\n")
    import inspect

    # identical fn bodies...
    assert inspect.getsource(fn1) == inspect.getsource(fn2)
    # ...different module text -> different snapshot
    assert entry_source_hash(Q(fn1, None)) != entry_source_hash(Q(fn2, None))


def test_source_hash_ignores_comment_only_edits(tmp_path):
    """v3 (r12): a # comment or blank-line edit cannot change what the
    driver executes, so it must not flip the snapshot and burn an
    audit slot on a re-prove (ADVICE r11 #2 wanted libm-parity notes
    documented NEXT TO the ppm device — under v2 that documentation
    would have reseated 6 green entries). Docstring edits still trip:
    docstrings are runtime-visible STRING tokens."""
    import importlib.util
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from audit_rotation import entry_source_hash

    class Q:
        def __init__(self, fn, oracle):
            self.spark_fn = fn
            self.oracle = oracle

    def load(name, body):
        p = tmp_path / f"{name}.py"
        p.write_text(body)
        spec = importlib.util.spec_from_file_location(name, p)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.fn

    base = "def fn(spark, sf_dir):\n    return 7\n"
    h_base = entry_source_hash(Q(load("v3_base", base), None))
    commented = (
        "# a module comment\n\ndef fn(spark, sf_dir):\n"
        "    # an inline note\n    return 7  # trailing\n\n"
    )
    assert entry_source_hash(Q(load("v3_comm", commented), None)) == h_base
    docstringed = (
        'def fn(spark, sf_dir):\n    """doc"""\n    return 7\n'
    )
    assert entry_source_hash(Q(load("v3_doc", docstringed), None)) != h_base
    recoded = "def fn(spark, sf_dir):\n    return 8\n"
    assert entry_source_hash(Q(load("v3_code", recoded), None)) != h_base


def test_ledger_carries_the_current_hash_version():
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from audit_rotation import HASH_VERSION

    path = os.path.join(REPO, "tools", "audit_source_hashes.json")
    with open(path, encoding="utf-8") as f:
        ledger = json.load(f)
    assert ledger.get("__hash_version__") == HASH_VERSION


def test_ledger_covers_every_scheduled_entry():
    """The committed snapshot file must have a hash for every entry in
    the current window (regenerating the schedule updates it)."""
    path = os.path.join(REPO, "tools", "audit_source_hashes.json")
    assert os.path.exists(path), "run tools/audit_rotation.py"
    with open(path, encoding="utf-8") as f:
        ledger = json.load(f)
    missing = [n for n in catalog.AUDIT_SCHEDULE if n not in ledger]
    assert not missing, missing


def test_committed_schedule_matches_regeneration_when_current():
    """Self-maintaining integrity check: whenever the committed
    schedule's clock is CURRENT (no driver evidence postdates it —
    i.e. max CORRECTNESS round on disk == generated_after_round), a
    regeneration must reproduce the committed window exactly. Catches
    'entry registered after the schedule froze' (the r10->r11 red) and
    any hand-edit drift, while staying green the moment the driver's
    next artifact lands (the plausibility test bounds that lag at 1;
    the regenerated schedule then supersedes this one)."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from audit_rotation import plan_window

    gen = catalog.AUDIT_SCHEDULE_META["generated_after_round"]
    on_disk = max(_last_rounds().values(), default=0)
    if on_disk != gen:
        import pytest

        pytest.skip(
            f"driver evidence (r{on_disk}) postdates the schedule "
            f"(generated after r{gen}) — the next regeneration "
            "supersedes this window"
        )
    plan = plan_window(update_ledger=False)
    assert plan["pick"] == list(catalog.AUDIT_SCHEDULE), (
        "committed AUDIT_SCHEDULE drifted from regeneration: "
        f"missing={set(plan['pick']) - set(catalog.AUDIT_SCHEDULE)} "
        f"extra={set(catalog.AUDIT_SCHEDULE) - set(plan['pick'])}"
    )


def test_audited_baseline_promotes_only_on_landed_evidence():
    """The two-hash ledger (r11): an entry edited after its last audit
    stays 'changed' through ANY number of within-round regenerations
    (scheduled-hash rewrites), and its baseline advances exactly when
    the driver's evidence for the scheduled window lands."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from audit_rotation import promote_audited_baselines

    ledger = {
        # scheduled into the r11 window (clock 10), not yet audited
        "edited": {"audited": "old", "scheduled": "new", "sched_clock": 10},
        # audited in r11 already (evidence landed)
        "landed": {"audited": "old", "scheduled": "new", "sched_clock": 10},
        # legacy row migrated without a clock: never promotes
        "legacy": {"audited": "h", "scheduled": "h", "sched_clock": None},
    }
    promote_audited_baselines(
        ledger, {"edited": 10, "landed": 11, "legacy": 11}
    )
    assert ledger["edited"]["audited"] == "old"   # still must re-prove
    assert ledger["landed"]["audited"] == "new"   # baseline advanced
    assert ledger["legacy"]["audited"] == "h"
