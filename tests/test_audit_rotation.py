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


def test_schedule_names_are_registered_and_unique():
    qs = catalog.all_queries()
    missing = [n for n in catalog.AUDIT_SCHEDULE if n not in qs]
    assert not missing, f"schedule names not in catalog: {missing}"
    assert len(set(catalog.AUDIT_SCHEDULE)) == len(catalog.AUDIT_SCHEDULE)
    # every slot must be spendable: driver can only hash-check entries
    # with an oracle (no-oracle entries get at most one-time slots,
    # and all of them have driver evidence since r8)
    no_oracle = [
        n for n in catalog.AUDIT_SCHEDULE if qs[n].oracle is None
    ]
    assert not no_oracle, f"wasted slots on no-oracle entries: {no_oracle}"


def test_r9_head_is_the_rewired_six():
    """VERDICT r8 ask #1: the six entries whose code round 8 touched
    most lead the round-9 window."""
    assert catalog.AUDIT_SCHEDULE[:6] == [
        "events_user_spend_gini",
        "text_vocab_coverage_curve",
        "events_value_ks_drift",
        "events_user_lorenz_curve",
        "docs_global_token_offsets",
        "docs_shard_assignment",
    ]


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


def test_ledger_covers_every_scheduled_entry():
    """The committed snapshot file must have a hash for every entry in
    the current window (regenerating the schedule updates it)."""
    path = os.path.join(REPO, "tools", "audit_source_hashes.json")
    assert os.path.exists(path), "run tools/audit_rotation.py"
    with open(path, encoding="utf-8") as f:
        ledger = json.load(f)
    missing = [n for n in catalog.AUDIT_SCHEDULE if n not in ledger]
    assert not missing, missing
