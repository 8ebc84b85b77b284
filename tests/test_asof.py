"""asof_join — point-in-time semantics: inclusive at-or-before match,
null when no prior right row, per-key isolation, equal-ts tiebreak.
"""

from __future__ import annotations

import datetime as dt

from dataengineer_job_scraper_etl_spark.operators.asof import asof_join

T0 = dt.datetime(2026, 1, 1)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 1, _ts(10)),  # after right at 5 -> matches r5
            (2, 1, _ts(5)),   # EXACTLY at right ts 5 -> inclusive match
            (3, 1, _ts(1)),   # before any right -> null
            (4, 2, _ts(50)),  # other key -> its own right rows only
            (5, 3, _ts(50)),  # key with no right rows at all -> null
        ],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 1, _ts(5), 5.0),
            (101, 1, _ts(8), 8.0),
            (200, 2, _ts(49), 49.0),
            (201, 2, _ts(50), 50.0),   # equal ts as 202
            (202, 2, _ts(50), 51.0),   # tiebreak: larger rid wins
        ],
        "rid long, k long, ts timestamp, v double",
    )
    return left, right


def test_asof_semantics(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="k", right_cols=["rid", "v"], right_tiebreak="rid"
    )
    got = {r["id"]: (r["rid_asof"], r["v_asof"]) for r in out.collect()}
    assert got[1] == (101, 8.0)  # latest at-or-before 10 is ts 8
    assert got[2] == (100, 5.0)  # inclusive: right at the same instant
    assert got[3] == (None, None)  # nothing prior
    assert got[4] == (202, 51.0)  # equal-ts tie -> larger rid
    assert got[5] == (None, None)  # key never seen on right
    assert len(got) == 5  # every left row exactly once


def test_asof_no_row_multiplication(spark):
    left, right = _frames(spark)
    # duplicate right rows must never duplicate left rows
    out = asof_join(
        left,
        right.unionByName(right),
        on="k",
        right_cols=["rid"],
        right_tiebreak="rid",
    )
    assert out.count() == left.count()
