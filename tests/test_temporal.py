"""Temporal join operators: as-of (merge_asof semantics incl. one-sided
groups) and bucketed range join vs a brute-force oracle."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_reconciliation_spark.operators.temporal import (
    asof_join,
    bucketed_range_join,
)


def _t(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _t(1)),     # matches signup at t0
            (2, 10, _t(3)),     # matches signup at t2 (latest <= t3)
            (3, 20, _t(2)),     # user has NO signup -> null right side
            (4, 30, _t(0)),     # signup AFTER error -> null (backward)
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _t(0), 1.0),
            (10, _t(2), 2.0),
            (30, _t(5), 9.0),
            (40, _t(1), 7.0),   # right-only user: no output row
        ],
        "user_id long, ts timestamp, value double",
    )
    rows = {
        r["event_id"]: r
        for r in asof_join(
            left, right, ts_col="ts", by=["user_id"], right_payload=["value"]
        ).collect()
    }
    assert len(rows) == 4
    assert rows[1]["value_right"] == 1.0 and rows[1]["ts_right"] == _t(0)
    assert rows[2]["value_right"] == 2.0 and rows[2]["ts_right"] == _t(2)
    assert rows[3]["value_right"] is None
    assert rows[4]["value_right"] is None


def test_bucketed_range_join_vs_bruteforce(spark):
    import random

    rng = random.Random(5)
    lrows = [(rng.randint(0, 4), _t(rng.randint(0, 20), rng.randint(0, 59))) for _ in range(80)]
    rrows = [(rng.randint(0, 4), _t(rng.randint(0, 20), rng.randint(0, 59))) for _ in range(80)]
    left = spark.createDataFrame(lrows, "user_id long, ts timestamp")
    right = spark.createDataFrame(rrows, "user_id long, ts timestamp")

    got = bucketed_range_join(
        left, right, key="user_id", ts_col="ts", window_seconds=3600
    ).count()

    # brute force oracle
    want = sum(
        1
        for ku, tu in lrows
        for kv, tv in rrows
        if ku == kv and 0 <= (tu - tv).total_seconds() <= 3600
    )
    assert got == want and got > 0
