"""X7 summary-builder semantics (reference exception_builder.py:35-118)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_reconciliation_spark.functions.summary import (
    exception_summary,
    parse_date_multi,
)


def test_summary_branches(spark):
    df = spark.createDataFrame(
        [
            (0, None, None),
            (1, None, "new"),
            (2, "old", None),
            (3, "short", "also short"),
            (4, "x" * 35, "y"),
        ],
        "id long, o string, n string",
    )
    got = {
        r["id"]: r["s"]
        for r in df.select("id", exception_summary("o", "n").alias("s")).collect()
    }
    assert got[0] == "no change"
    assert got[1] == "added: new"
    assert got[2] == "removed: old"
    assert got[3] == "from 'short' to 'also short'"
    assert got[4] == f"from '{'x' * 30}...' to 'y'"


def test_summary_numeric_and_date(spark):
    df = spark.createDataFrame(
        [
            (0, "100.0", "110.0", "2025-07-09", "2025-07-09"),
            (1, "0", "5", "2025-07-09", "09 Jul 2025"),
            (2, "oops", "5", "2025-07-09", "2025/07/10"),
            (3, "2.0", "1.0", "2025-07-09", "2025-07-04"),
        ],
        "id long, o string, n string, do string, dn string",
    )
    num = {
        r["id"]: r["s"]
        for r in df.select(
            "id", exception_summary("o", "n", "decimal").alias("s")
        ).collect()
    }
    assert num[0] == "changed by +10.00 (+10.00%)"
    assert num[1] == "changed by +5.00"          # old == 0: no pct
    assert num[2] == "from oops to 5"            # coercion failure fallback
    assert num[3] == "changed by -1.00 (-50.00%)"

    dat = {
        r["id"]: r["s"]
        for r in df.select(
            "id", exception_summary("do", "dn", "date").alias("s")
        ).collect()
    }
    assert dat[0] == "same date, time changed"
    assert dat[1] == "same date, time changed"   # cross-format, same day
    assert dat[2] == "shifted by 1 day"
    assert dat[3] == "shifted by -5 days"


def test_parse_date_multi(spark):
    df = spark.createDataFrame(
        [("2025-07-09",), ("09 Jul 2025",), ("2025/07/09",), ("not a date",)],
        "s string",
    )
    got = [r["d"] for r in df.select(parse_date_multi("s").alias("d")).collect()]
    assert [str(d) if d else None for d in got] == [
        "2025-07-09", "2025-07-09", "2025-07-09", None,
    ]
