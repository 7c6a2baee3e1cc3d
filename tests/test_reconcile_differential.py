"""Differential test: Spark reconcile vs the pandas oracle on seeded
random snapshot pairs (fuzzy + tolerance + exact rules, nulls, missing
records, unparsable numerics)."""

from __future__ import annotations

import random
import string

import pandas as pd
import pytest

from data_reconciliation_spark.operators.reconcile import reconcile
from tests.oracle_pandas import run_compare_oracle


def _rand_word(rng):
    return "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(3, 10)))


def _make_pair(rng, n=40):
    ids = list(range(n))
    rows_old, rows_new = [], []
    for i in ids:
        name = _rand_word(rng)
        num = round(rng.uniform(0, 100), 2)
        txt = " ".join(_rand_word(rng) for _ in range(3))
        rows_old.append((i, name if rng.random() > 0.1 else None,
                         num if rng.random() > 0.1 else None, txt))
        # perturb the new side
        name2 = name
        r = rng.random()
        if r < 0.2:
            name2 = name + rng.choice(["x", "y", " inc"])
        elif r < 0.3:
            name2 = _rand_word(rng)
        elif r < 0.38:
            name2 = None
        num2 = num
        r = rng.random()
        if r < 0.25:
            num2 = round(num + rng.uniform(-2, 2), 2)
        elif r < 0.33:
            num2 = None
        txt2 = txt if rng.random() > 0.3 else txt + " extra"
        rows_new.append((i, name2, num2, txt2))
    # drop some rows from each side (missing-record paths)
    old = [r for r in rows_old if rng.random() > 0.08]
    new = [r for r in rows_new if rng.random() > 0.08]
    cols = ["id", "name", "amount", "note"]
    return pd.DataFrame(old, columns=cols), pd.DataFrame(new, columns=cols)


CFG = {
    "ignore_nulls": False,
    "include_missing_records": True,
    "fields": {
        "name": {"type": "string", "fuzzy_match": 85},
        "amount": {"type": "decimal", "tolerance": 1.0},
        # note: no rule -> exact
    },
}


@pytest.mark.parametrize("seed", [7, 42, 1337])
@pytest.mark.parametrize("ignore_nulls", [False, True])
def test_differential_random(spark, seed, ignore_nulls):
    rng = random.Random(seed)
    pdf_old, pdf_new = _make_pair(rng)
    cfg = {**CFG, "ignore_nulls": ignore_nulls}

    expected = run_compare_oracle(pdf_old, pdf_new, ["id"], cfg)

    schema = "id long, name string, amount double, note string"
    df_old = spark.createDataFrame(pdf_old.astype(object).where(pdf_old.notna(), None), schema)
    df_new = spark.createDataFrame(pdf_new.astype(object).where(pdf_new.notna(), None), schema)
    res = reconcile(df_old, df_new, ["id"], cfg)

    assert res.match_pct == expected["match_pct"]
    got = {(r["id"], r["field"]) for r in res.exceptions.collect()}
    want = {(e["id"], e["field"]) for e in expected["exceptions"]}
    assert got == want
