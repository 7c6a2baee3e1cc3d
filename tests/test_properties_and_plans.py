"""Property-based kernel tests (hypothesis) + physical-plan regression
assertions (pushdown / broadcast / pruning stay locked in)."""

from __future__ import annotations

import contextlib
import io

from hypothesis import given, settings
from hypothesis import strategies as st

from data_reconciliation_spark.functions.similarity import (
    _lcs_length,
    hamming64_py,
    indel_ratio_py,
    jaro_winkler_py,
    simhash64_py,
    token_jaccard_py,
)

TEXT = st.text(alphabet="abcde ", max_size=60)


def _lcs_dp(a: str, b: str) -> int:
    m, n = len(a), len(b)
    dp = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m):
        for j in range(n):
            dp[i + 1][j + 1] = (
                dp[i][j] + 1 if a[i] == b[j] else max(dp[i][j + 1], dp[i + 1][j])
            )
    return dp[m][n]


@settings(max_examples=200, deadline=None)
@given(TEXT, TEXT)
def test_lcs_matches_dp_oracle(a, b):
    assert _lcs_length(a, b) == _lcs_dp(a, b)


@settings(max_examples=200, deadline=None)
@given(TEXT, TEXT)
def test_indel_ratio_properties(a, b):
    r = indel_ratio_py(a, b)
    assert 0.0 <= r <= 100.0
    assert indel_ratio_py(b, a) == r            # symmetric
    assert indel_ratio_py(a, a) == 100.0        # identity


@settings(max_examples=200, deadline=None)
@given(TEXT, TEXT)
def test_jaro_winkler_properties(a, b):
    s = jaro_winkler_py(a, b)
    assert 0.0 <= s <= 1.0
    assert jaro_winkler_py(a, a) == (1.0 if a else 1.0)


@settings(max_examples=100, deadline=None)
@given(TEXT, TEXT)
def test_jaccard_and_simhash_consistency(a, b):
    j = token_jaccard_py(a, b)
    assert 0.0 <= j <= 1.0
    h = hamming64_py(simhash64_py(a), simhash64_py(b))
    assert 0 <= h <= 64
    if a.split() == b.split():
        assert h == 0 and j == 1.0


# ---------------------------------------------------------------------------
# Physical-plan regressions
# ---------------------------------------------------------------------------

def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_and_pruning(spark):
    from data_reconciliation_spark.plans import driver_queries as dq

    sf = "/root/testdata/sf0.001"
    p = _plan(dq.q_o1_history_ordered(spark, sf))
    assert "EqualTo(user_id,1)" in p  # filter reached the parquet scan

    p = _plan(dq.q_text_stats(spark, sf))
    # scan reads only the referenced columns
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in p

    p = _plan(dq.q_j2_deleted_records(spark, sf))
    assert "ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>" in p


def test_broadcast_antijoin(spark):
    from data_reconciliation_spark.plans import driver_queries as dq

    p = _plan(dq.q_p7_rejected_filter(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in p and "LeftAnti" in p


def test_embedding_cosine_pairs(spark):
    import numpy as np

    from data_reconciliation_spark.operators.dedup import embedding_cosine_pairs

    rng = np.random.RandomState(3)
    base = rng.randn(30, 8).astype("float32")
    base[11] = base[4] * 2.0          # exact-direction twin
    base[12] = base[4] + 0.001        # near twin
    rows = [(i, [float(x) for x in base[i]]) for i in range(30)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_cosine_pairs(vecs, threshold=0.99, dim=8).collect()
    }
    assert (4, 11) in got and got[(4, 11)] > 0.999999
    assert (4, 12) in got
    assert all(c >= 0.99 for c in got.values())


def test_dense_sorted_index_no_global_sort(spark):
    """exc_idx assignment must be a balanced range-partitioned sort, not
    a Window over lit(1) funneling every row through one task."""
    from pyspark.sql import functions as F

    from data_reconciliation_spark.sources.state import dense_sorted_index

    df = spark.range(1000).select(
        (F.col("id") * 37 % 1000).alias("k"), F.lit("x").alias("v")
    )
    out = dense_sorted_index(df, "exc_idx", num_partitions=8)
    p = _plan(out)
    assert "Exchange SinglePartition" not in p, p
    rows = out.orderBy("exc_idx").collect()
    assert [r["exc_idx"] for r in rows] == list(range(1000))
    # index order == content sort order
    keys = [(str(r["k"]), r["v"]) for r in rows]
    assert keys == sorted(keys)


def test_minhash_band_join_carries_ids_only(spark):
    """The LSH band self-join (the widest shuffle of the dedup path)
    must exchange only (8-byte band hash, id) — document text stays in
    the scan projection that computes signatures and is re-joined only
    for the verify stage on the deduplicated pair set."""
    from data_reconciliation_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = minhash_lsh_pairs(docs, verify_threshold=None)
    p = _plan(pairs)
    # candidate generation never materializes per-side text columns
    assert "text_a" not in p and "text_b" not in p, p
    assert "band_key" in p
