"""Pair-scoring stage: cascaded similarity features
(SURVEY.md §7 step 5).

The reference applies its similarity predicate row-by-row after the
equi-join (``compare.py:352-375``); the engine generalizes it into a
three-tier cascade chosen by measured cost per pair:

1. **per-page precompute** (once per page, not per pair): canonical URL,
   normalized text, 64-bit SimHash (the one per-page pandas UDF —
   ~260us/text, which is why it must never run per pair).
2. **native pair features** (JVM, whole-stage codegen, every candidate
   pair): token-set Jaccard via ``array_intersect`` on split tokens, and
   SimHash Hamming distance via ``bit_count(xor)``.
3. **Arrow-batched pair UDF** (Jaro-Winkler on canonical URLs + indel
   ratio on normalized text, ~90us/pair) — evaluated ONLY on pairs that
   pass a cheap native prefilter (Jaccard or Hamming evidence).  Pairs
   failing the prefilter cannot reach the match verdict under any
   threshold configuration (prefilter <= verdict thresholds), so
   skipping them is semantics-preserving, and at web scale it prunes the
   overwhelming majority of candidates before any Python runs.

The scoring stage itself is map-only: every shuffle happens in blocking.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from data_reconciliation_spark.config import BlockingConfig, ScoringConfig
from data_reconciliation_spark.functions.normalize import canonical_url, normalized_text
from data_reconciliation_spark.functions.similarity import (
    indel_ratio_py,
    jaro_winkler_py,
    simhash64_udf,
)
from data_reconciliation_spark.operators.blocking import candidate_pairs

JW_RATIO_TYPE = T.StructType(
    [
        T.StructField("url_jw", T.DoubleType(), True),
        T.StructField("text_ratio", T.DoubleType(), True),
    ]
)


@pandas_udf(JW_RATIO_TYPE)
def jw_ratio_udf(
    url_a: pd.Series, url_b: pd.Series, text_a: pd.Series, text_b: pd.Series
) -> pd.DataFrame:
    """Jaro-Winkler(url) + indel-ratio(text) for one Arrow batch of
    *prefiltered* pairs."""
    jw = [jaro_winkler_py(a, b) for a, b in zip(url_a, url_b)]
    ratio = [indel_ratio_py(a, b) for a, b in zip(text_a, text_b)]
    return pd.DataFrame(
        {
            "url_jw": pd.array(jw, dtype="float64"),
            "text_ratio": pd.array(ratio, dtype="float64"),
        },
        index=url_a.index,
    )


def prepare_pages(pages: DataFrame) -> DataFrame:
    """Per-page scoring payload: canonical URL, normalized text, SimHash.
    One map pass; SimHash (the only Python) runs once per page."""
    return pages.select(
        "url",
        canonical_url("url").alias("canon_url"),
        normalized_text("text").alias("norm_text"),
        simhash64_udf(normalized_text("text")).alias("simhash"),
    )


def _native_jaccard(a, b):
    ta = F.array_distinct(F.split(a, " "))
    tb = F.array_distinct(F.split(b, " "))
    inter = F.size(F.array_intersect(ta, tb))
    union = F.size(F.array_union(ta, tb))
    return F.when(union == 0, F.lit(1.0)).otherwise(inter.cast("double") / union)


def score_pairs(pairs: DataFrame, cfg: ScoringConfig | None = None) -> DataFrame:
    """Score candidate pairs carrying per-side payload columns
    ``canon_url_{a,b}, norm_text_{a,b}, simhash_{a,b}``.

    Emits features + weighted score + is_match verdict.  Tier-2 native
    features cover every pair; the tier-3 UDF touches only prefilter
    survivors (NULL features otherwise — such pairs are never matches).
    """
    cfg = cfg or ScoringConfig()

    scored = pairs.withColumn(
        "token_jaccard", _native_jaccard(F.col("norm_text_a"), F.col("norm_text_b"))
    ).withColumn(
        "simhash_hamming",
        F.bit_count(F.col("simhash_a").bitwiseXOR(F.col("simhash_b"))).cast("int"),
    )

    prefilter = (F.col("token_jaccard") >= cfg.prefilter_jaccard) | (
        F.col("simhash_hamming") <= cfg.prefilter_hamming
    )
    expensive = F.when(
        prefilter,
        jw_ratio_udf(
            F.col("canon_url_a"),
            F.col("canon_url_b"),
            F.col("norm_text_a"),
            F.col("norm_text_b"),
        ),
    )
    scored = (
        scored.withColumn("__e", expensive)
        .withColumn("url_jw", F.col("__e.url_jw"))
        .withColumn("text_ratio", F.col("__e.text_ratio"))
        .drop("__e")
    )

    score = (
        0.45 * F.coalesce(F.col("token_jaccard"), F.lit(0.0))
        + 0.35 * F.coalesce(F.col("text_ratio") / 100.0, F.lit(0.0))
        + 0.20 * F.coalesce(F.col("url_jw"), F.lit(0.0))
    )
    strong_text = (
        (F.col("token_jaccard") >= cfg.token_jaccard_threshold)
        | (F.col("text_ratio") >= cfg.text_ratio_threshold)
        | (F.col("simhash_hamming") <= cfg.simhash_max_hamming)
    )
    return scored.withColumn("score", score).withColumn(
        "is_match", strong_text & (F.col("score") >= cfg.match_threshold)
    )


def block_score_pipeline(
    pages: DataFrame,
    blocking_cfg: BlockingConfig | None = None,
    scoring_cfg: ScoringConfig | None = None,
) -> DataFrame:
    """blocking -> candidate pairs (with per-page payloads) -> cascade
    scoring.  The per-page payload is computed BEFORE the pair explosion
    so nothing per-page runs per pair."""
    # ONE scan of the raw page table: the prepared projection feeds both
    # blocking (shingles over norm_text — normalized_text is idempotent,
    # so re-normalizing inside with_blocking_keys changes nothing) and
    # the per-side payload joins.  Persisted because it is consumed three
    # times and the SimHash UDF must run exactly once per page.
    from pyspark.storagelevel import StorageLevel

    prep = prepare_pages(pages).persist(StorageLevel.MEMORY_AND_DISK)
    pairs = candidate_pairs(
        prep.select("url", F.col("norm_text").alias("text")),
        blocking_cfg,
        id_col="url",
        payload_cols=(),
    ).withColumnsRenamed({"id_a": "url_a", "id_b": "url_b"})
    pa = prep.select(
        F.col("url").alias("url_a"),
        F.col("canon_url").alias("canon_url_a"),
        F.col("norm_text").alias("norm_text_a"),
        F.col("simhash").alias("simhash_a"),
    )
    pb = prep.select(
        F.col("url").alias("url_b"),
        F.col("canon_url").alias("canon_url_b"),
        F.col("norm_text").alias("norm_text_b"),
        F.col("simhash").alias("simhash_b"),
    )
    pairs = pairs.join(pa, "url_a").join(pb, "url_b")
    return score_pairs(pairs, scoring_cfg)
