"""Pair-scoring stage: one Arrow batch computes every similarity feature
for each candidate pair (SURVEY.md §7 step 5).

The reference applies its similarity predicate row-by-row after the
equi-join (``compare.py:352-375``); here the generalized similarity join
feeds a *single* struct-returning pandas UDF (Jaro-Winkler on canonical
URLs, indel ratio / token-Jaccard / SimHash-Hamming on normalized text),
then native threshold expressions produce the verdict.  The stage is
map-only — the shuffle budget is spent entirely in blocking, never in
scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_reconciliation_spark.config import BlockingConfig, ScoringConfig
from data_reconciliation_spark.functions.normalize import canonical_url, normalized_text
from data_reconciliation_spark.functions.similarity import pair_features_udf
from data_reconciliation_spark.operators.blocking import candidate_pairs


def score_pairs(
    pairs: DataFrame,
    cfg: ScoringConfig | None = None,
    url_a: str = "url_a",
    url_b: str = "url_b",
    text_a: str = "text_a",
    text_b: str = "text_b",
) -> DataFrame:
    """Add features + score + is_match verdict to a candidate-pair table.

    Expects payload columns (url_a, url_b, text_a, text_b); emits the
    SCORED_PAIR_SCHEMA shape.  The UDF receives *canonicalized* inputs so
    scheme/www/query noise and whitespace runs never reach Python.
    """
    cfg = cfg or ScoringConfig()
    feats = pair_features_udf(
        canonical_url(F.col(url_a)),
        canonical_url(F.col(url_b)),
        normalized_text(F.col(text_a)),
        normalized_text(F.col(text_b)),
    )
    scored = pairs.withColumn("f", feats).select(
        "*",
        F.col("f.url_jw").alias("url_jw"),
        F.col("f.text_ratio").alias("text_ratio"),
        F.col("f.token_jaccard").alias("token_jaccard"),
        F.col("f.simhash_hamming").alias("simhash_hamming"),
    ).drop("f")

    # Weighted evidence score in [0,1]; native expressions.
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
    scored = scored.withColumn("score", score).withColumn(
        "is_match", strong_text & (F.col("score") >= cfg.match_threshold)
    )
    return scored


def block_score_pipeline(
    pages: DataFrame,
    blocking_cfg: BlockingConfig | None = None,
    scoring_cfg: ScoringConfig | None = None,
) -> DataFrame:
    """blocking -> candidate pairs (with payloads) -> scored pairs."""
    pairs = candidate_pairs(
        pages, blocking_cfg, id_col="url", payload_cols=("text",)
    ).withColumnsRenamed({"id_a": "url_a", "id_b": "url_b"})
    return score_pairs(pairs)
