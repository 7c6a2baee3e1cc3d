"""Text-analysis functions for training-data curation — all native
Catalyst expressions (whole-stage codegen; no Python).

Engine extensions over the reference's string surface (X1-X9,
SURVEY.md §2.9): language ID, quality scoring, token counting, document
fingerprinting.  Each is also exposed as an oracle-checked query in
``__spark_entry__.py`` (DuckDB computes the identical expressions).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from data_reconciliation_spark.functions.normalize import normalized_text

# Tiny deterministic stopword lists per language (heuristic language ID —
# the point is the Spark plumbing, not linguistic accuracy).
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "a", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit", "zu", "auf"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
}


def whitespace_token_count(text: Column | str) -> Column:
    """Token count by whitespace splitting (0 for empty/blank)."""
    text = F.col(text) if isinstance(text, str) else text
    norm = normalized_text(text)
    return F.when(F.length(norm) == 0, F.lit(0)).otherwise(
        F.size(F.split(norm, " "))
    )


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish token estimate: count word-piece matches of a BPE-ish
    regex (runs of letters, digits, or single punctuation).  A cheap,
    deterministic proxy for tokenizer cost accounting."""
    text = F.col(text) if isinstance(text, str) else text
    return F.size(
        F.regexp_extract_all(text, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1)
    )


def punct_ratio(text: Column | str) -> Column:
    """punctuation chars / total chars (0 when empty)."""
    text = F.col(text) if isinstance(text, str) else text
    total = F.length(text)
    punct = total - F.length(F.regexp_replace(text, r"[!-/:-@\[-`{-~]", ""))
    return F.when(total == 0, F.lit(0.0)).otherwise(punct / total)


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    """fraction of whitespace tokens that are stopwords of ``lang``."""
    text = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.lower(normalized_text(text)), " ")
    sw = F.array(*[F.lit(w) for w in _STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(hits / F.size(toks))


def quality_score(
    text: Column | str, min_tokens: int = 10, max_tokens: int = 100_000
) -> Column:
    """Composite quality heuristic in [0,1]: length band + low punct +
    reasonable mean word length.  Deterministic; thresholds documented in
    the expression itself (the length band is the config knob a curation
    pipeline tunes per corpus)."""
    text = F.col(text) if isinstance(text, str) else text
    n_tok = whitespace_token_count(text)
    mean_word = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace(normalized_text(text), " ", "")) / n_tok
    )
    length_ok = F.when((n_tok >= min_tokens) & (n_tok <= max_tokens), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(text) <= 0.2, 1.0).otherwise(0.0)
    word_ok = F.when((mean_word >= 2.0) & (mean_word <= 12.0), 1.0).otherwise(0.0)
    return (length_ok + punct_ok + word_ok) / 3.0


def lang_id(text: Column | str) -> Column:
    """Heuristic language ID: argmax stopword-hit count over the three
    lists; 'und' when nothing matches."""
    text = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.lower(normalized_text(text)), " ")
    scores = []
    for lang, words in _STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.greatest(*scores)  # struct compare: hits first, then lang
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def rolling_fingerprint(text: Column | str, window: int = 8) -> Column:
    """Document fingerprint: min of xxhash64 over ``window``-token
    rolling windows (winnowing-style).  Stable under small edits far
    from the minimum window; native expressions only."""
    text = F.col(text) if isinstance(text, str) else text
    toks = F.split(normalized_text(text), " ")

    # token array bound as a lambda variable: interpreted HOF evaluation
    # would otherwise re-run the regex split once per window
    def windows(tk: Column) -> Column:
        n = F.size(tk)
        return F.when(
            n >= window,
            F.transform(
                F.sequence(F.lit(1), n - (window - 1)),
                lambda i: F.xxhash64(F.array_join(F.slice(tk, i, window), " ")),
            ),
        ).otherwise(F.array(F.xxhash64(F.array_join(tk, " "))))

    return F.array_min(F.flatten(F.transform(F.array(toks), windows)))
