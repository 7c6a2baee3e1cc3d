"""Batch readers/sinks (SURVEY.md §2.1 S1-S9).

The engine's primary scan is Parquet (Iceberg at cluster scale); the
reference's upload-file surface (CSV with encoding fallback, XML
fallback parsing, extension gating, preview-N) maps to the helpers
here.  Excel (S2) is explicitly out of scope for a web-scale engine —
``read_excel_small`` documents the boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ALLOWED_EXTENSIONS = {"csv", "xlsx", "xls", "xml", "parquet"}

# Reference encoding fallback chain (helpers.py:56-69, 162-180).
_ENCODING_CHAIN = ("UTF-8", "ISO-8859-1")


def file_type_allowed(filename: str) -> bool:
    """S4 gate (reference helpers.py:6-19): extension allow-list."""
    return "." in filename and filename.rsplit(".", 1)[1].lower() in ALLOWED_EXTENSIONS


def read_csv_with_fallback(
    spark: SparkSession, path: str, header: bool = True
) -> DataFrame:
    """S1: CSV scan with encoding fallback utf-8 -> latin-1 (reference
    helpers.py:56-69).  Fallback is detected by scanning for decode
    failures on a 1-row probe, mirroring the reference's try/except chain
    without reading the whole file twice."""
    last_err: Exception | None = None
    df = None
    for enc in _ENCODING_CHAIN:
        try:
            df = (
                spark.read.option("header", header)
                .option("encoding", enc)
                .option("inferSchema", True)
                .option("mode", "FAILFAST")
                .csv(path)
            )
            # Spark's CSV reader substitutes U+FFFD for undecodable bytes
            # rather than raising, so probe a few rows for replacement
            # characters (the decode-failure signal the reference's
            # try/except chain reacts to).
            probe = df.limit(20).collect()
            mojibake = any(
                isinstance(v, str) and "�" in v
                for row in probe
                for v in row
            )
            if not mojibake:
                return df
        except Exception as e:  # parse failure -> next encoding
            last_err = e
    if df is not None:
        return df  # every encoding showed replacement chars; best effort
    raise last_err  # type: ignore[misc]


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Primary scan: parquet table from a testdata/warehouse directory.
    (Iceberg: ``spark.read.format('iceberg').load(name)`` — same call
    site, different format string.)"""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def preview_columns(df: DataFrame, max_rows: int = 5) -> tuple[list[str], list[dict]]:
    """S5 (helpers.py:114-139): column names + first-N preview.  The
    limit is pushed into the scan (GlobalLimit/LocalLimit over a
    single-file read)."""
    return df.columns, [r.asDict() for r in df.limit(max_rows).collect()]


def validate_file_structure(
    df: DataFrame, min_rows: int = 1, min_cols: int = 1
) -> list[str]:
    """P8 (helpers.py:201-231): structural validation — duplicate column
    names (plan-time), minimum rows/cols (one limit-probe job)."""
    problems = []
    seen, dups = set(), set()
    for c in df.columns:
        if c in seen:
            dups.add(c)
        seen.add(c)
    if dups:
        problems.append(f"duplicate columns: {sorted(dups)}")
    if len(df.columns) < min_cols:
        problems.append(f"fewer than {min_cols} columns")
    if df.limit(min_rows).count() < min_rows:
        problems.append(f"fewer than {min_rows} rows")
    return problems


def write_audit_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S7/S8 sink: the engine writes parquet/Iceberg, never JDBC
    row-at-a-time.  ``mode='overwrite'`` matches the reference's
    ``if_exists='replace'`` (etl.py:63-68)."""
    df.write.mode(mode).parquet(path)


def same_system_gate(filename_a: str, filename_b: str) -> bool:
    """P9 (frontend/utils/validators.py:1-31): both datasets must share
    the prefix before the first ``_``/``-``/space."""

    def system_of(name: str) -> str:
        stem = name.rsplit(".", 1)[0]
        for sep in ("_", "-", " "):
            if sep in stem:
                stem = stem.split(sep)[0]
        return stem.strip().lower()

    return system_of(filename_a) == system_of(filename_b)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table bucketed (and optionally sorted) on the join key.

    Two tables bucketed on the same key with the same bucket count join
    WITHOUT a shuffle (no Exchange in the plan) — the co-location
    strategy for repeated big-big joins, e.g. the page table and its
    scored-pair table keyed by url hash.  Requires a session with a
    warehouse dir (``saveAsTable``; plain files cannot carry bucket
    metadata)."""
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)
