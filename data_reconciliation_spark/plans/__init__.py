"""End-to-end pipelines (logical plans composed from operators)."""

from data_reconciliation_spark.plans.pipeline import LinkResult, link  # noqa: F401
