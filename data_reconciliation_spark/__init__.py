"""PySpark-native record-linkage / reconciliation engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of ieatmomo/Data-Reconciliation (reference surveyed in
SURVEY.md).  The reference's pandas full-outer-join + per-row field-diff
core (reference ``backend/analysis/compare.py:178-324``) becomes a
three-stage DataFrame flow:

1. blocking  (normalized URL host + MinHash-LSH band keys, salted)
2. pair scoring (Arrow-vectorized pandas UDFs; no per-row Python)
3. transitive clustering (large-star/small-star label propagation)

plus a ``reconcile()`` API that reproduces the reference's snapshot
comparison semantics exactly (null rules, fuzzy thresholds, numeric
tolerance, match-percentage formula).
"""

__version__ = "0.1.0"

from data_reconciliation_spark.config import (  # noqa: F401
    BlockingConfig,
    FieldRule,
    ReconConfig,
    ScoringConfig,
)
from data_reconciliation_spark.operators.reconcile import (  # noqa: F401
    ReconcileResult,
    reconcile,
)
