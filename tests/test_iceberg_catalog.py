"""Exercise the checkpoint interface against a REAL Iceberg catalog
(round-3 verdict #8).

The sandbox ships no ``iceberg-spark-runtime`` jar and has no network,
so these tests SKIP here; on any deployment with the jar (``--packages
org.apache.iceberg:iceberg-spark-runtime-3.5_2.13``) they run against a
local hadoop catalog and prove the "same API" claim of
``sources/state.py`` by construction: save / latest / lineage / resume
through ``connected_components`` behave identically to the parquet
fallback.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_reconciliation_spark.sources.state import (
    IcebergCheckpointManager,
    iceberg_available,
)


@pytest.fixture()
def iceberg_spark(tmp_path):
    from data_reconciliation_spark.session import build_session

    base = build_session(master="local[4]", shuffle_partitions=4)
    if not iceberg_available(base):
        pytest.skip("iceberg-spark-runtime not on classpath (sandboxed run)")
    spark = build_session(
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.catalog.ckpt": "org.apache.iceberg.spark.SparkCatalog",
            "spark.sql.catalog.ckpt.type": "hadoop",
            "spark.sql.catalog.ckpt.warehouse": str(tmp_path / "warehouse"),
        },
    )
    return spark


def test_iceberg_checkpoint_roundtrip(iceberg_spark):
    spark = iceberg_spark
    mgr = IcebergCheckpointManager(spark, "ckpt", namespace="t1")
    assert mgr.latest() is None
    edges = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    mgr.save(1, edges)
    it, df = mgr.latest()
    assert it == 1
    assert {(r["src"], r["dst"]) for r in df.collect()} == {("a", "b"), ("b", "c")}
    # replace with iteration 2; latest must move atomically
    mgr.save(2, edges.limit(1))
    it2, df2 = mgr.latest()
    assert it2 == 2 and df2.count() == 1
    lin = mgr.lineage()
    assert lin is not None and lin.where(F.col("iteration") == 1).count() > 0


def test_iceberg_closure_resume(iceberg_spark, tmp_path):
    from data_reconciliation_spark.operators.cluster import connected_components

    spark = iceberg_spark
    mgr = IcebergCheckpointManager(spark, "ckpt", namespace="t2")
    chain = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(30)], "src string, dst string"
    )
    full = connected_components(chain)
    want = {(r["node"], r["component"]) for r in full.collect()}

    # run once WITH the manager (distributed loop forced so rounds are
    # snapshotted), then resume from its last committed round —
    # identical labels
    connected_components(chain, checkpoint=mgr, local_finish_threshold=0).count()
    resumed = connected_components(chain, checkpoint=mgr, local_finish_threshold=0)
    assert {(r["node"], r["component"]) for r in resumed.collect()} == want
