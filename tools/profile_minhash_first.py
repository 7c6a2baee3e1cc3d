"""Attribute minhash_lsh_pairs' first-invocation overhead (headline
13.6s vs 1.8s kernel in bench.py) to its components: Python-worker
spawn + Arrow init vs whole-stage-codegen/JIT vs actual compute.

Usage: python tools/profile_minhash_first.py [--prewarm-udf] [--prewarm-minhash-shape]

Replicates bench.py's session + warmup exactly, then times the
bench_minhash thunk twice.  With --prewarm-udf, a trivial pandas UDF
over 32 partitions runs (and is timed) before the first invocation, so
the delta between modes isolates the Python-boundary spawn share.
"""

from __future__ import annotations

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    prewarm_udf = "--prewarm-udf" in sys.argv

    from pyspark.sql import functions as F

    from data_reconciliation_spark.plans import driver_queries as dq
    from data_reconciliation_spark.session import build_session

    spark = build_session(
        app_name="profile-minhash-first",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "50000"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    for f in glob.glob(os.path.join(sf_dir, "*.parquet")) + glob.glob(
        os.path.join(sf_dir, "*.parquet", "*")
    ):
        if os.path.isfile(f):
            with open(f, "rb") as fh:
                while fh.read(1 << 22):
                    pass
    dq.q_reconcile_exceptions(spark, sf_dir).count()
    dq.q_text_stats(spark, sf_dir).count()

    if prewarm_udf:
        import pandas as pd  # noqa: F401
        from pyspark.sql.pandas.functions import pandas_udf

        @pandas_udf("long")
        def _ident(s):
            return s

        t0 = time.time()
        spark.range(0, cpus * 4, 1, cpus).select(_ident("id")).count()
        print(f"udf_prewarm: {time.time() - t0:.3f}s")

    if "--full-prefix" in sys.argv:
        # replicate the exact bench.py query sequence before minhash
        t0 = time.time()
        dq.q_reconcile_exceptions(spark, sf_dir).count()
        dq.q_j1_full_outer_merge(spark, sf_dir).count()
        dq.q_a1_match_metrics(spark, sf_dir).collect()
        dq.q_f3_tolerance_with_coercion(spark, sf_dir).count()
        dq.q_a9_dedup_gate_24h(spark, sf_dir).count()
        dq.q_dedup_exact(spark, sf_dir).count()
        print(f"prefix: {time.time() - t0:.3f}s")

    from data_reconciliation_spark.config import BlockingConfig
    from data_reconciliation_spark.lifecycle import release_cached
    from data_reconciliation_spark.operators.dedup import minhash_lsh_pairs

    def bench_minhash():
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        pairs = minhash_lsh_pairs(
            docs,
            cfg=BlockingConfig(shingle_size=1, num_hashes=32, bands=2),
            verify_threshold=1.0,
        )
        n = pairs.count()
        release_cached(pairs)
        return n

    t0 = time.time()
    n = bench_minhash()
    t1 = time.time()
    bench_minhash()
    t2 = time.time()
    print(
        f"minhash first: {t1 - t0:.3f}s  second: {t2 - t1:.3f}s  rows={n}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
