"""A/B the minhash latency-regime choice at bench scale.

Usage: python tools/minhash_ab.py [auto|on|off]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "auto"
    lat = {"auto": None, "on": True, "off": False}[mode]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from data_reconciliation_spark.config import BlockingConfig
    from data_reconciliation_spark.lifecycle import release_cached
    from data_reconciliation_spark.operators.dedup import minhash_lsh_pairs
    from data_reconciliation_spark.plans import driver_queries as dq
    from data_reconciliation_spark.session import build_session

    spark = build_session(
        app_name="minhash-ab",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "50000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    dq.q_reconcile_exceptions(spark, sf_dir).count()
    dq.q_text_stats(spark, sf_dir).count()

    def run():
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        pairs = minhash_lsh_pairs(
            docs,
            cfg=BlockingConfig(shingle_size=1, num_hashes=32, bands=2),
            verify_threshold=1.0,
            latency_regime=lat,
        )
        n = pairs.count()
        release_cached(pairs)
        return n

    times = []
    for _ in range(4):
        t0 = time.time()
        run()
        times.append(round(time.time() - t0, 3))
    print(f"mode={mode} times={times}")
    spark.stop()


if __name__ == "__main__":
    main()
