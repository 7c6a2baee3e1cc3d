"""Extra benchmarks + instrumentation (bench.py itself is FROZEN for
measurement; this file holds the round-7 noop-sink isolation runs and
the per-query JVM attribution used to chase the headline variance).

Replicates bench.py's exact sequence/config, and per query records:

* wall seconds (same as bench.py)
* GC time delta (all collectors, via java.lang.management)
* JIT compilation time delta (total accumulated compiler thread time)
* executor run time / CPU time deltas from the stage metrics listener

Usage: python bench_extra.py            # instrumented bench replica
       python bench_extra.py --noop     # noop-sink isolation per query
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    from data_reconciliation_spark.plans import driver_queries as dq
    from data_reconciliation_spark.session import build_session

    spark = build_session(
        app_name="recon-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "50000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory

    def gc_ms() -> int:
        return sum(
            b.getCollectionTime() for b in mf.getGarbageCollectorMXBeans()
        )

    def jit_ms() -> int:
        return mf.getCompilationMXBean().getTotalCompilationTime()

    noop = "--noop" in sys.argv

    for f in glob.glob(os.path.join(sf_dir, "*.parquet")) + glob.glob(
        os.path.join(sf_dir, "*.parquet", "*")
    ):
        if os.path.isfile(f):
            with open(f, "rb") as fh:
                while fh.read(1 << 22):
                    pass
    dq.q_reconcile_exceptions(spark, sf_dir).count()
    dq.q_text_stats(spark, sf_dir).count()

    from data_reconciliation_spark.config import BlockingConfig
    from data_reconciliation_spark.lifecycle import release_cached
    from data_reconciliation_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs

    def force(df):
        if noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    def bench_minhash():
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        pairs = minhash_lsh_pairs(
            docs,
            cfg=BlockingConfig(shingle_size=1, num_hashes=32, bands=2),
            verify_threshold=1.0,
        )
        force(pairs)
        release_cached(pairs)

    def bench_simhash():
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        pairs = simhash_pairs(docs, max_hamming=6, n_chunks=8)
        force(pairs)
        release_cached(pairs)

    thunks = {
        "reconcile_exceptions": lambda: force(dq.q_reconcile_exceptions(spark, sf_dir)),
        "j1_full_outer_merge": lambda: force(dq.q_j1_full_outer_merge(spark, sf_dir)),
        "a1_match_metrics": lambda: dq.q_a1_match_metrics(spark, sf_dir).collect(),
        "f3_tolerance": lambda: force(dq.q_f3_tolerance_with_coercion(spark, sf_dir)),
        "a9_dedup_gate_24h": lambda: force(dq.q_a9_dedup_gate_24h(spark, sf_dir)),
        "dedup_exact": lambda: force(dq.q_dedup_exact(spark, sf_dir)),
        "minhash_lsh_pairs": bench_minhash,
        "simhash_pairs": bench_simhash,
        "ann_cosine_topk": lambda: force(dq.q_ann_cosine_topk(spark, sf_dir)),
        "text_stats": lambda: force(dq.q_text_stats(spark, sf_dir)),
        "cluster_chain_components": lambda: force(
            dq.q_cluster_chain_components(spark, sf_dir)
        ),
    }

    rows = {}
    for name, fn in thunks.items():
        g0, c0, t0 = gc_ms(), jit_ms(), time.time()
        fn()
        rows[name] = {
            "sec": round(time.time() - t0, 3),
            "gc_ms": gc_ms() - g0,
            "jit_ms": jit_ms() - c0,
        }

    # warm kernels pass, same instrumentation
    for name, fn in thunks.items():
        g0, c0, t0 = gc_ms(), jit_ms(), time.time()
        fn()
        rows[name]["warm_sec"] = round(time.time() - t0, 3)
        rows[name]["warm_gc_ms"] = gc_ms() - g0
        rows[name]["warm_jit_ms"] = jit_ms() - c0

    print(json.dumps(rows, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
