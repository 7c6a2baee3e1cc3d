"""Benchmark harness — the driver runs this per round.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "pairs_scored_per_sec": ...}

Each query is forced with a count/collect (results are not retained).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from data_reconciliation_spark.plans import driver_queries as dq
    from data_reconciliation_spark.plans.pipeline import link
    from data_reconciliation_spark.session import build_session
    from data_reconciliation_spark.testgen import generate_pages

    spark = build_session(
        app_name="recon-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        # the ER scoring UDF ships only short urls/titles: large Arrow
        # batches amortize the numpy-vectorized kernels (measured 2x,
        # tools/profile_udf_decay.py).  None of the benched queries
        # carry fat binary rows, so the 50k batch cap is safe here.
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "50000"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    def run(name: str, fn) -> None:
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    # untimed warmup: absorb first-query JVM codegen compilation +
    # Python-worker spawn so it doesn't land on whichever headline query
    # happens to run first (measured 10-15s on a fresh JVM).
    dq.q_reconcile_exceptions(spark, sf_dir).count()
    dq.q_text_stats(spark, sf_dir).count()

    # headline operator queries on driver testdata
    run("reconcile_exceptions", lambda: dq.q_reconcile_exceptions(spark, sf_dir).count())
    run("j1_full_outer_merge", lambda: dq.q_j1_full_outer_merge(spark, sf_dir).count())
    run("a1_match_metrics", lambda: dq.q_a1_match_metrics(spark, sf_dir).collect())
    run("f3_tolerance", lambda: dq.q_f3_tolerance_with_coercion(spark, sf_dir).count())
    run("a9_dedup_gate_24h", lambda: dq.q_a9_dedup_gate_24h(spark, sf_dir).count())
    run("dedup_exact", lambda: dq.q_dedup_exact(spark, sf_dir).count())
    run("minhash_lsh_pairs", lambda: dq.q_minhash_lsh_pairs(spark, sf_dir).count())
    run("simhash_pairs", lambda: dq.q_simhash_pairs(spark, sf_dir).count())
    run("ann_cosine_topk", lambda: dq.q_ann_cosine_topk(spark, sf_dir).count())
    run("text_stats", lambda: dq.q_text_stats(spark, sf_dir).count())
    run(
        "cluster_chain_components",
        lambda: dq.q_cluster_chain_components(spark, sf_dir).count(),
    )

    # flagship ER pipeline on deterministic synthetic pages: blocking ->
    # Arrow-UDF scoring -> transitive clustering; pairs/sec is the
    # BASELINE.json throughput metric.
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "20000"))
    pages = generate_pages(
        spark, n_rows=n_pages, n_entities=n_pages // 4, partitions=max(cpus * 2, 16)
    ).persist()
    pages.count()  # input materialization is not pipeline cost

    # Three passes; report the third (steady state).  The first pass in a
    # fresh JVM pays whole-stage-codegen compilation + Python-worker spawn
    # (measured 3-4x inflation) and the second still carries partial
    # warmup (measured bimodal 35s/52s at sf0.1), which is amortized
    # noise on any real
    # long-running cluster.
    er_scoring_sec, n_pairs, cluster_sec = None, 0, None
    for _ in range(3):
        t0 = time.time()
        res = link(pages)
        n_pairs = res.scored_pairs.count()
        er_scoring_sec = time.time() - t0
        t0 = time.time()
        res.clusters.count()
        cluster_sec = time.time() - t0
        res.scored_pairs.unpersist()
    # er_pipeline = blocking + cascade scoring + transitive closure
    # (link() runs the closure eagerly); er_labels_join = the final
    # cluster-label materialization.
    timings["er_labels_join"] = round(cluster_sec, 3)
    timings["er_pipeline"] = round(er_scoring_sec, 3)
    pairs_per_sec = round(n_pairs / er_scoring_sec, 1) if er_scoring_sec else 0.0

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "pairs_scored": n_pairs,
                "pairs_scored_per_sec": pairs_per_sec,
                "cpus": cpus,
                "bench_pages": n_pages,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
