"""Stage-level decomposition of the ER pipeline at bench scale.

Times each stage in isolation with noop sinks (guide §1.4) after a full
warmup pass, labeling jobs (guide §1.5).  The stage caches mirror the
production pipeline's persist points, so the deltas attribute the
per-pass cost: prep (page payload + simhash UDF), block table build,
candidate join + dedup, payload joins + scoring UDF + persist write,
closure + labels.

Usage: python tools/profile_er_stages.py [--pages 20000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=20_000)
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    from pyspark.storagelevel import StorageLevel

    from data_reconciliation_spark.config import BlockingConfig
    from data_reconciliation_spark.lifecycle import release_cached
    from data_reconciliation_spark.operators.blocking import candidate_pairs
    from data_reconciliation_spark.operators.cluster import connected_components
    from data_reconciliation_spark.operators.scoring import (
        block_score_pipeline,
        prepare_pages,
    )
    from data_reconciliation_spark.plans.pipeline import link
    from data_reconciliation_spark.session import build_session
    from data_reconciliation_spark.testgen import generate_pages
    from pyspark.sql import functions as F

    spark = build_session(
        app_name="er-stage-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "50000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    pages = generate_pages(
        spark, n_rows=args.pages, n_entities=args.pages // 4,
        partitions=max(cpus * 2, 16)
    ).persist()
    pages.count()

    # full warmup pass (codegen + python workers)
    for _ in range(2):
        res = link(pages)
        res.scored_pairs.count()
        res.clusters.count()
        res.release()

    t = {}

    def timed(name, fn):
        sc.setJobDescription(name)
        t0 = time.time()
        out = fn()
        t[name] = round(time.time() - t0, 3)
        sc.setJobDescription(None)
        print(f"{name:32s} {t[name]:>7.3f}s", flush=True)
        return out

    # 1. prep payload (canon url, title, tok hashes, simhash UDF)
    prep = prepare_pages(pages).persist(StorageLevel.MEMORY_AND_DISK)
    timed("1_prep_payload", lambda: noop(prep))

    # 2. candidate pairs (block table build + self join + dedup)
    cfg = BlockingConfig()
    cand = candidate_pairs(
        prep.select("url", F.col("norm_text").alias("text")), cfg,
        id_col="url", payload_cols=(), keep_hashed_ids=cfg.dictionary_ids,
    )
    timed("2_candidates_build+dedup", lambda: noop(cand))

    # 3. full scoring over a fresh pipeline (prep+blocks re-derived and
    #    cached fresh inside) — noop sink, no persist of scored
    release_cached(cand)
    prep.unpersist()
    scored = block_score_pipeline(pages, collect_fanout=False)
    timed("3_block+score_noop", lambda: noop(scored))

    # 4. the same scored materialized through the production persist
    scored2 = scored.persist(StorageLevel.MEMORY_AND_DISK)
    timed("4_scored_persist_write", lambda: scored2.count())
    timed("5_scored_cached_count", lambda: scored2.count())

    # 6. closure from cached matches
    matches = scored2.where(F.col("is_match")).select("url_a", "url_b", "score")
    comp = timed(
        "6_closure",
        lambda: connected_components(
            matches, src="url_a", dst="url_b", assume_distinct=True
        ),
    )
    timed(
        "7_labels_join_count",
        lambda: pages.select("url")
        .join(comp, pages["url"] == comp["node"], "left")
        .count(),
    )
    total = sum(t.values())
    print(f"{'sum':32s} {total:>7.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
