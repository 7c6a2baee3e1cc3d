"""Stage decomposition of minhash_lsh_pairs at the bench config.

Inlines the operator's internal tables and times each materialization
(warm pass after one full run) to attribute the per-invocation cost.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from data_reconciliation_spark.config import BlockingConfig
    from data_reconciliation_spark.functions.normalize import normalized_text
    from data_reconciliation_spark.operators.blocking import (
        attach_minhash_signature,
        band_hashes,
        token_shingles_from,
    )
    from data_reconciliation_spark.plans import driver_queries as dq
    from data_reconciliation_spark.session import build_session

    spark = build_session(
        app_name="minhash-stages",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "50000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    dq.q_text_stats(spark, sf_dir).count()

    cfg = BlockingConfig(shingle_size=1, num_hashes=32, bands=2)

    def build():
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        if "--repart" in sys.argv:
            docs = docs.repartition(cpus)
        toks = F.split(normalized_text(F.col("text")), " ")
        base = docs.select(F.col("doc_id"), toks.alias("__toks"))
        sig = attach_minhash_signature(
            base.select(
                "doc_id",
                F.array_distinct(
                    F.transform(F.col("__toks"), lambda t: F.xxhash64(t))
                ).alias("__th"),
                F.col("__toks"),
            ),
            token_shingles_from(F.col("__toks"), cfg.shingle_size),
            "__sig",
            cfg.num_hashes,
        )
        per_doc = sig.select(
            "doc_id",
            "__th",
            band_hashes(F.col("__sig"), cfg.bands, cfg.rows_per_band).alias("__bks"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        keyed = per_doc.select("doc_id", F.explode("__bks").alias("band_key"))
        return per_doc, keyed

    for it in range(2):
        per_doc, keyed = build()
        t = {}
        t0 = time.time()
        per_doc.count()
        t["1_per_doc_cache"] = time.time() - t0

        t0 = time.time()
        hot = (
            keyed.groupBy("band_key")
            .count()
            .where(F.col("count") > cfg.max_block_size)
            .select("band_key")
        )
        n_hot = hot.count()
        t["2_hot_count"] = time.time() - t0

        t0 = time.time()
        keyed2 = keyed.join(F.broadcast(hot), "band_key", "left_anti")
        a = keyed2.select("band_key", F.col("doc_id").alias("id_a"))
        b = keyed2.select("band_key", F.col("doc_id").alias("id_b"))
        pairs = (
            a.join(b, "band_key")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        n_pairs = pairs.count()
        t["3_selfjoin_distinct"] = time.time() - t0

        t0 = time.time()
        ta = per_doc.select(F.col("doc_id").alias("id_a"), F.col("__th").alias("__th_a"))
        tb = per_doc.select(F.col("doc_id").alias("id_b"), F.col("__th").alias("__th_b"))

        def _jac(i):
            union = F.size("__th_a") + F.size("__th_b") - i
            return F.when(union == 0, F.lit(1.0)).otherwise(i.cast("double") / union)

        jaccard = F.element_at(
            F.transform(F.array(F.size(F.array_intersect("__th_a", "__th_b"))), _jac), 1
        )
        out = (
            pairs.join(ta, "id_a")
            .join(tb, "id_b")
            .withColumn("jaccard", jaccard)
            .where(F.col("jaccard") >= 1.0)
        )
        n_out = out.count()
        t["4_verify"] = time.time() - t0
        per_doc.unpersist()
        if it:
            print(f"hot={n_hot} pairs={n_pairs} out={n_out}")
            for k, v in t.items():
                print(f"{k:24s} {v:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
