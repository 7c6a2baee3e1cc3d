"""Focused experiment for the 32-core pass-over-pass decay of the
Arrow-UDF stage (profile3: 5.2s -> 10.5s -> 25.5s at busy ~0.9).

Hypotheses: (a) reused python workers accumulate memory / degrade;
(b) tiny Arrow batches (512 partitions -> ~1.8k rows) waste the numpy
vectorization; (c) JVM/OS memory pressure.  Each variant runs in a
fresh pinned subprocess; passes report elapsed + process-tree RSS.

Usage: python tools/profile_udf_decay.py [--pages 50000] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time
cores = int(sys.argv[1]); n_pages = int(sys.argv[2])
variant = json.loads(sys.argv[3])

def _tree_rss_gb():
    me = os.getpid()
    parent, rss = {}, {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                s = f.read()
        except OSError:
            continue
        f2 = s[s.rindex(")") + 2:].split()
        parent[int(d)] = int(f2[1])
        rss[int(d)] = int(f2[21]) * 4096
    tot = 0
    for pid in rss:
        p, seen = pid, 0
        while p > 1 and seen < 64:
            if p == me:
                tot += rss[pid]
                break
            p = parent.get(p, 1)
            seen += 1
    return round(tot / (1 << 30), 2)

from pyspark.storagelevel import StorageLevel
from pyspark.sql import functions as F
from data_reconciliation_spark.session import build_session
from data_reconciliation_spark.testgen import generate_pages
from data_reconciliation_spark.operators.blocking import candidate_pairs
from data_reconciliation_spark.operators.scoring import prepare_pages, jw_features_udf

conf = {
    "spark.driver.extraJavaOptions": "-XX:+UseG1GC",
    "spark.sql.inMemoryColumnarStorage.compressed": "false",
}
conf.update(variant.get("conf", {}))
spark = build_session(app_name="udf-decay", master=f"local[{cores}]",
                      shuffle_partitions=128, extra_conf=conf)
spark.sparkContext.setLogLevel("ERROR")

pages = generate_pages(spark, n_rows=n_pages, n_entities=n_pages // 16,
                       n_hosts=max(50, n_pages // 32), partitions=128).persist()
pages.count()
cp = candidate_pairs(pages).withColumnsRenamed({"id_a": "url_a", "id_b": "url_b"})
prep = prepare_pages(pages)
pa = prep.select(F.col("url").alias("url_a"), F.col("canon_url").alias("canon_url_a"),
                 F.col("title").alias("title_a"))
pb = prep.select(F.col("url").alias("url_b"), F.col("canon_url").alias("canon_url_b"),
                 F.col("title").alias("title_b"))
pairs = (cp.join(pa, "url_a").join(pb, "url_b")
           .select("canon_url_a", "canon_url_b", "title_a", "title_b")
           .repartition(variant.get("parts", 512))
           .persist(StorageLevel.MEMORY_AND_DISK))
n_pairs = pairs.count()

passes = []
for i in range(6):
    t0 = time.time()
    (pairs.select(jw_features_udf(F.col("canon_url_a"), F.col("canon_url_b"),
                                  F.col("title_a"), F.col("title_b")).alias("e"))
          .agg(F.count("e.url_jw")).collect())
    passes.append({"sec": round(time.time() - t0, 2), "rss_gb": _tree_rss_gb()})
print("RESULT " + json.dumps({"variant": variant.get("name"), "pairs": n_pairs,
                              "passes": passes}), flush=True)
spark.stop()
"""

VARIANTS = [
    {"name": "baseline-512p-reuse", "parts": 512},
    {"name": "noreuse-512p", "parts": 512,
     "conf": {"spark.python.worker.reuse": "false"}},
    {"name": "reuse-128p-bigbatch", "parts": 128,
     "conf": {"spark.sql.execution.arrow.maxRecordsPerBatch": "50000"}},
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=50_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--mem", default="48g")
    args = ap.parse_args()
    for v in VARIANTS:
        env = dict(os.environ)
        env.setdefault("SPARK_DRIVER_MEMORY", args.mem)
        out = subprocess.run(
            ["taskset", "-c", f"0-{args.cores - 1}",
             sys.executable, "-c", _CHILD, str(args.cores), str(args.pages),
             json.dumps(v)],
            capture_output=True, text=True, env=env, check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                print(line[len("RESULT "):], flush=True)


if __name__ == "__main__":
    main()
