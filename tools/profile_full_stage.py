"""Per-pass JVM-vs-Python CPU breakdown of the FULL scaling-bench
scoring stage (parquet + union4 input, identical to bench_scaling.py),
to locate the 32-core work inflation (bench3: ~2-3x the CPU-seconds of
the 8-core leg for the same pairs).

Usage: python tools/profile_full_stage.py [--pages 50000] [--cores 8,32]
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

CLK = os.sysconf("SC_CLK_TCK")

def _tree_cpu_split():
    me = os.getpid()
    parent, ticks, comm = {}, {}, {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                s = f.read()
        except OSError:
            continue
        rp = s.rindex(")")
        name = s[s.index("(") + 1:rp]
        f2 = s[rp + 2:].split()
        pid = int(d)
        parent[pid] = int(f2[1])
        ticks[pid] = int(f2[11]) + int(f2[12])
        comm[pid] = name
    jvm = py = other = 0
    for pid in ticks:
        p, seen = pid, 0
        while p > 1 and seen < 64:
            if p == me:
                if "java" in comm[pid]:
                    jvm += ticks[pid]
                elif "python" in comm[pid]:
                    py += ticks[pid]
                else:
                    other += ticks[pid]
                break
            p = parent.get(p, 1)
            seen += 1
    return jvm / CLK, py / CLK, other / CLK

from pyspark.sql import functions as F
from data_reconciliation_spark.session import build_session
from data_reconciliation_spark.testgen import generate_pages
from data_reconciliation_spark.operators.blocking import candidate_pairs
from data_reconciliation_spark.operators.scoring import prepare_pages, score_pairs

spark = build_session(app_name=f"recon-fullprof-{cores}",
                      master=f"local[{cores}]",
                      shuffle_partitions=128,
                      extra_conf={
                          "spark.driver.extraJavaOptions": "-XX:+UseG1GC",
                          "spark.sql.execution.arrow.maxRecordsPerBatch": "50000",
                          "spark.sql.files.maxPartitionBytes": "8m",
                          "spark.sql.files.openCostInBytes": "1m",
                      })
spark.sparkContext.setLogLevel("ERROR")

pages = generate_pages(spark, n_rows=n_pages, n_entities=n_pages // 16,
                       n_hosts=max(50, n_pages // 32), partitions=128).persist()
pages.count()
cp = candidate_pairs(pages).withColumnsRenamed({"id_a": "url_a", "id_b": "url_b"})
prep = prepare_pages(pages)
pa = prep.select(F.col("url").alias("url_a"), F.col("canon_url").alias("canon_url_a"),
                 F.col("title").alias("title_a"), F.col("tok_hashes").alias("tok_hashes_a"),
                 F.col("simhash").alias("simhash_a"))
pb = prep.select(F.col("url").alias("url_b"), F.col("canon_url").alias("canon_url_b"),
                 F.col("title").alias("title_b"), F.col("tok_hashes").alias("tok_hashes_b"),
                 F.col("simhash").alias("simhash_b"))
import shutil, tempfile
pairs_path = tempfile.mkdtemp(prefix="recon_fullprof_") + "/pairs"
(cp.join(pa, "url_a").join(pb, "url_b")
   .repartition(128).write.mode("overwrite").parquet(pairs_path))
spark.catalog.clearCache()
_p1 = spark.read.parquet(pairs_path)
pairs = _p1
for _ in range(3):
    pairs = pairs.unionAll(_p1)
n_pairs = pairs.count()

passes = []
for i in range(7):
    c0 = _tree_cpu_split(); t0 = time.time()
    score_pairs(pairs).where("is_match").count()
    dt = time.time() - t0
    c1 = _tree_cpu_split()
    passes.append({"sec": round(dt, 2),
                   "jvm_cpu": round(c1[0] - c0[0], 1),
                   "py_cpu": round(c1[1] - c0[1], 1),
                   "busy": round((c1[0] + c1[1] - c0[0] - c0[1]) / (dt * cores), 3)})
print("RESULT " + json.dumps({"cores": cores, "pairs": n_pairs,
                              "passes": passes}), flush=True)
shutil.rmtree(os.path.dirname(pairs_path), ignore_errors=True)
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=50_000)
    ap.add_argument("--cores", default="8,32")
    ap.add_argument("--mem", default="48g")
    args = ap.parse_args()
    for cores in [int(c) for c in args.cores.split(",")]:
        env = dict(os.environ)
        env.setdefault("SPARK_DRIVER_MEMORY", args.mem)
        out = subprocess.run(
            ["taskset", "-c", f"0-{cores - 1}",
             sys.executable, "-c", _CHILD, str(cores), str(args.pages)],
            capture_output=True, text=True, env=env, check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                print(line[len("RESULT "):], flush=True)


if __name__ == "__main__":
    main()
