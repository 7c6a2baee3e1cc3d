"""Two-parallelism scaling benchmark (north-rule evidence).

No real multi-executor cluster exists in this sandbox, so per the driver
instruction the two-cluster-size criterion is evidenced by running the
SAME job on the SAME input at two parallelism levels (default local[8]
vs local[32]) and reporting candidate-pairs-scored/sec at both plus the
scaling efficiency r_4N / (4 * r_N).

Each configuration runs in its own subprocess (fresh JVM) and reports
the steady-state (second-pass) throughput; results land in
``BENCH/BASELINE.md`` and ``BENCH/scaling.json``.

Usage: python bench_scaling.py [--pages 20000] [--low 8] [--high 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_CHILD_CODE = r"""
import json, sys, time
cores = int(sys.argv[1]); n_pages = int(sys.argv[2])
from pyspark.storagelevel import StorageLevel
from pyspark.sql import functions as F
from data_reconciliation_spark.session import build_session
from data_reconciliation_spark.testgen import generate_pages
from data_reconciliation_spark.operators.blocking import candidate_pairs
from data_reconciliation_spark.operators.scoring import prepare_pages, score_pairs

# shuffle partition count held CONSTANT across configs so both runs
# execute the identical physical plan shape — the only variable is cores.
spark = build_session(app_name=f"recon-scaling-{cores}",
                      master=f"local[{cores}]",
                      shuffle_partitions=128,
                      extra_conf={
                          # flat GC pauses at 32 concurrent tasks; the
                          # timed stage must measure compute, not GC
                          "spark.driver.extraJavaOptions": "-XX:+UseG1GC",
                          # the cached pair table fits in RAM at 48g:
                          # skip columnar compression so cache scans
                          # spend cores on scoring, not decompression
                          "spark.sql.inMemoryColumnarStorage.compressed": "false",
                      })
spark.sparkContext.setLogLevel("ERROR")

# --- untimed setup: materialize the candidate-pair table ------------------
# identical deterministic input regardless of parallelism (generator is
# hash-derived from row ids; partition count does not change the data).
# 16 page-variants per entity => dense true-pair candidates, so the timed
# stage exercises the full scoring cascade incl. the Arrow UDF.
pages = generate_pages(spark, n_rows=n_pages, n_entities=n_pages // 16,
                       partitions=128).persist()
pages.count()
cp = candidate_pairs(pages).withColumnsRenamed({"id_a": "url_a", "id_b": "url_b"})
prep = prepare_pages(pages)
pa = prep.select(F.col("url").alias("url_a"), F.col("canon_url").alias("canon_url_a"),
                 F.col("norm_text").alias("norm_text_a"), F.col("simhash").alias("simhash_a"))
pb = prep.select(F.col("url").alias("url_b"), F.col("canon_url").alias("canon_url_b"),
                 F.col("norm_text").alias("norm_text_b"), F.col("simhash").alias("simhash_b"))
pairs = (cp.join(pa, "url_a").join(pb, "url_b")
           .repartition(512)
           .persist(StorageLevel.MEMORY_AND_DISK))
n_pairs = pairs.count()

# --- timed: score every candidate pair.  Pass 0 is warmup (codegen
# compilation + Python-worker spawn); passes 1..3 are steady-state
# samples and the reported number is their MEDIAN (n>=3 evidence
# without paying the multi-minute blocking setup three times over).
samples = []
n_matches = 0
for attempt in range(4):
    t0 = time.time()
    n_matches = score_pairs(pairs).where("is_match").count()
    elapsed = time.time() - t0
    if attempt > 0:
        samples.append(elapsed)
in_order = [round(n_pairs / s, 1) for s in samples]  # pass order preserved
med = sorted(samples)[len(samples) // 2]
result = {"cores": cores, "pages": n_pages, "pairs": n_pairs,
          "matches": n_matches, "seconds": round(med, 2),
          "pairs_per_sec": round(n_pairs / med, 1),
          "all_pairs_per_sec": in_order}
print("RESULT " + json.dumps(result))
spark.stop()
"""


def run_config(cores: int, pages: int, mem: str) -> dict:
    env = dict(os.environ)
    # the benchmark JVM must not be memory-starved: with the default 8g
    # the persisted pair table spills to disk and the timed stage
    # measures disk reads + GC, which do NOT scale with cores.  The
    # cached working set fits comfortably; G1 keeps pause times flat at
    # 32 concurrent tasks.
    env.setdefault("SPARK_DRIVER_MEMORY", mem)
    # CPU-pin the whole process tree (JVM + Python workers) to exactly
    # `cores` cores: an N-core cluster executor runs its Python workers
    # INSIDE its N cores, but un-pinned local[N] on a bigger box lets
    # the workers spill onto spare cores — inflating the low-parallelism
    # leg and underestimating scaling efficiency.
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}",
         sys.executable, "-c", _CHILD_CODE, str(cores), str(pages)],
        capture_output=True,
        text=True,
        env=env,
        check=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line; stderr tail: {out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=150_000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--mem", default="48g")
    args = ap.parse_args()

    lo = run_config(args.low, args.pages, args.mem)
    hi = run_config(args.high, args.pages, args.mem)
    ratio = args.high / args.low
    eff = round(hi["pairs_per_sec"] / (ratio * lo["pairs_per_sec"]), 3)

    os.makedirs("BENCH", exist_ok=True)
    payload = {"low": lo, "high": hi, "parallelism_ratio": ratio,
               "scaling_efficiency": eff,
               "samples_per_config": 3}
    with open("BENCH/scaling.json", "w") as f:
        json.dump(payload, f, indent=2)

    md = f"""# BENCH/BASELINE — throughput & scaling evidence

North-rule scaling criterion (two cluster sizes, N and 4N executors)
evidenced per driver instruction by the same job on the same input at two
parallelism levels in this sandbox (no real cluster available).

Timed job: the candidate-pair SCORING stage — the cascade of native
token-Jaccard (array_intersect) + SimHash Hamming (bit_count/xor) on
every pair plus the Arrow-batched Jaro-Winkler/indel-ratio UDF on
prefilter survivors — over a pre-materialized candidate-pair table, i.e.
exactly the "candidate-pairs-scored/sec" quantity the target names.
Blocking/materialization is untimed setup (at warehouse scale the
candidate table is a written intermediate).  Input: deterministic
synthetic pages (hash-derived from row ids — byte-identical at any
parallelism), {args.pages} pages, 16 variants per entity, ~20% of
entities on one hot host.  Steady-state (2nd pass) timing in a fresh JVM
per configuration; shuffle partitioning held constant (128) so the only
variable is cores.  Each configuration reports the MEDIAN of 3
steady-state passes after an untimed warmup pass (per-pass pairs/sec
listed below the table).

| config | pages | candidate pairs scored | match verdicts | seconds | pairs/sec |
|---|---|---|---|---|---|
| local[{args.low}]  (N)  | {lo['pages']} | {lo['pairs']} | {lo['matches']} | {lo['seconds']} | {lo['pairs_per_sec']} |
| local[{args.high}] (4N) | {hi['pages']} | {hi['pairs']} | {hi['matches']} | {hi['seconds']} | {hi['pairs_per_sec']} |

Per-run pairs/sec: N = {lo['all_pairs_per_sec']}, 4N = {hi['all_pairs_per_sec']}.

**Scaling efficiency** = r_4N / (4 x r_N) = **{eff}** (target >= 0.8).

Reference baseline: the reference publishes no throughput numbers
(single-threaded per-row pandas loops, see BASELINE.md); its core is
O(rows x fields) interpreted Python on one core, so any distributed
steady-state number above dominates it architecturally.
"""
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
