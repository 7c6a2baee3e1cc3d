"""Probe link()'s e2e fixed-cost under config variants.

Runs the bench_scaling e2e leg (same corpus: pages//16 entities,
n_hosts=pages//32, partitions=128, shuffle_partitions=128) at one core
count with 2 warmups + N measured passes, under a named variant:

  base      — session config as the harness e2e child
  no-aqe    — adaptive execution off (fewer per-stage jobs; static plans)
  shj       — prefer shuffled-hash joins, broadcast threshold 8m
              (payload joins stop broadcasting 30+ MB relations built
              single-threaded on the driver)
  no-aqe-shj— both

Usage: taskset -c 0-15 python tools/e2e_variant_probe.py --cores 16 --variant no-aqe
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=100_000)
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--variant", default="base",
                    choices=["base", "no-aqe", "shj", "no-aqe-shj"])
    ap.add_argument("--measured", type=int, default=3)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    from data_reconciliation_spark.plans.pipeline import link
    from data_reconciliation_spark.session import build_session
    from data_reconciliation_spark.testgen import generate_pages

    conf = {
        "spark.driver.extraJavaOptions":
            "-XX:+UseG1GC -Xms32g -XX:+AlwaysPreTouch -XX:G1HeapRegionSize=32m",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "50000",
    }
    if args.variant in ("no-aqe", "no-aqe-shj"):
        conf["spark.sql.adaptive.enabled"] = "false"
    if args.variant in ("shj", "no-aqe-shj"):
        conf["spark.sql.join.preferSortMergeJoin"] = "false"
        conf["spark.sql.autoBroadcastJoinThreshold"] = "8m"

    spark = build_session(
        app_name=f"e2e-probe-{args.variant}-{args.cores}",
        master=f"local[{args.cores}]",
        shuffle_partitions=128,
        extra_conf=conf,
    )
    spark.sparkContext.setLogLevel("ERROR")

    pages = generate_pages(
        spark, n_rows=args.pages, n_entities=args.pages // 16,
        n_hosts=max(50, args.pages // 32), partitions=128
    ).persist()
    pages.count()

    input_rdd_ids = set()
    jmap0 = spark.sparkContext._jsc.getPersistentRDDs()
    for k in jmap0.keySet().toArray():
        input_rdd_ids.add(int(str(k)))

    def _drop_noninput_rdds():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for k in jmap.keySet().toArray():
            if int(str(k)) not in input_rdd_ids:
                jmap.get(k).unpersist()
        spark.sparkContext._jvm.System.gc()

    CLK = os.sysconf("SC_CLK_TCK")
    MACHINE = os.cpu_count() or 32

    def _steal():
        with open("/proc/stat") as f:
            return int(f.readline().split()[8]) / CLK

    out = []
    for p in range(2 + args.measured):
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
        s0, t0 = _steal(), time.time()
        res = link(pages)
        n_pairs = res.scored_pairs.count()
        res.clusters.count()
        el = time.time() - t0
        res.release()
        _drop_noninput_rdds()
        sf = round((_steal() - s0) / (el * MACHINE), 4)
        rec = {"pass": p, "sec": round(el, 2), "steal": sf, "warm": p < 2}
        out.append(rec)
        print(json.dumps(rec), flush=True)
    meas = [r["sec"] for r in out if not r["warm"]]
    print(f"RESULT {args.variant} cores={args.cores} pairs={n_pairs} "
          f"min={min(meas)} med={sorted(meas)[len(meas)//2]}")
    spark.stop()


if __name__ == "__main__":
    main()
