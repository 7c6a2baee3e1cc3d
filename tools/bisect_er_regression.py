"""Adjudicate the round-6 er_pipeline regression (6.98s -> ~10.7s clean).

Replicates bench.py's ER leg exactly (same generate_pages args, same
3-pass protocol, report 3rd pass) under controlled variants:

  base      — tree as committed
  no-obs    — the two pair_fanout CollectMetrics nodes removed
              (DataFrame.observe patched to identity inside
              block_score_pipeline only)
  dist-ent  — base + closure entry distinct() restored
              (assume_distinct=False), isolating the round-6
              assume_distinct change

Usage: python tools/bisect_er_regression.py [--pages 20000] [--variant base|no-obs|dist-ent]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=20_000)
    ap.add_argument("--variant", default="base",
                    choices=["base", "no-obs", "dist-ent"])
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--dump-jobs", action="store_true")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    from data_reconciliation_spark.plans import pipeline as pl
    from data_reconciliation_spark.session import build_session
    from data_reconciliation_spark.testgen import generate_pages

    spark = build_session(
        app_name=f"bisect-er-{args.variant}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "50000"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    if args.variant == "no-obs":
        # kill ONLY the telemetry observes: patch scoring's Observation
        # so observe() is never called
        from data_reconciliation_spark.operators import scoring as sc

        class _NullObsPair:
            pass

        _orig = sc.block_score_pipeline

        def patched(pages, blocking_cfg=None, scoring_cfg=None):
            from pyspark.sql import DataFrame as _DF
            orig_observe = _DF.observe
            _DF.observe = lambda self, *a, **k: self
            try:
                return _orig(pages, blocking_cfg, scoring_cfg)
            finally:
                _DF.observe = orig_observe

        pl.block_score_pipeline = patched
        sc_mod = sys.modules["data_reconciliation_spark.plans.pipeline"]
        sc_mod.block_score_pipeline = patched

    if args.variant == "dist-ent":
        _orig_cc = pl.connected_components

        def cc_patched(*a, **k):
            k["assume_distinct"] = False
            return _orig_cc(*a, **k)

        pl.connected_components = cc_patched

    pages = generate_pages(
        spark, n_rows=args.pages, n_entities=args.pages // 4,
        partitions=max(cpus * 2, 16)
    ).persist()
    pages.count()

    def _jobs_snapshot():
        store = spark.sparkContext._jsc.sc().statusStore()
        seq = store.jobsList(None)
        out = []
        for i in range(seq.size()):
            jd = seq.apply(i)
            sub, comp = jd.submissionTime(), jd.completionTime()
            out.append({
                "id": jd.jobId(), "name": jd.name(),
                "submit": sub.get().getTime() if sub.isDefined() else None,
                "complete": comp.get().getTime() if comp.isDefined() else None,
                "tasks": jd.numTasks(),
            })
        out.sort(key=lambda j: j["id"])
        return out

    results = []
    for p in range(args.passes):
        last = (p == args.passes - 1)
        if last:
            before = _jobs_snapshot()
            last_id = before[-1]["id"] if before else -1
        t0 = time.time()
        res = pl.link(pages)
        n_pairs = res.scored_pairs.count()
        scoring_sec = time.time() - t0
        t1 = time.time()
        res.clusters.count()
        labels_sec = time.time() - t1
        res.release()
        results.append((round(scoring_sec, 3), round(labels_sec, 3)))
        print(f"[{args.variant}] pass {p}: er_pipeline={scoring_sec:.3f}s "
              f"labels={labels_sec:.3f}s pairs={n_pairs}", flush=True)
        if last and args.dump_jobs:
            t_end = time.time()
            jobs = [j for j in _jobs_snapshot()
                    if j["id"] > last_id and j["submit"]]
            wall0, prev_end = t0 * 1000, t0 * 1000
            print(f"{'job':>4} {'start+s':>8} {'dur_s':>7} {'gap_s':>7} "
                  f"{'tasks':>6}  name")
            for j in jobs:
                dur = ((j["complete"] or t_end * 1000) - j["submit"]) / 1000
                gap = max(0.0, (j["submit"] - prev_end) / 1000)
                prev_end = max(prev_end, j["complete"] or t_end * 1000)
                print(f"{j['id']:>4} {(j['submit'] - wall0) / 1000:>8.2f} "
                      f"{dur:>7.2f} {gap:>7.2f} {j['tasks']:>6}  "
                      f"{j['name'][:90]}", flush=True)
    best = min(r[0] for r in results[1:]) if len(results) > 1 else results[0][0]
    print(f"RESULT {args.variant}: last={results[-1][0]} best_warm={best}")
    spark.stop()


if __name__ == "__main__":
    main()
