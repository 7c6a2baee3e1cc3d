"""spark-submit driver entry point.

Run the ER pipeline (or a snapshot reconciliation) on a cluster::

    spark-submit --py-files data_reconciliation_spark.zip \
        -m data_reconciliation_spark.main link \
        --input /warehouse/pages --output /warehouse/er_out \
        --checkpoint /warehouse/er_ckpt

    python -m data_reconciliation_spark.main reconcile \
        --old old.parquet --new new.parquet --pk id \
        --output /tmp/recon_out

The ``link`` job is resumable: re-running with the same ``--checkpoint``
directory continues the transitive-closure iteration from the last
committed round (north-rule resume semantics; see sources/state.py).
"""

from __future__ import annotations

import argparse
import json
import sys

from data_reconciliation_spark.config import BlockingConfig, ScoringConfig
from data_reconciliation_spark.operators.reconcile import reconcile
from data_reconciliation_spark.plans.pipeline import link
from data_reconciliation_spark.session import build_session
from data_reconciliation_spark.sources.state import AuditStore, CheckpointManager


def _cmd_link(args: argparse.Namespace) -> int:
    spark = build_session(app_name="recon-link")
    pages = spark.read.parquet(args.input)
    ckpt = CheckpointManager(spark, args.checkpoint) if args.checkpoint else None
    result = link(
        pages,
        BlockingConfig(max_block_size=args.max_block_size),
        ScoringConfig(),
        checkpoint=ckpt,
    )
    result.clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
    result.matches.write.mode("overwrite").parquet(f"{args.output}/matches")
    if args.write_pairs:
        result.scored_pairs.write.mode("overwrite").parquet(f"{args.output}/scored_pairs")
    n_clusters = result.clusters.select("entity").distinct().count()
    n_pages = result.clusters.count()
    result.release()
    print(json.dumps({"pages": n_pages, "entities": n_clusters}))
    spark.stop()
    return 0


def _cmd_reconcile(args: argparse.Namespace) -> int:
    spark = build_session(app_name="recon-compare")
    df_old = spark.read.parquet(args.old)
    df_new = spark.read.parquet(args.new)
    cfg = json.loads(args.config) if args.config else {}
    res = reconcile(df_old, df_new, args.pk.split(","), cfg)
    try:
        res.exceptions.write.mode("overwrite").parquet(f"{args.output}/exceptions")
        if args.audit:
            store = AuditStore(spark, args.audit)
            store.save_run(
                system_name=args.system or "default",
                match_rate=res.match_pct,
                exceptions=res.exceptions,
                primary_key_used=args.pk,
            )
    finally:
        # the flagged-join cache served both consumers; free it before
        # the (potentially long-lived) session moves on
        res.release()
    print(
        json.dumps(
            {
                "match_pct": res.match_pct,
                "n_both": res.n_both,
                "n_old_only": res.n_old_only,
                "n_new_only": res.n_new_only,
                "field_exceptions": res.field_exception_count,
            }
        )
    )
    spark.stop()
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="data_reconciliation_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    link_p = sub.add_parser("link", help="ER pipeline: blocking->scoring->clustering")
    link_p.add_argument("--input", required=True)
    link_p.add_argument("--output", required=True)
    link_p.add_argument("--checkpoint", default=None)
    link_p.add_argument("--max-block-size", type=int, default=500)
    link_p.add_argument("--write-pairs", action="store_true")
    link_p.set_defaults(fn=_cmd_link)

    rec_p = sub.add_parser("reconcile", help="two-snapshot comparison")
    rec_p.add_argument("--old", required=True)
    rec_p.add_argument("--new", required=True)
    rec_p.add_argument("--pk", required=True)
    rec_p.add_argument("--config", default=None, help="JSON field-rule config")
    rec_p.add_argument("--output", required=True)
    rec_p.add_argument("--audit", default=None, help="audit store root dir")
    rec_p.add_argument("--system", default=None)
    rec_p.set_defaults(fn=_cmd_reconcile)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
