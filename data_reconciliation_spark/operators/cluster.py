"""Transitive clustering: connected components via alternating
large-star / small-star contraction (Kiveris et al., "Connected
Components in MapReduce and Beyond") expressed as pure DataFrame joins.

The reference has no clustering — its exceptions grouped per PK are
implicit pairwise verdicts (SURVEY.md §1.1); the engine makes entities
explicit by closing the match-pair graph transitively.

Design notes for 10^12-node scale:

* No ``collect_list`` — per-node neighborhood minima come from
  ``groupBy().min()`` + an equi-join, so a hot node (a URL matched by
  millions) never materializes its neighbor list in one task.
* O(log n) rounds for pathological chain graphs; real ER graphs
  (near-cliques) converge in 2-3 rounds.
* Each round ends in ``localCheckpoint`` (lineage cut — without it the
  plan doubles per iteration) and, when a checkpoint dir is given, a
  parquet snapshot + manifest so a killed job resumes mid-iteration
  (north rule).  See ``sources/state.py`` for the resume protocol.
* Convergence is detected by an exact changed-edge count
  (anti-join of consecutive edge sets), one cheap job per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_reconciliation_spark.sources.state import CheckpointManager


def _large_star(edges: DataFrame, dedup: bool = True) -> DataFrame:
    """Connect every neighbor larger than u to u's neighborhood minimum.

    ``dedup=False`` skips the trailing ``distinct`` — one shuffle less
    per round — valid when the consumer is ``_small_star``, whose
    groupBy-min absorbs duplicates and whose own ``distinct`` cleans the
    final edge set (the loop is latency-bound: fewer stages beats a
    slightly fatter intermediate).
    """
    und = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionAll(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    mins = und.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", F.col("u")).alias("m"))
    out = (
        und.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )
    return out.distinct() if dedup else out


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges large->small; connect all small neighbors (and the
    center) to the minimum."""
    orient = edges.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    )
    mins = orient.groupBy("u").agg(F.min("v").alias("m"))
    neighbor_edges = orient.join(mins, "u").select(
        F.col("v").alias("src"), F.col("m").alias("dst")
    )
    center_edges = mins.select(F.col("u").alias("src"), F.col("m").alias("dst"))
    return (
        neighbor_edges.unionAll(center_edges)
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """Return ``(node, component)`` where component = min node id of the
    connected component.  Nodes appearing in no edge are absent (caller
    unions isolated nodes; see pipeline.link).

    If ``checkpoint`` is given, every completed round persists the edge
    set; a re-run with the same manager resumes from the last completed
    round instead of iteration 0.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).where(
        F.col("src") != F.col("dst")
    ).distinct()

    start_iter = 0
    if checkpoint is not None:
        resumed = checkpoint.latest()
        if resumed is not None:
            start_iter, e = resumed

    def _checkpoint_with_fingerprint(df: DataFrame):
        # fold the convergence fingerprint into the (eager) checkpoint
        # materialization via observe(): one job per round instead of
        # two — the per-round cost of this latency-bound loop is job
        # count, not data volume (round-2 bench regression item)
        from pyspark.sql import Observation

        obs = Observation()
        out = df.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64("src", "dst").bitwiseAND(F.lit((1 << 47) - 1))
            ).alias("h"),
        ).localCheckpoint()
        got = obs.get
        return out, (got["n"], got["h"])

    # initial materialization folds the first fingerprint into the same
    # job (observe) — one job instead of checkpoint + separate agg
    e, fp_prev = _checkpoint_with_fingerprint(e)

    # The loop is LATENCY-bound once the edge set is small: each round
    # is one tiny job and the total cost is rounds x (stage scheduling
    # + AQE re-planning), not data.  Measured on the 100k-node chain
    # fixture (6 rounds, local[32]): AQE on + 32 shuffle partitions =
    # 12.6s; AQE off + 8 partitions = 6.7s; AQE off + 32 partitions =
    # 20.3s (task-launch overhead) — so BOTH knobs must move together.
    # The regime is chosen per round from the OBSERVED edge count of
    # the previous round: small edge sets get fixed small partitioning
    # with AQE off; large ones keep the session's AQE + partitioning
    # (data-bound regime, where AQE's coalescing/skew-splitting is the
    # right tool).  A shrinking closure naturally migrates from the
    # data-bound to the latency-bound regime as components contract.
    # Conf changes are session-scoped, hence saved/restored.
    # (Fusing two rounds per materialization was also measured — 19.1s
    # vs 14-15s unfused — Catalyst recomputes the first round's subtree
    # for each of the second round's consumers, so fusing loses.)
    spark = edges.sparkSession
    sess_parts = spark.conf.get("spark.sql.shuffle.partitions")
    sess_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    LATENCY_REGIME_EDGES = 2_000_000
    ROWS_PER_PARTITION = 12_000

    def _tune(n_edges: int) -> None:
        if n_edges < LATENCY_REGIME_EDGES:
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(max(4, min(int(sess_parts), n_edges // ROWS_PER_PARTITION + 1))),
            )
        else:
            spark.conf.set("spark.sql.adaptive.enabled", sess_aqe)
            spark.conf.set("spark.sql.shuffle.partitions", sess_parts)

    converged = False
    try:
        for it in range(start_iter, max_iter):
            _tune(fp_prev[0])
            new_e, fp_new = _checkpoint_with_fingerprint(
                _small_star(_large_star(e, dedup=False))
            )
            # convergence: cheap fingerprint gate, then an exact one-sided
            # exceptAll to CONFIRM equality (both sets are distinct, so
            # equal count + empty difference proves set equality).  The
            # exact check runs only at the candidate fixpoint.
            changed = 1
            if fp_new == fp_prev:
                changed = new_e.exceptAll(e).limit(1).count()
            if checkpoint is not None:
                checkpoint.save(it + 1, new_e)
            e, fp_prev = new_e, fp_new
            if changed == 0:
                converged = True
                break
        if not converged:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds"
            )

        # stars: (v -> m) edges + centers' self-labels.  The explicit
        # repartition pins the final aggregation's single shuffle to the
        # regime-appropriate partition count even though it executes
        # after the session conf is restored (hash partitioning on
        # `node` satisfies the groupBy's clustering requirement, so no
        # second exchange is added).
        n_final = fp_prev[0]
        if n_final < LATENCY_REGIME_EDGES:
            parts = max(4, min(int(sess_parts), n_final // ROWS_PER_PARTITION + 1))
        else:
            parts = int(sess_parts)
        labels = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
        centers = e.select(F.col("dst").alias("node"), F.col("dst").alias("component"))
        return (
            labels.unionAll(centers)
            .repartition(parts, "node")
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", sess_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", sess_parts)
