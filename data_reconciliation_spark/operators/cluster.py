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


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to u's neighborhood minimum."""
    und = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionAll(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    mins = und.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", F.col("u")).alias("m"))
    return (
        und.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


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

    def _fingerprint(df: DataFrame):
        # cheap order-insensitive digest: (count, sum of 47-bit-masked
        # xxhash64) — mask keeps the ANSI-mode sum far from overflow.
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64("src", "dst").bitwiseAND(F.lit((1 << 47) - 1))
            ).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

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

    e = e.localCheckpoint()
    fp_prev = _fingerprint(e)
    for it in range(start_iter, max_iter):
        new_e, fp_new = _checkpoint_with_fingerprint(
            _small_star(_large_star(e))
        )
        # convergence: cheap fingerprint gate, then an exact one-sided
        # exceptAll to CONFIRM equality (both sets are distinct, so equal
        # count + empty difference proves set equality).  The exact check
        # runs only at the candidate fixpoint, not every round.
        changed = 1
        if fp_new == fp_prev:
            changed = new_e.exceptAll(e).limit(1).count()
        if checkpoint is not None:
            checkpoint.save(it + 1, new_e)
        e, fp_prev = new_e, fp_new
        if changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")

    # stars: (v -> m) edges + centers' self-labels
    labels = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    centers = e.select(F.col("dst").alias("node"), F.col("dst").alias("component"))
    return labels.unionAll(centers).groupBy("node").agg(
        F.min("component").alias("component")
    )
