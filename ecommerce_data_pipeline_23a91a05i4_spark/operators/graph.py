"""Distributed connected components over an undirected edge list.

The missing half of near-dedup: pair generators (n-gram Jaccard t5,
MinHash-LSH t17, SimHash t18, winnowing t19) emit *pairwise* matches, but
a curation pipeline needs *clusters* — near-duplication is transitive in
practice (A~B, B~C → keep one of {A,B,C}), so the pairs must be closed
into components before electing one canonical survivor per group.  The
reference has no graph surface at all (SURVEY.md §2 — its dedup is
GROUP BY ... HAVING COUNT(*)>1, `sql/queries/data_quality_checks.sql:27-36`);
this operator is part of the LLM-data extension mandated by the north star.

Algorithm: min-label propagation with pointer jumping.  Every node starts
labeled with its own id; each round, a node's label becomes the min of
its own, its neighbors', and *its label's* label (the label-of-label
"pointer jump", which halves chain lengths like path compression in
union-find).  Neighbor propagation alone converges in O(diameter) rounds
— fine for dense near-dup clusters, pathological for chains; the jump
step brings it to O(log n) on any topology, the same bound the
large-star/small-star formulation achieves (Kiveris et al., "Connected
Components in MapReduce and Beyond", SOCC'14).  Each round is pure
shuffle-on-key work that scales horizontally.

Determinism: labels are mins over sets — independent of partitioning,
join order, and engine.  An exact serial oracle (recursive CTE) can
replay it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Return (node, component) for every node in `edges`, where
    `component` is the minimum node id reachable from `node`.

    Each iteration: one shuffle to aggregate neighbor minima + one
    broadcast-or-shuffle join back to labels, then an O(nodes) action to
    test convergence.  Lineage is truncated per round so the plan does
    not grow with the iteration count.

    checkpoint_dir selects the truncation durability: None (default)
    uses localCheckpoint — executor-memory blocks, fine on local[*] and
    fastest, but an executor loss mid-loop kills the job because the
    truncated lineage cannot be replayed.  On a real cluster pass an
    HDFS/S3 path: the loop then uses reliable checkpoint(), whose files
    survive executor loss and let Spark recompute from the last round.

    Lifecycle: setCheckpointDir is SparkContext-global, so a prior
    value is restored before returning — also when an iteration raises
    (try/finally).  One caveat Spark imposes: there is no unset API, so
    if no checkpoint dir existed before the call, ours remains set after
    it; later checkpoint() callers then write under our (job-scoped)
    path instead of crashing, which is the least-surprising leftover.
    Each round's checkpoint files stay under checkpoint_dir until the
    context is cleaned (spark.cleaner.referenceTracking.cleanCheckpoints
    =true) or the caller deletes the directory after consuming the
    result — point it at a job-scoped temp path, the standard discipline
    for iterative Spark algorithms.
    """
    spark = edges.sparkSession
    prior_dir = None
    if checkpoint_dir is not None:
        opt = spark.sparkContext._jsc.sc().getCheckpointDir()
        prior_dir = opt.get() if opt.isDefined() else None
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def snap(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    def iterate() -> DataFrame:
        sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        sym = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
        sym = snap(sym)

        labels = snap(
            sym.select(F.col("a").alias("node"))
            .distinct()
            .select("node", F.col("node").alias("component"))
        )

        for _ in range(max_iterations):
            nbr_min = (
                sym.join(labels, sym["b"] == labels["node"])
                .groupBy("a")
                .agg(F.min("component").alias("nbr_component"))
            )
            stepped = labels.join(
                nbr_min, labels["node"] == nbr_min["a"], "left"
            ).select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
            # Pointer jump: follow my label to ITS label.  A label is
            # always a node id, so the self-join resolves; this is what
            # turns long chains from O(diameter) into O(log n) rounds.
            parent = stepped.select(
                F.col("node").alias("pnode"), F.col("component").alias("pcomp")
            )
            new_labels = (
                stepped.join(parent, stepped["component"] == parent["pnode"], "left")
                .select(
                    "node",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("pcomp"), F.col("component")),
                    ).alias("component"),
                )
            )
            new_labels = snap(new_labels)
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.component") != F.col("o.component"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        return labels

    try:
        return iterate()
    finally:
        if checkpoint_dir is not None and prior_dir is not None:
            spark.sparkContext.setCheckpointDir(prior_dir)
