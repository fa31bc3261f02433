"""Iterative graph operators.

The corpus-curation uses: PageRank-style centrality over similarity /
link graphs (a classic web-corpus quality prior), on top of the
connected-components labeling in :mod:`.dedup`.  Same iterative-Spark
discipline as there: per-round ``localCheckpoint`` lineage truncation,
linear joins only, loud non-convergence.

Relation to the reference: ``wrangle_pypes`` has no graph surface;
this is [EXT] per SURVEY.md §2.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ("pagerank",)


def pagerank(edges: DataFrame, *, src_col: str = "src",
             dst_col: str = "dst", damping: float = 0.85,
             max_iter: int = 20, tol: float = 1e-6) -> DataFrame:
    """(node, rank) for every node of the directed edge list — standard
    damped PageRank with dangling-mass redistribution; ranks sum to 1.

    Per iteration: contributions flow along edges (one equi-join of the
    degree-annotated edge list against the current ranks + one
    dst-keyed aggregate — linear in |E|), dangling mass (nodes with no
    out-edges) is collected as ONE scalar and spread uniformly, and the
    L1 delta early-stops the loop at ``tol``.  Lineage is truncated
    every round with ``localCheckpoint`` — without it the plan doubles
    per round and the driver dies long before the data does.  Warns if
    ``max_iter`` rounds pass without convergence (ranks still returned,
    marked by the warning).

    Floating-point note: rank sums are reduction-order dependent, so
    results are deterministic only up to float addition order —
    verification is the replica test in ``tests/``, not a cross-engine
    hash (registered driver check is rows-only by design).
    """
    e = (edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
         .filter(F.col("s").isNotNull() & F.col("d").isNotNull())
         .distinct())
    outdeg = e.groupBy("s").agg(F.count("*").alias("deg"))
    # dangling (no out-edges) is a STATIC property — annotate it on the
    # node table once instead of an anti-join + collect every round
    nodes = (e.select(F.col("s").alias("node"))
             .union(e.select(F.col("d").alias("node")))
             .distinct()
             .join(outdeg.select(F.col("s").alias("node"),
                                 F.lit(True).alias("_has_out")),
                   "node", "left")
             .select("node", F.coalesce("_has_out", F.lit(False))
                     .alias("_has_out"))
             .localCheckpoint(eager=True))
    head = nodes.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(~F.col("_has_out"), 1).otherwise(0)).alias("nd")
    ).collect()[0]
    n = int(head["n"])
    if n == 0:
        return nodes.select("node").withColumn("rank", F.lit(0.0))
    withdeg = e.join(outdeg, "s").localCheckpoint(eager=True)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    # uniform start: dangling mass is exactly nd copies of 1/n
    dangling = int(head["nd"] or 0) * (1.0 / n)
    converged = False
    for _ in range(max_iter):
        contrib = (withdeg.join(ranks, withdeg.s == ranks.node)
                   .groupBy("d")
                   .agg(F.sum(F.col("rank") / F.col("deg")).alias("c")))
        new = (nodes.join(contrib, nodes.node == contrib.d, "left")
               .select(F.col("node"), F.col("_has_out"),
                       (F.lit(base) + F.lit(damping) *
                        (F.coalesce("c", F.lit(0.0)) + F.lit(dangling / n))
                        ).alias("rank"))
               .localCheckpoint(eager=False))
        # ONE action per round: the lazy checkpoint materializes under
        # this aggregate, which yields both the convergence delta and
        # the NEXT round's dangling mass (the 3-actions-per-round
        # formulation — dangling collect, eager checkpoint, delta
        # collect — paid 3 job launches per iteration)
        stats = (new.join(ranks.select("node",
                                       F.col("rank").alias("_old")),
                          "node")
                 .agg(F.sum(F.abs(F.col("rank") - F.col("_old")))
                      .alias("_delta"),
                      F.sum(F.when(~F.col("_has_out"), F.col("rank")))
                      .alias("_dangling"))
                 .collect()[0])
        delta = stats["_delta"] or 0.0
        dangling = stats["_dangling"] or 0.0
        ranks = new
        if delta < tol:
            converged = True
            break
    if not converged:
        import warnings
        warnings.warn(
            f"pagerank did not converge in max_iter={max_iter} rounds "
            f"(last L1 delta above tol={tol}); returning current ranks. "
            "Raise max_iter.", RuntimeWarning, stacklevel=2)
    return ranks.select("node", "rank")
