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
    nodes = (e.select(F.col("s").alias("node"))
             .union(e.select(F.col("d").alias("node")))
             .distinct().localCheckpoint(eager=True))
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("s").agg(F.count("*").alias("deg"))
    withdeg = e.join(outdeg, "s").localCheckpoint(eager=True)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    converged = False
    for _ in range(max_iter):
        # one pass: total rank sitting on dangling nodes (no out-edges)
        dangling = (ranks.join(outdeg, ranks.node == outdeg.s, "left_anti")
                    .agg(F.sum("rank")).collect()[0][0]) or 0.0
        contrib = (withdeg.join(ranks, withdeg.s == ranks.node)
                   .groupBy("d")
                   .agg(F.sum(F.col("rank") / F.col("deg")).alias("c")))
        new = (nodes.join(contrib, nodes.node == contrib.d, "left")
               .select(F.col("node"),
                       (F.lit(base) + F.lit(damping) *
                        (F.coalesce("c", F.lit(0.0)) + F.lit(dangling / n))
                        ).alias("rank"))
               .localCheckpoint(eager=True))
        delta = (new.join(ranks.withColumnRenamed("rank", "_old"), "node")
                 .agg(F.sum(F.abs(F.col("rank") - F.col("_old"))))
                 .collect()[0][0]) or 0.0
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
    return ranks
