"""Blocked fuzzy string matching — entity resolution without the
cartesian product.

A naive fuzzy join is ``levenshtein(l, r) <= d`` over the cross
product: quadratic, and the classic way an entity-resolution job dies
at scale.  Standard fix (record-linkage "blocking"): equi-join on a
cheap block key (string prefix or suffix), band on length (an edit
distance ≤ d bounds the length difference by d), and only then pay the
levenshtein on surviving candidates.  The equi-join is a hash join
(broadcastable when one side is dim-scale), so cost is
sum-of-block-sizes², not |L|×|R|.

Recall contract (documented, not silent): prefix blocking misses pairs
whose edits change the first ``block_len`` characters; suffix blocking
mirrors that at the end; ``block="both"`` unions the two candidate
sets (a pair must then keep its first OR last ``block_len`` characters
intact — still not exhaustive for d ≥ 1, but the standard
cost/recall trade).  For guaranteed recall on *substitution-only*
distance, use d+1 segment blocks (see ``simhash`` pigeonhole blocking
in operators/dedup.py:339 for that construction on hashes).

Reference analog: none — the reference (pipeline.py) has no join
surface at all; this is part of the engine's relational battery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _block_key(col, block: str, block_len: int):
    if block == "prefix":
        return F.substring(col, 1, block_len)
    if block == "suffix":
        return F.substring(col, -block_len, block_len)
    raise ValueError(f"unknown block strategy: {block!r}")


def fuzzy_string_pairs(left: DataFrame, right: DataFrame, *,
                       left_col: str, right_col: str,
                       max_distance: int = 2,
                       block: str = "prefix", block_len: int = 2,
                       lowercase: bool = True,
                       dedup_self_pairs: bool = False) -> DataFrame:
    """Pairs of values with ``levenshtein(left_col, right_col) <=
    max_distance``, found via blocked equi-join.

    Output: (left value, right value, distance) with the input column
    names preserved (plus ``distance``); duplicate values on either
    side are collapsed first — this matches VALUES, not rows.  Join the
    result back to either table to recover rows (cheap: the pair table
    is candidate-sized, the value column is its key).

    ``dedup_self_pairs=True`` is for self-matching (left is right):
    emits each unordered pair once (l < r) and drops the trivial
    diagonal.  ``block``: "prefix" | "suffix" | "both" (union of both
    candidate sets, deduped).
    """
    out_l = left_col if left_col != right_col else f"{left_col}_l"
    out_r = right_col if left_col != right_col else f"{right_col}_r"
    if block == "both":
        a = fuzzy_string_pairs(left, right, left_col=left_col,
                               right_col=right_col,
                               max_distance=max_distance, block="prefix",
                               block_len=block_len, lowercase=lowercase,
                               dedup_self_pairs=dedup_self_pairs)
        b = fuzzy_string_pairs(left, right, left_col=left_col,
                               right_col=right_col,
                               max_distance=max_distance, block="suffix",
                               block_len=block_len, lowercase=lowercase,
                               dedup_self_pairs=dedup_self_pairs)
        return a.unionByName(b).dropDuplicates([out_l, out_r])

    lval = F.col(left_col)
    rval = F.col(right_col)
    if lowercase:
        lval, rval = F.lower(lval), F.lower(rval)
    lv = left.select(lval.alias("_lval")).distinct() \
             .withColumn("_blk", _block_key(F.col("_lval"), block, block_len)) \
             .withColumn("_llen", F.length("_lval"))
    rv = right.select(rval.alias("_rval")).distinct() \
              .withColumn("_blk", _block_key(F.col("_rval"), block, block_len)) \
              .withColumn("_rlen", F.length("_rval"))
    cond = (lv["_blk"] == rv["_blk"]) & \
           (F.abs(lv["_llen"] - rv["_rlen"]) <= max_distance)
    if dedup_self_pairs:
        cond = cond & (lv["_lval"] < rv["_rval"])
    # thresholded levenshtein: the JVM impl early-exits (returns -1)
    # once the running distance exceeds the bound — O(d·len) not len²
    pairs = (lv.join(rv, cond)
               .withColumn("distance", F.levenshtein(
                   "_lval", "_rval", threshold=max_distance))
               .filter(F.col("distance") >= 0)
               .select(F.col("_lval").alias(out_l),
                       F.col("_rval").alias(out_r),
                       F.col("distance").cast("long").alias("distance")))
    return pairs
