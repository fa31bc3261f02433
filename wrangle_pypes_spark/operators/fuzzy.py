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

Recall contract (closed form, pinned EXHAUSTIVELY in
tests/test_fuzzy_normalize.py): a pair (x, y) within the distance and
length band is returned iff both are non-empty and their first
(prefix) / last (suffix) ``min(|x|, |y|, block_len)`` characters
agree; ``block="both"`` unions the two candidate sets.  Still not
exhaustive for d ≥ 1 — an edit inside the blocked region hides the
pair — but the standard cost/recall trade, and now uniform across
lengths: strings SHORTER than ``block_len`` use their whole value as
the block key, and longer strings additionally emit length-banded
truncated keys that may only meet such short-string keys (never each
other), so pairs like ``('a', 'ab')`` at distance 1 are found without
collapsing long strings into short-prefix mega-blocks.  For
guaranteed recall on *substitution-only* distance, use d+1 segment
blocks (see ``simhash`` pigeonhole blocking in operators/dedup.py:339
for that construction on hashes).

Reference analog: none — the reference (pipeline.py) has no join
surface at all; this is part of the engine's relational battery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _block_keys(col, block: str, block_len: int, max_distance: int):
    """Array of ``(k, nat)`` block-key structs for one value.

    The NATURAL key (``nat=true``) is the prefix/suffix of length
    ``min(len, block_len)`` — plain blocking.  SUPPLEMENTAL keys
    (``nat=false``; lengths ``k0-max_distance .. k0-1``) exist only so
    longer strings can meet the natural key of a string shorter than
    ``block_len`` (whose whole value IS its key): the join condition
    requires at least one side natural, so supplemental keys never
    pair two long strings through a short shared prefix — block sizes
    stay at the ``block_len`` granularity except where a genuinely
    short string is involved, and the length band bounds the extra
    keys at ``max_distance`` per value.
    """
    if block == "prefix":
        def cut(L):
            return col.substr(F.lit(1), L)
    elif block == "suffix":
        def cut(L):
            return col.substr(F.length(col) - L + F.lit(1), L)
    else:
        raise ValueError(f"unknown block strategy: {block!r}")
    k0 = F.least(F.length(col), F.lit(block_len))
    lo = F.greatest(F.lit(1), k0 - F.lit(max_distance))
    keys = F.transform(F.sequence(lo, k0),
                       lambda L: F.struct(cut(L).alias("k"),
                                          (L == k0).alias("nat")))
    # empty strings block-match nothing (and sequence(1, 0) would
    # generate a DESCENDING range); NULL arrays are dropped by explode
    return F.when(F.length(col) > 0, keys)


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
    lv = (left.select(lval.alias("_lval")).distinct()
          .withColumn("_llen", F.length("_lval"))
          .select("_lval", "_llen",
                  F.explode(_block_keys(F.col("_lval"), block, block_len,
                                        max_distance)).alias("_lk"))
          .select("_lval", "_llen", F.col("_lk.k").alias("_lblk"),
                  F.col("_lk.nat").alias("_lnat")))
    rv = (right.select(rval.alias("_rval")).distinct()
          .withColumn("_rlen", F.length("_rval"))
          .select("_rval", "_rlen",
                  F.explode(_block_keys(F.col("_rval"), block, block_len,
                                        max_distance)).alias("_rk"))
          .select("_rval", "_rlen", F.col("_rk.k").alias("_rblk"),
                  F.col("_rk.nat").alias("_rnat")))
    # equi-join on the key (hash join); supplemental×supplemental
    # excluded so truncated keys only ever meet short-string naturals
    cond = (lv["_lblk"] == rv["_rblk"]) & \
           (lv["_lnat"] | rv["_rnat"]) & \
           (F.abs(lv["_llen"] - rv["_rlen"]) <= max_distance)
    if dedup_self_pairs:
        cond = cond & (lv["_lval"] < rv["_rval"])
    # thresholded levenshtein: the JVM impl early-exits (returns -1)
    # once the running distance exceeds the bound — O(d·len) not len²
    pairs = (lv.join(rv, cond)
               .dropDuplicates(["_lval", "_rval"])
               .withColumn("distance", F.levenshtein(
                   "_lval", "_rval", threshold=max_distance))
               .filter(F.col("distance") >= 0)
               .select(F.col("_lval").alias(out_l),
                       F.col("_rval").alias(out_r),
                       F.col("distance").cast("long").alias("distance")))
    return pairs
