"""Sampling / mixing / packing operators for training-data pipelines.

Everything here is DETERMINISTIC — re-running a pipeline over the same
corpus yields byte-identical samples (hash-based membership, never RNG
state), which is what makes 100 TB runs resumable and auditable.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _membership_cond(key_col: str, seed: int, fraction: float,
                     hash_scheme: str) -> Column:
    """Deterministic keep-this-key predicate for ``fraction`` of keys.

    Two hash schemes, same contract (pure function of (seed, key)):

    * ``"xxhash64"`` — Spark's JVM xxhash64 into 1e6 buckets: fastest,
      but engine-private (no DuckDB/portable twin), so downstream
      oracle checks are rows-only.
    * ``"md5"`` — the :func:`_md5_unit_key` hex prefix compared against
      a precomputed hex bound: bit-identical in any engine with md5
      (Spark, DuckDB, a bash pipeline), which upgrades correctness
      checks to value-level; ~2× the hash cost of xxhash64, still
      map-only.
    """
    if fraction >= 1.0:
        return F.lit(True)
    if fraction <= 0.0:
        return F.lit(False)
    if hash_scheme == "xxhash64":
        bucket = F.pmod(F.xxhash64(F.lit(seed), F.col(key_col)),
                        F.lit(1_000_000))
        return bucket < int(fraction * 1_000_000)
    if hash_scheme == "md5":
        bound = format(min(int(fraction * 16**8), 16**8 - 1), "08x")
        return _md5_unit_key(key_col, seed) < F.lit(bound)
    raise ValueError(f"unknown hash_scheme {hash_scheme!r} "
                     "(expected 'xxhash64' or 'md5')")


def deterministic_sample(df: DataFrame, key_col: str, fraction: float, *,
                         seed: int = 42,
                         hash_scheme: str = "xxhash64") -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — stable across
    runs, partitionings, and cluster sizes (unlike ``df.sample``, whose
    output depends on partition layout).  Same key ⇒ same decision, so
    joins between two tables sampled on the same key stay consistent.
    ``hash_scheme="md5"`` makes membership engine-portable (see
    :func:`_membership_cond`).
    """
    if not (0.0 <= fraction <= 1.0):
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(_membership_cond(key_col, seed, fraction, hash_scheme))


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: Mapping, key_col: str, *,
                      seed: int = 42,
                      hash_scheme: str = "xxhash64") -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample by language:
    ``{"en": 0.1, "de": 1.0}``).  Unlisted strata are dropped — the
    data-mixing primitive for corpus re-weighting.

    The key hash depends only on (seed, key), so it is HOISTED out of
    the per-stratum disjunction and compared against a per-stratum
    threshold (one CASE): one hash per row instead of one per listed
    stratum (the r15 rewrite — the old OR-of-k-predicates shape hashed
    the key up to k times per dropped row and built k expression trees
    over py4j).  Decisions are bit-identical: same draw, same bounds.
    A NULL threshold (unlisted stratum, NULL strata) compares NULL and
    the filter drops the row, exactly like the old disjunction."""
    full = [s for s, f in fractions.items() if float(f) >= 1.0]
    hashed = {s: float(f) for s, f in fractions.items()
              if 0.0 < float(f) < 1.0}
    cond = F.col(strata_col).isin(full) if full else F.lit(False)
    if hashed:
        if hash_scheme == "xxhash64":
            u: Column = F.pmod(F.xxhash64(F.lit(seed), F.col(key_col)),
                               F.lit(1_000_000))

            def bnd(f: float) -> Column:
                return F.lit(int(f * 1_000_000))
        elif hash_scheme == "md5":
            u = _md5_unit_key(key_col, seed)

            def bnd(f: float) -> Column:
                return F.lit(format(min(int(f * 16**8), 16**8 - 1),
                                    "08x"))
        else:
            raise ValueError(f"unknown hash_scheme {hash_scheme!r} "
                             "(expected 'xxhash64' or 'md5')")
        bound = None
        for s, f in hashed.items():
            arm = F.col(strata_col) == F.lit(s)
            bound = (F.when(arm, bnd(f)) if bound is None
                     else bound.when(arm, bnd(f)))
        cond = cond | (u < bound)
    return df.filter(cond)


def mix_plan(df: DataFrame, *, source_col: str, token_col: str,
             weights: Mapping[str, float],
             token_budget: float) -> dict[str, dict[str, float]]:
    """Compute per-source sampling rates for a token-budget corpus mix.

    Given relative ``weights`` (e.g. ``{"web": 0.6, "code": 0.3,
    "books": 0.1}``) and a total ``token_budget``, each source's token
    target is ``budget * w / sum(w)`` and its keep-rate is
    ``min(1, target / available)``.  Rates are capped at 1 — a source
    short of its quota keeps everything and the mix under-delivers on
    that source rather than duplicating documents (upsampling is an
    epoch-level training decision, not a corpus op).

    Cost at scale: ONE partial-aggregated groupBy over the corpus
    collecting k rows (k = #sources) to the driver — the only
    driver-side state is the k-entry plan dict.  Sources absent from
    ``weights`` get rate 0 (dropped).
    """
    if token_budget <= 0:
        raise ValueError("token_budget must be positive")
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    avail = {r["src"]: float(r["tok"] or 0.0) for r in
             (df.groupBy(F.col(source_col).alias("src"))
              .agg(F.sum(token_col).alias("tok")).collect())}
    plan: dict[str, dict[str, float]] = {}
    for src, w in weights.items():
        target = token_budget * float(w) / total_w
        a = avail.get(src, 0.0)
        rate = 0.0 if a <= 0 else min(1.0, target / a)
        plan[src] = {"available": a, "target": target, "rate": rate}
    return plan


def mix_corpus(df: DataFrame, *, source_col: str, token_col: str,
               key_col: str, weights: Mapping[str, float],
               token_budget: float, seed: int = 42,
               hash_scheme: str = "xxhash64") -> DataFrame:
    """Token-budget corpus mixing (Pile-style static domain weights):
    deterministically sample each source so the combined output is
    ~``token_budget`` tokens at the requested mixture proportions.

    Two jobs total: the :func:`mix_plan` aggregate, then one map-only
    hash filter (same membership scheme as :func:`deterministic_sample`
    — stable across runs, partitionings, and cluster sizes, so a 100 TB
    mix is resumable and auditable).  Expected tokens per kept source =
    rate × available; variance is that of Bernoulli document sampling.
    """
    plan = mix_plan(df, source_col=source_col, token_col=token_col,
                    weights=weights, token_budget=token_budget)
    return stratified_sample(
        df, source_col, {s: p["rate"] for s, p in plan.items()},
        key_col, seed=seed, hash_scheme=hash_scheme)


def temperature_mix_plan(df: DataFrame, *, source_col: str,
                         token_col: str, alpha: float,
                         token_budget: float,
                         sources: Optional[Sequence[str]] = None
                         ) -> dict[str, dict[str, float]]:
    """Temperature-based mixture rates: source ``i`` gets a token share
    proportional to ``n_i**alpha`` (the multilingual-sampling scheme of
    the public mBERT/XLM-R recipes — ``alpha=1`` keeps natural
    proportions, ``alpha=0`` gives uniform, between up-weights the
    tail), capped at keep-everything.

    Like :func:`mix_plan`: ONE partial-aggregated groupBy collecting k
    source totals to the driver; the returned plan dict is the only
    driver state.  ``sources`` restricts (and orders) the mix —
    accumulation over sources runs in SORTED-name order with
    ``math.sqrt`` for ``alpha=0.5``, so an external engine can
    reproduce the float arithmetic bit-for-bit (``pow`` is not
    correctly-rounded across libms; ``sqrt`` is).
    """
    import math

    if token_budget <= 0:
        raise ValueError("token_budget must be positive")
    avail = {r["src"]: float(r["tok"] or 0.0) for r in
             (df.groupBy(F.col(source_col).alias("src"))
              .agg(F.sum(token_col).alias("tok")).collect())}
    # a NULL source key can't be part of a named mix (and would make
    # sorted() raise None-vs-str); drop it here — the membership filter
    # never keeps NULL-source rows anyway
    avail.pop(None, None)
    srcs = sorted(sources) if sources is not None else sorted(avail)
    powed = {}
    for s in srcs:
        a = avail.get(s, 0.0)
        powed[s] = (math.sqrt(a) if alpha == 0.5 else a ** alpha) \
            if a > 0 else 0.0
    denom = 0.0
    for s in srcs:  # explicit sorted-order accumulation (see docstring)
        denom += powed[s]
    plan: dict[str, dict[str, float]] = {}
    for s in srcs:
        a = avail.get(s, 0.0)
        rate = 0.0 if (a <= 0 or denom <= 0) else min(
            1.0, token_budget * powed[s] / denom / a)
        plan[s] = {"available": a, "target_share": powed[s],
                   "rate": rate}
    return plan


def temperature_mix(df: DataFrame, *, source_col: str, token_col: str,
                    key_col: str, alpha: float, token_budget: float,
                    sources: Optional[Sequence[str]] = None,
                    seed: int = 42,
                    hash_scheme: str = "xxhash64") -> DataFrame:
    """Temperature-weighted corpus mixing: sample each source at the
    :func:`temperature_mix_plan` rate via deterministic hash membership
    — two jobs total (one k-row aggregate, one map-only filter), same
    scale shape as :func:`mix_corpus` but with rates derived from
    ``n_i**alpha`` instead of fixed weights.  ``hash_scheme="md5"``
    makes the kept set engine-portable for value-level verification.
    """
    plan = temperature_mix_plan(df, source_col=source_col,
                                token_col=token_col, alpha=alpha,
                                token_budget=token_budget,
                                sources=sources)
    return stratified_sample(
        df, source_col, {s: p["rate"] for s, p in plan.items()},
        key_col, seed=seed, hash_scheme=hash_scheme)


def pack_sequences(df: DataFrame, *, token_col: str, max_tokens: int,
                   order_col: str,
                   partition_col: Optional[str] = None) -> DataFrame:
    """Assign a ``pack_id`` grouping consecutive documents into
    ~``max_tokens`` context windows (sequence packing for training).

    Formulation: deterministic order -> running token total -> pack =
    floor((cumsum - tokens) / max_tokens), i.e. a document starts a new
    pack when the budget is already full.  One window pass, one shuffle;
    a document longer than the remaining budget overflows its pack by
    at most itself (the standard streaming-packing approximation —
    exact bin packing needs a sequential reset, which does not
    parallelize).
    """
    parts = [partition_col] if partition_col else []
    w = (Window.partitionBy(*parts).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = F.sum(token_col).over(w)
    pack = F.floor((cum - F.col(token_col)) / F.lit(max_tokens))
    return df.withColumn("pack_id", pack.cast("long"))


def histogram(df: DataFrame, col: str, *, lo: float, hi: float,
              nbins: int) -> DataFrame:
    """Fixed-width histogram: (bin, lo, hi, n).  Explicit bounds (no
    extra min/max pass); out-of-range rows clamp to the edge bins."""
    w = (hi - lo) / nbins
    bin_ = F.least(F.greatest(F.floor((F.col(col) - F.lit(lo)) / F.lit(w)),
                              F.lit(0)), F.lit(nbins - 1)).cast("long")
    return (df.withColumn("bin", bin_)
            .groupBy("bin").agg(F.count("*").alias("n"))
            .select("bin",
                    (F.lit(lo) + F.col("bin") * w).alias("bin_lo"),
                    (F.lit(lo) + (F.col("bin") + 1) * w).alias("bin_hi"),
                    "n"))


def _md5_u48_key(key_col: str, seed: int) -> Column:
    """First 48 bits of ``md5("{seed}:{key}")`` as a BIGINT — the
    numeric sibling of :func:`_md5_unit_key` for accept tests of the
    form ``u48 < rate * 2**48`` (rate varies per row, so a precomputed
    hex bound cannot be used).  Same engine-portability contract."""
    return F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"),
                       F.col(key_col).cast("string"))), 1, 12),
        16, 10).cast("long")


def _md5_unit_key(id_col: str, seed: int) -> Column:
    """First 8 hex chars of ``md5("{seed}:{id}")`` — a uniform draw in
    [0, 16^8) encoded as a fixed-width lowercase hex STRING.  Equal-width
    hex strings compare lexicographically exactly like their numeric
    values, and md5 is bit-identical across engines, so thresholds and
    orderings built on this key reproduce anywhere (Spark, DuckDB, or a
    bash pipeline) — no engine-private hash, no RNG state."""
    return F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
        1, 8)


def split_assign(df: DataFrame, id_col: str,
                 splits: Sequence[tuple[str, float]] = (
                     ("train", 0.98), ("val", 0.01), ("test", 0.01)), *,
                 seed: int = 42, out_col: str = "split",
                 on_null: str = "error") -> DataFrame:
    """Assign every row to exactly one split (train/val/test/...) by key
    hash: disjoint, exhaustive, and stable — the same document lands in
    the same split on every run, at any scale, on any partitioning.
    That stability is the property that keeps eval sets uncontaminated
    as a 100 TB corpus is regrown incrementally: membership is a pure
    function of (seed, id), never of which batch a row arrived in.

    ``id_col`` must be non-null for membership to be a function of the
    id at all — a NULL id has no stable hash, and silently lumping such
    rows into one split (what a bare when/otherwise chain does: NULL
    comparisons fall through to the LAST branch, i.e. the EVAL split)
    is exactly the contamination this operator exists to prevent.  So
    NULL ids are routed explicitly by ``on_null``: ``"error"`` (default)
    fails the job with a clear message the moment one appears; any
    other value is used as a quarantine label (e.g. ``"_unsplit"``) so
    the caller can inspect/repair those rows downstream.

    Map-only (one projection, no shuffle); weights are normalized so
    ratios like (98, 1, 1) work as-is.
    """
    total = sum(w for _, w in splits)
    if total <= 0:
        raise ValueError("split weights must sum to > 0")
    key = _md5_unit_key(id_col, seed)
    if on_null == "error":
        null_branch = F.raise_error(F.lit(
            f"split_assign: NULL {id_col!r} — split membership must key "
            "on a non-null id (pass on_null=<label> to quarantine "
            "instead)"))
    else:
        null_branch = F.lit(on_null)
    expr = F.when(F.col(id_col).isNull(), null_branch)
    cum = 0.0
    for name, w in splits[:-1]:
        cum += w / total
        bound = format(min(int(cum * 16**8), 16**8 - 1), "08x")
        expr = expr.when(key < F.lit(bound), F.lit(name))
    expr = expr.otherwise(F.lit(splits[-1][0]))
    return df.withColumn(out_col, expr)


def deterministic_shuffle(df: DataFrame, id_col: str, *, seed: int = 42,
                          key_col: str = "shuffle_key",
                          num_partitions: Optional[int] = None) -> DataFrame:
    """Deterministic global shuffle for training-data ordering: every row
    gets a reproducible pseudo-random sort key, and the output is
    range-partitioned + sorted by it — a total order across output
    files WITHOUT a single-partition window (rank is implicit in file
    order; readers stream files in name order and see the same
    permutation every run).

    Changing ``seed`` produces an independent permutation (per-epoch
    reshuffles); same seed reproduces the run byte-for-byte.
    """
    keyed = df.withColumn(key_col, _md5_unit_key(id_col, seed))
    n = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions")
    return (keyed.repartitionByRange(int(n), F.col(key_col), F.col(id_col))
            .sortWithinPartitions(key_col, id_col))


def cap_per_group(df: DataFrame, group_col: str, *, key_col: str,
                  max_per_group: int, seed: int = 42,
                  exact: bool = True) -> DataFrame:
    """Cap rows per group at ``max_per_group`` — the domain-quota move
    of corpus curation ("no single site/source contributes more than N
    documents"), chosen deterministically so re-runs keep the SAME
    members.

    * ``exact=True`` — keep each group's ``max_per_group`` members with
      the smallest :func:`_md5_unit_key` draw (key breaks hash ties):
      one ``row_number`` window per group.  md5 is engine-portable, so
      the kept set is value-level oracle-checkable.  Window-sorts each
      group; fine up to groups of hundreds of millions (WindowExec
      spills), and the cap is exact.
    * ``exact=False`` — the 100 TB path for billion-row groups: one
      partial-aggregated per-group count BROADCAST back (|groups|
      rows; drop the hint if group cardinality ever outgrows the
      broadcast threshold) onto a map-only accept test at rate
      ``min(1, cap/n)`` per group (48-bit md5 draw vs rate·2^48, the
      :func:`weighted_sample_pps` mechanism) — keeps
      ``≈ max_per_group`` with Bernoulli variance, nothing sorts,
      nothing collects to the driver, no per-group plan growth.  NULL
      group keys are a group like any other on both paths.
    """
    if max_per_group <= 0:
        raise ValueError("max_per_group must be positive")
    draw = _md5_unit_key(key_col, seed)
    if exact:
        w = (Window.partitionBy(group_col)
             .orderBy(draw, F.col(key_col)))
        return (df.withColumn("_qrn", F.row_number().over(w))
                .filter(F.col("_qrn") <= max_per_group).drop("_qrn"))
    counts = df.groupBy(group_col).agg(F.count("*").alias("_gn"))
    rate = F.least(F.lit(1.0), F.lit(float(max_per_group)) / F.col("_gn"))
    u48 = _md5_u48_key(key_col, seed)
    return (df.join(F.broadcast(counts),
                    df[group_col].eqNullSafe(counts[group_col]))
            .filter(u48 < rate * F.lit(float(1 << 48)))
            .drop(counts[group_col]).drop("_gn"))


def weighted_sample_pps(df: DataFrame, *, key_col: str, weight_col: str,
                        k: int, seed: int = 42) -> DataFrame:
    """Probability-proportional-to-size Poisson sampling: keep each row
    independently with probability ``min(1, k·w/W)`` (``W`` = corpus
    weight total), so the sample holds ~``k`` rows and a row's chance of
    inclusion is proportional to its weight — the standard move for
    "sample documents proportional to token count".  Deterministic: the
    per-row draw is the first 48 bits of ``md5(seed:key)`` (pure
    function of (seed, key) — stable across runs, partitionings, and
    cluster sizes), and with INTEGER weights every quantity in the
    accept test (``u48 < min(1, k·w/W)·2^48``) is bit-identical in any
    engine with md5 and IEEE doubles, so the kept SET is value-level
    oracle-checkable.  Float weights make ``W`` a float sum (reduction-
    order-dependent in the last ulp) — selection is then stable within
    one engine but only almost-surely portable.

    Cost at scale: one partial-aggregated total (single scalar to the
    driver) + one map-only filter.  No sort, no shuffle of the corpus.
    Expected size is ~``k`` (Poisson, not exact-k); for a hard per-group
    cap use :func:`cap_per_group`.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    total = df.agg(F.sum(weight_col).alias("w")).collect()[0]["w"]
    if total is None or float(total) <= 0:
        raise ValueError("weight_col must have a positive total")
    u48 = _md5_u48_key(key_col, seed)
    p = F.least(F.lit(1.0),
                (F.lit(float(k)) * F.col(weight_col).cast("double"))
                / F.lit(float(total)))
    return df.filter(u48 < p * F.lit(float(1 << 48)))


def topp_per_group(df: DataFrame, *, group_col: str, score_col: str,
                   token_col: str, p: float, id_col: str) -> DataFrame:
    """Nucleus (top-p) selection per group: order each group's rows by
    (``score_col`` desc, ``id_col``) and keep rows until the cumulative
    ``token_col`` share reaches ``p`` of the group total — the doc that
    crosses the threshold is kept, everything after it is dropped.  The
    budget-aware sibling of quantile filtering: "the best documents
    covering 60% of each source's tokens" instead of "the best 60% of
    documents".

    Output: the kept rows with an exact ``cum_tokens`` running total
    appended.  With integer tokens the threshold test
    (``cum − tok < p·total``) is bit-exact cross-engine; scores only
    need a deterministic ORDER (ties broken by ``id_col``), not exact
    arithmetic.

    Scale shape: one shuffle on the group key; the running total and the
    group total are two frames over the SAME sorted partition (one sort,
    no self-join).  Per-group volume is the skew bound, as with any
    window-over-key.
    """
    if not (0.0 <= p <= 1.0):
        raise ValueError("p must be in [0, 1]")
    w = (Window.partitionBy(group_col)
         .orderBy(F.col(score_col).desc(), F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = F.sum(token_col).over(w)
    total = F.sum(token_col).over(Window.partitionBy(group_col))
    return (df.withColumn("cum_tokens", cum)
            .withColumn("_tot", total)
            .filter((F.col("cum_tokens") - F.col(token_col))
                    < F.lit(float(p)) * F.col("_tot"))
            .drop("_tot"))


def gumbel_topk(df: DataFrame, score_col: str, *, key_col: str,
                k: int, seed: int = 42,
                temperature: float = 1.0) -> DataFrame:
    """Gumbel top-k sampling WITHOUT replacement: keep the ``k`` rows
    maximizing ``score/temperature + Gumbel(md5(seed:key))`` — exactly
    sampling k items without replacement with probability ∝
    ``exp(score/temperature)`` (the Gumbel-max trick), which is the
    published selection step of DSIR-style importance resampling
    (scores = log importance weights).  ``temperature → 0`` approaches
    deterministic arg-top-k; larger temperatures flatten the draw.

    Deterministic: the Gumbel noise is ``−ln(−ln(u))`` of the 48-bit
    md5 draw (+0.5 to dodge ln(0)) — a pure function of (seed, key),
    so re-runs keep the SAME sample.  Feed a ROUNDED score when
    cross-engine reproducibility matters: the noise arithmetic is
    IEEE-stable, but an unrounded float score carries its own
    accumulation-order ulps.

    Scale shape: map-only key computation + ``orderBy().limit(k)``,
    which Spark executes as TakeOrdered — per-partition partial top-k,
    only k rows per partition reach the driver-side merge.  No full
    sort, no shuffle of the corpus.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    u = (_md5_u48_key(key_col, seed).cast("double") + 0.5) \
        / F.lit(float(1 << 48))
    gumbel = -F.log(-F.log(u))
    key = F.col(score_col).cast("double") / F.lit(float(temperature)) \
        + gumbel
    return (df.withColumn("_gumbel_key", key)
            .orderBy(F.col("_gumbel_key").desc(), F.col(key_col))
            .limit(k)
            .drop("_gumbel_key"))


def curriculum_order(df: DataFrame, score_col: str, *, id_col: str,
                     n_bands: int = 10, seed: int = 42,
                     ascending: bool = True, exact: bool = True,
                     band_col: str = "band",
                     key_col: str = "shuffle_key",
                     num_partitions: Optional[int] = None) -> DataFrame:
    """Curriculum training order: band the corpus by ``score_col``
    quantile (equal-frequency bands via
    :func:`~wrangle_pypes_spark.operators.relational.bucketize`), then
    deterministically shuffle WITHIN each band — the standard
    curriculum-learning data layout (easy → hard by band, no ordering
    signal inside a band that the model could exploit).

    The output is range-partitioned + sorted by ``(band, shuffle_key,
    id)`` — a total order across output files without a
    single-partition window, exactly the :func:`deterministic_shuffle`
    mechanism with the band as the major key.  ``ascending=False``
    reverses the band order (hard → easy, anti-curriculum).  Same
    ``seed`` reproduces the layout byte-for-byte; a new seed reshuffles
    within bands but keeps band membership.

    ``exact=True`` computes exact quantile cuts (value-level
    oracle-checkable); ``exact=False`` is the
    ``approx_percentile`` 100 TB path.  Rows with a NULL score get a
    NULL band and sort FIRST (Spark NULLS FIRST) — filter them out
    beforehand if that is not the intended warm-up data.

    Scale shape: one k-cut aggregate (k scalars to the driver), a
    map-only band/key assignment, and ONE range-partition shuffle that
    both places and sorts the output.
    """
    from .relational import bucketize

    if n_bands < 2:
        raise ValueError("n_bands must be at least 2")
    probs = [i / n_bands for i in range(1, n_bands)]
    banded = bucketize(df, score_col, probs=probs, exact=exact,
                       out_col=band_col)
    keyed = banded.withColumn(key_col, _md5_unit_key(id_col, seed))
    order_band = (F.col(band_col) if ascending
                  else (F.lit(n_bands - 1) - F.col(band_col)))
    n = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions")
    return (keyed.withColumn("_band_ord", order_band)
            .repartitionByRange(int(n), F.col("_band_ord"),
                                F.col(key_col), F.col(id_col))
            .sortWithinPartitions("_band_ord", key_col, id_col)
            .drop("_band_ord"))
