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

from functools import partial
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..sources.manifest import manifest_lookup, manifest_merge

STATS_KEY = ""  # reserved token: tokens() never yields an empty string
DEFAULT_BLOCK_LIMIT = 1 << 16  # postings per stored row, ~a few MB

_COLS = ["token", "block", "postings", "df", "n_docs", "sum_dl"]

__all__ = ["STATS_KEY", "DEFAULT_BLOCK_LIMIT", "build_text_index",
           "derive_stop_tokens", "index_stats", "postings_frame",
           "merge_postings", "text_index_search"]


def postings_frame(docs: DataFrame, *, text_col: str = "text",
                   id_col: str = "doc_id",
                   stop_tokens: Sequence[str] = (),
                   block_limit: int = DEFAULT_BLOCK_LIMIT) -> DataFrame:
    """One batch of documents → index rows: per token, postings
    chunked into blocks of ≤ ``block_limit`` entries (each block
    sorted by doc), plus the reserved corpus-stats row (``token=''``,
    n_docs, sum_dl).  Docs with zero tokens still count toward N and
    Σdl (BM25's N is corpus size, not match count).

    The chunk assignment is row_number within the token — a
    partitionBy(token) sort that Spark spills for hot tokens, never
    an in-memory O(corpus) array.  The per-row ``df`` here is the
    BLOCK's size; :func:`merge_postings` (which every commit path
    runs through) recomputes the token-total df on every row."""
    if block_limit < 1:
        raise ValueError("block_limit must be >= 1")
    L = int(block_limit)
    toks = tokens(F.col(text_col))
    base = docs.select(F.col(id_col).alias("doc"), toks.alias("_toks"),
                       F.size(toks).cast("long").alias("_dl"))
    tok_rows = base.select("doc", "_dl",
                           F.explode("_toks").alias("token"))
    if stop_tokens:
        tok_rows = tok_rows.filter(
            ~F.col("token").isin([t.lower() for t in stop_tokens]))
    tf = tok_rows.groupBy("token", "doc", "_dl").agg(
        F.count("*").cast("long").alias("tf"))
    w = Window.partitionBy("token").orderBy("doc")
    posts = (tf.withColumn(
                 "block",
                 F.floor((F.row_number().over(w) - 1) / L).cast("int"))
             .groupBy("token", "block")
             .agg(F.array_sort(F.collect_list(F.struct(
                 F.col("doc"), F.col("tf"),
                 F.col("_dl").alias("dl")))).alias("postings"))
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
    wtok = Window.partitionBy("token").orderBy("_ord", "_sub")
    renum = unioned.withColumn(
        "block", (F.row_number().over(wtok) - 1).cast("int"))
    totals = renum.groupBy("token").agg(
        F.sum(F.size("postings")).cast("long").alias("df"))
    return (renum.join(totals, "token")
            .select("token", "block", "postings", "df",
                    "n_docs", "sum_dl"))


def build_text_index(docs: DataFrame, store_path: str, *,
                     text_col: str = "text", id_col: str = "doc_id",
                     n_buckets: int = 64,
                     stop_tokens: Sequence[str] = (),
                     block_limit: int = DEFAULT_BLOCK_LIMIT,
                     epoch_id: int = -1) -> int:
    """(Incrementally) index ``docs`` into the manifest store at
    ``store_path``; returns the committed version.  Calling again
    with a NEW batch of docs folds them in at O(touched tokens'
    buckets); re-submitting already-indexed docs violates the
    append-only contract (duplicate postings, no error) — the
    streaming maintainer's epoch guard is the replay protection.
    ``block_limit`` bounds every stored row's postings array and is
    part of the store's layout: use the same value on every call."""
    frame = postings_frame(docs, text_col=text_col, id_col=id_col,
                           stop_tokens=stop_tokens,
                           block_limit=block_limit)
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
    probes = spark.createDataFrame(
        [(t,) for t in terms + [STATS_KEY]], "token string")
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
