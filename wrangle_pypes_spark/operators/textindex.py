"""Inverted token index: BM25 search that reads the INDEX, not the
corpus.

``bm25_scores`` (functions/text.py) ranks by scanning every document
per query — the right baseline, the wrong cost model for a serving
path: at 100 TB a three-term query should not tokenize the corpus.
This module precomputes the classic inverted index as a MANIFEST STORE
keyed by token — one row per token carrying its postings
``array<struct<doc, tf, dl>>`` and document frequency — plus the
corpus totals (N, Σdl) as one reserved-key row committed ATOMICALLY
with the postings (same manifest pointer).  A query then costs
``manifest_lookup`` of the query terms (≤ |terms|+1 bucket
directories, each ~1 file, regardless of corpus size) + one explode +
one per-doc sum: O(candidate postings), nothing corpus-shaped.

Exactness: :func:`text_index_search` returns BIT-IDENTICAL rows to
``bm25_scores`` on the same corpus/terms (pinned in tests) — tf, df,
dl, N are exact integers in both paths and the float formula is
evaluated in the same order.

Incrementality: postings merge per token (concat + re-sort; df =
list size; corpus totals sum), so batches of NEW documents fold in at
O(touched tokens' buckets) via the manifest merge_fn — the streaming
maintainer (``streaming/windows.py foreach_batch_text_index``) drains
a document stream into the same store with the manifest's
epoch-guarded exactly-once commit.  Contract: documents are
APPEND-ONLY and each doc_id arrives in exactly one batch (re-indexing
an updated doc needs a rebuild, as with any posting-list index).

Scale honesty: a token's postings are ONE array in ONE row, so the
row for a stopword-grade token is O(N docs) — the classic hot-posting
problem.  Exclude such terms at build time (``stop_tokens=``, or a
``max_df`` prune after measuring with ``index_stats``); block-split
posting lists are the next step beyond this module's scope and are
deliberately not faked here.

Reference analog: none — the reference (transformations.py:50-266)
has no text or retrieval surface; this is LLM-data tooling the [EXT]
mandate adds.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..sources.manifest import manifest_lookup, manifest_merge

STATS_KEY = ""  # reserved token: tokens() never yields an empty string

__all__ = ["STATS_KEY", "build_text_index", "index_stats",
           "postings_frame", "merge_postings", "text_index_search"]


def postings_frame(docs: DataFrame, *, text_col: str = "text",
                   id_col: str = "doc_id",
                   stop_tokens: Sequence[str] = ()) -> DataFrame:
    """One batch of documents → index rows: per token
    ``(token, postings sorted by doc, df)`` plus the reserved
    corpus-stats row (``token=''``, n_docs, sum_dl).  Docs with zero
    tokens still count toward N and Σdl (BM25's N is corpus size,
    not match count)."""
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
    posts = (tf.groupBy("token")
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
        F.from_json(F.lit("[]"), ptype).alias("postings"),
        F.lit(0).cast("long").alias("df"),
        "n_docs", "sum_dl")
    return (posts.select("token", "postings", "df",
                         F.lit(None).cast("long").alias("n_docs"),
                         F.lit(None).cast("long").alias("sum_dl"))
            .unionByName(stats_row))


def merge_postings(stored: Optional[DataFrame],
                   updates: DataFrame) -> DataFrame:
    """Manifest ``merge_fn`` for index rows: per token, concatenate
    postings (append-only doc contract — no doc appears twice) and
    re-sort, recompute df from the merged list, sum the stats row's
    corpus totals.  Carried same-bucket tokens re-emit themselves
    unchanged."""
    both = updates if stored is None else stored.unionByName(updates)
    return (both.groupBy("token")
            .agg(F.array_sort(F.flatten(F.collect_list("postings")))
                 .alias("postings"),
                 F.sum("n_docs").alias("n_docs"),
                 F.sum("sum_dl").alias("sum_dl"))
            .withColumn("df", F.size("postings").cast("long"))
            .select("token", "postings", "df", "n_docs", "sum_dl"))


def build_text_index(docs: DataFrame, store_path: str, *,
                     text_col: str = "text", id_col: str = "doc_id",
                     n_buckets: int = 64,
                     stop_tokens: Sequence[str] = (),
                     epoch_id: int = -1) -> int:
    """(Incrementally) index ``docs`` into the manifest store at
    ``store_path``; returns the committed version.  Calling again
    with a NEW batch of docs folds them in at O(touched tokens'
    buckets); re-submitting already-indexed docs violates the
    append-only contract (duplicate postings, no error) — the
    streaming maintainer's epoch guard is the replay protection."""
    frame = postings_frame(docs, text_col=text_col, id_col=id_col,
                           stop_tokens=stop_tokens)
    # materialized once: manifest_merge evaluates updates twice
    # (bucket discovery + merge) and tokenizing the corpus is the
    # expensive part of this plan
    frame = frame.localCheckpoint(eager=True)
    return manifest_merge(frame, store_path, ["token"],
                          epoch_id=epoch_id, n_buckets=n_buckets,
                          merge_fn=merge_postings)


def text_index_search(spark: SparkSession, store_path: str,
                      query_terms: Sequence[str], *,
                      id_name: str = "doc_id", k1: float = 1.2,
                      b: float = 0.75, round_digits: int = 4,
                      max_df: Optional[int] = None) -> DataFrame:
    """Okapi BM25 over the index: identical output contract (and
    values) to ``bm25_scores(corpus, terms)`` — ``(id, n_terms_hit,
    bm25)`` for docs matching ≥1 term — at index-lookup cost: the
    probed tokens' buckets (+1 for the stats row) are the only data
    read; the corpus is never touched.

    ``max_df`` skips query terms whose document frequency exceeds it
    BEFORE their postings explode — the search-side answer to the
    hot-posting hazard: a stopword-grade term contributes ~zero idf
    anyway, but its O(N) postings row dominates the read.  Search-
    time pruning keeps semantics stable under incremental builds
    (unlike build-time df pruning, where a term's df is only known
    per batch); terms skipped this way simply do not count toward
    ``n_terms_hit``."""
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
    """Index health: the ``top`` highest-df tokens with their posting
    sizes — the measurement that drives ``stop_tokens``/rebuild
    decisions (a token whose df ~ N is a stopword-grade hot posting;
    exclude it and rebuild).  One pruned-column scan of the store."""
    from ..sources.manifest import manifest_read

    df = manifest_read(spark, store_path)
    if df is None:
        return None
    return (df.filter(F.col("token") != STATS_KEY)
            .select("token", "df")
            .orderBy(F.col("df").desc(), "token")
            .limit(top))
