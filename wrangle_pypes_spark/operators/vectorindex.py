"""Persisted IVF vector index: ANN serving that reads the INDEX, not
the corpus — the embedding twin of ``operators/textindex.py``.

``ivf_topk`` (operators/similarity.py) re-fits the k-means coarse
quantizer and re-codes the whole corpus on EVERY call — the right
one-shot shape, the wrong cost model for serving: at 100 TB a 10-query
probe should not touch (or even re-plan) the corpus.  This module
persists the IVF structure once:

* the COARSE QUANTIZER (k-means centroids from
  ``similarity.kmeans_fit``) lives in a ``_vindex.json`` sidecar —
  k×dim floats, driver-sized by construction, written BEFORE the
  first commit so a crash can never publish vectors the sidecar
  misdescribes (the bloom/CMS sidecar lesson, r9);
* the CODED CORPUS lives in a manifest store KEYED BY CELL: one row
  per vector ``(cell, id, vec, norm)`` — so a probe of ``n_probe``
  cells is a ``manifest_lookup`` touching ≤ n_probe bucket
  directories regardless of corpus size, exactly the token-bucket
  economics of the text index;
* the per-row L2 NORM is precomputed at build (Spark's own double
  arithmetic), so probe-time cosine is one dot product per candidate
  and scores stay BIT-IDENTICAL to ``cosine_topk`` on the same rows.

Query path (:func:`vector_index_topk`): assign each query its
``n_probe`` nearest cells (one Arrow batch matmul against the sidecar
centroids — queries are the small side), ``manifest_lookup`` exactly
those cells' buckets, exact cosine re-rank within the candidates, and
window top-k.  ``n_probe = n_centroids`` probes every cell and is
EXACT — equal to ``cosine_topk`` output row for row (pinned in
tests); smaller ``n_probe`` is the recall/cost dial, audited (never
silent) by the recall tests.

Incrementality: later batches fold in at O(touched cells' buckets)
via :func:`build_vector_index` on the same store — the sidecar's
centroids are REUSED (cells are immutable once built, like the text
index's ``block_limit``), so a vector's cell is a pure function of
the frozen quantizer and incremental == one-shot exactly (pinned in
tests).  Contract: ids are APPEND-ONLY, each id in exactly one batch
(re-embedding a changed doc needs a rebuild — the posting-list rule).

``quantize=True`` stores int8-quantized vectors + per-row scale
(``similarity.quantize_embeddings``: 4× smaller store/shuffle) and
re-ranks on the dequantized reconstruction — approximate within one
quantization step, the documented trade.

Reference analog: none — the reference (transformations.py:50-266)
has no embedding or retrieval surface; this is LLM-data tooling the
[EXT] mandate adds.
"""

from __future__ import annotations

import json
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import fsutil
from ..sources.manifest import manifest_lookup, manifest_merge
from .similarity import (_dot, _nearest_cells_udf, _norm, kmeans_fit,
                         quantize_embeddings)

_SIDECAR = "_vindex.json"

__all__ = ["build_vector_index", "vector_index_stats",
           "vector_index_topk"]


def _load_sidecar(store_path: str, spark=None) -> Optional[dict]:
    txt = fsutil.read_text(store_path.rstrip("/") + "/" + _SIDECAR,
                           spark=spark)
    return None if txt is None else json.loads(txt)


def build_vector_index(corpus: DataFrame, store_path: str, *,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       n_centroids: int = 16, iters: int = 2,
                       seed: int = 42, fit_fraction: float = 1.0,
                       n_buckets: int = 16,
                       quantize: bool = False,
                       meta_cols: Sequence[str] = (),
                       centroids: Optional[Sequence[Sequence[float]]]
                       = None,
                       epoch_id: int = -1) -> int:
    """(Incrementally) index ``corpus`` into the IVF store at
    ``store_path``; returns the committed manifest version.

    First call: fits the coarse quantizer (unless ``centroids`` is
    passed — the production path for a quantizer fitted on a
    dedicated sample) and pins it, with the layout params, in the
    sidecar BEFORE the first commit.  Later calls REUSE the pinned
    centroids and fold the new batch in at O(touched cells' buckets);
    their ``n_centroids/iters/seed/quantize/meta_cols`` arguments
    must not contradict the sidecar (immutable layout — loud error,
    the manifest n_buckets rule).  Re-submitting already-indexed ids
    violates the append-only contract (duplicate candidates, no
    error); a streaming maintainer's epoch guard is the replay
    protection, as with the text index.

    ``meta_cols`` stores those corpus columns on every index row —
    the FILTERED-ANN path: :func:`vector_index_topk`'s ``where``
    predicate evaluates against them on the probed candidates BEFORE
    the exact re-rank, so a filtered query costs the probed cells'
    buckets, never a corpus join."""
    spark = corpus.sparkSession
    # argument validation BEFORE any sidecar write: a rejected build
    # must not pin a layout the caller immediately has to live with
    reserved = {"cell", "id", "vec", "norm", "qvec", "qscale"}
    clash = [c for c in meta_cols if c in reserved]
    if clash:
        raise ValueError(f"meta_cols {clash} collide with the "
                         "index's reserved column names")
    missing = [c for c in meta_cols if c not in corpus.columns]
    if missing:
        raise ValueError(f"corpus lacks meta_cols {missing}")
    side = _load_sidecar(store_path, spark=spark)
    if side is not None:
        if centroids is not None and \
                [list(map(float, c)) for c in centroids] != \
                side["centroids"]:
            raise ValueError(
                f"vector index at {store_path!r} already pins its "
                "centroids — passing different ones would re-cell "
                "old vectors inconsistently (rebuild instead)")
        mism = {k: (v, side[k]) for k, v in
                (("n_centroids", int(n_centroids)),
                 ("quantize", bool(quantize)),
                 ("vec_col", vec_col), ("id_col", id_col),
                 ("meta_cols", list(meta_cols)))
                if side.get(k, [] if k == "meta_cols" else None) != v}
        if mism:
            raise ValueError(
                f"vector index at {store_path!r} layout is immutable; "
                f"mismatched params {mism}")
        cents = side["centroids"]
    else:
        if centroids is None:
            cents = kmeans_fit(corpus, vec_col, id_col=id_col,
                               k=n_centroids, iters=iters, seed=seed,
                               fit_fraction=fit_fraction)
        else:
            cents = [list(map(float, c)) for c in centroids]
        if len(cents) != int(n_centroids):
            raise ValueError(
                f"got {len(cents)} centroids for n_centroids="
                f"{n_centroids}")
        # sidecar BEFORE the first commit: a crash in between leaves
        # a pinned quantizer and no data — re-run converges; the
        # reverse order could publish vectors celled by a quantizer
        # nobody recorded
        fsutil.ensure_dir(store_path, spark=spark)
        fsutil.write_text_atomic(
            store_path.rstrip("/") + "/" + _SIDECAR,
            json.dumps({"centroids": cents,
                        "n_centroids": int(n_centroids),
                        "dim": len(cents[0]) if cents else 0,
                        "seed": int(seed),
                        "quantize": bool(quantize),
                        "meta_cols": list(meta_cols),
                        "vec_col": vec_col, "id_col": id_col}),
            spark=spark)
    assign1 = _nearest_cells_udf(cents, 1)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    rows = corpus.select(
        assign1(F.col(vec_col))[0].alias("cell"),
        F.col(id_col).alias("id"),
        v.alias("vec"),
        _norm(v).alias("norm"),
        *[F.col(c) for c in meta_cols])
    if quantize:
        rows = (quantize_embeddings(rows, "vec", q_col="qvec",
                                    scale_col="qscale")
                .withColumn("qvec", F.transform(
                    F.col("qvec"), lambda x: x.cast("tinyint")))
                .drop("vec"))
        # the norm must match what the probe RE-RANKS with — the
        # dequantized reconstruction, not the original vector
        recon = F.transform(F.col("qvec"),
                            lambda x: x.cast("double") * F.col("qscale"))
        rows = rows.withColumn("norm", _norm(recon))
    # one evaluation: manifest_merge double-evaluates updates, and
    # the cell assignment is the expensive part of this plan
    rows = rows.localCheckpoint(eager=True)
    return manifest_merge(
        rows, store_path, ["cell"], epoch_id=epoch_id,
        n_buckets=n_buckets,
        merge_fn=lambda stored, updates:
            updates if stored is None else stored.unionByName(updates))


def vector_index_topk(spark: SparkSession, store_path: str,
                      queries: DataFrame, *, k: int = 5,
                      n_probe: int = 4,
                      where: Optional[str] = None,
                      query_id_col: Optional[str] = None,
                      query_vec_col: Optional[str] = None) -> DataFrame:
    """Top-k cosine neighbors for each query row, served FROM THE
    INDEX: assigns each query its ``n_probe`` nearest cells under the
    store's pinned quantizer, reads exactly those cells' buckets
    (``manifest_lookup`` — the corpus is never scanned or re-coded),
    and exact-cosine re-ranks the candidates.  Output contract and
    arithmetic match ``cosine_topk``: (query_id, neighbor_id, cosine),
    self-matches excluded, ties on neighbor_id — with
    ``n_probe >= n_centroids`` the result IS ``cosine_topk``'s, row
    for row (pinned in tests); below that it is ANN with the recall
    the tests audit.  Queries must be the small side (they broadcast
    into the candidate join), the serving topology's usual shape.

    ``where`` is FILTERED ANN: a SQL predicate over the store's
    ``meta_cols`` (e.g. ``"label = 2 AND lang = 'en'"``), applied to
    the probed candidates BEFORE the exact re-rank — post-filtering a
    top-k would under-fill k; pre-filtering candidates keeps k exact
    over the filtered corpus (and at full probe, exactly
    ``cosine_topk`` over ``corpus.filter(where)``, pinned in
    tests)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if n_probe < 1:
        raise ValueError("n_probe must be >= 1")
    side = _load_sidecar(store_path, spark=spark)
    if side is None:
        raise ValueError(f"no vector index at {store_path!r} "
                         "(missing sidecar — not built by "
                         "build_vector_index?)")
    cents = side["centroids"]
    qid = query_id_col or side["id_col"]
    qvec = query_vec_col or side["vec_col"]
    n_probe = min(int(n_probe), len(cents))
    assign_p = _nearest_cells_udf(cents, n_probe)
    qv = F.transform(F.col(qvec), lambda x: x.cast("double"))
    q = queries.select(
        F.col(qid).alias("query_id"), qv.alias("_qvec"),
        _norm(qv).alias("_qn"),
        F.explode(assign_p(F.col(qvec))).alias("cell")) \
        .localCheckpoint(eager=True)  # assignment runs once, not per use
    # the probed cells (≤ n_centroids values — driver-bounded): the
    # ONLY thing read from the store is their buckets
    probes = q.select("cell").distinct()
    cand = manifest_lookup(spark, store_path, probes)
    if cand is None:
        raise ValueError(f"no vector index committed at {store_path!r}")
    if where is not None:
        if not side.get("meta_cols"):
            raise ValueError(
                f"index at {store_path!r} stores no meta_cols — "
                "rebuild with build_vector_index(meta_cols=...) to "
                "serve filtered queries")
        cand = cand.filter(F.expr(where))
    if side.get("quantize"):
        recon = F.transform(F.col("qvec"),
                            lambda x: x.cast("double") * F.col("qscale"))
        cand = cand.select("cell", "id", recon.alias("vec"), "norm")
    joined = (cand.join(F.broadcast(q), "cell")
              .filter(F.col("id") != F.col("query_id")))
    scored = joined.select(
        "query_id", F.col("id").alias("neighbor_id"),
        (_dot(F.col("_qvec"), F.col("vec"))
         / (F.col("_qn") * F.col("norm"))).alias("cosine"))
    # multi-probe duplicates are impossible (a vector lives in ONE
    # cell), so no dropDuplicates pass is needed — unlike LSH probing
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k).drop("_rn"))


def vector_index_stats(spark: SparkSession, store_path: str
                       ) -> Optional[DataFrame]:
    """Index health: one row per cell — ``(cell, n_vectors)`` plus the
    store-wide centroid count as a literal — the skew measurement
    that says when the quantizer needs more cells (a hot cell makes
    probes expensive exactly like a hot posting).  One pruned-column
    scan; vectors are never read."""
    from ..sources.manifest import manifest_read

    side = _load_sidecar(store_path, spark=spark)
    df = manifest_read(spark, store_path)
    if df is None or side is None:
        return None
    return (df.groupBy("cell")
            .agg(F.count("*").cast("long").alias("n_vectors"))
            .withColumn("n_centroids",
                        F.lit(int(side["n_centroids"])))
            .orderBy(F.col("n_vectors").desc(), "cell"))
