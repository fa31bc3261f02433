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

``pq_m=m`` (r11) is PRODUCT QUANTIZATION — the memory-bounded 100 TB
codec (Jégou et al., "Product Quantization for Nearest Neighbor
Search", TPAMI 2011; the FAISS IVF-PQ layout): each vector splits
into ``m`` sub-vectors, each sub-space gets its own ≤256-centroid
k-means codebook (fitted on the build sample, pinned in the sidecar
with the coarse quantizer), and the store holds ONE BYTE-SIZED CODE
per sub-vector — ``m`` smallints instead of ``dim`` doubles, a
``dim*8/m``-fold cut (64-dim → m=8 is 64×).  The probe is ADC
(asymmetric distance computation): per QUERY, one Arrow batch builds
the m×256 lookup table ``lut[j][c] = dot(q_j, codebook[j][c])``, and
each candidate scores as ``Σ_j lut[j][code_j]`` — m additions per
pair, never a reconstruction — which equals the exact cosine against
the RECONSTRUCTED vector (the stored ``norm`` is the
reconstruction's, so the ratio is exact for the codec).  Approximate
vs the raw corpus, recall-audited in tests like every approximate
path here; mutually exclusive with ``quantize`` (one codec per
store).

Reference analog: none — the reference (transformations.py:50-266)
has no embedding or retrieval surface; this is LLM-data tooling the
[EXT] mandate adds.
"""

from __future__ import annotations

import json
from typing import Optional, Sequence

import numpy as np
import pandas as pd
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


def _fit_pq_codebooks(corpus: DataFrame, vec_col: str, id_col: str, *,
                      m: int, dim: int, iters: int, seed: int,
                      fit_fraction: float) -> list:
    """One ≤256-centroid k-means codebook per sub-space, fitted with
    the same distributed Lloyd machinery as the coarse quantizer
    (``similarity.kmeans_fit`` — only k×sub floats ever reach the
    driver per sub-space).  A fit set smaller than 256 yields a
    smaller codebook (codes still index it exactly); sub-space seeds
    differ so identical sub-distributions don't share init ties."""
    sub = dim // m
    books = []
    for j in range(m):
        sl = corpus.select(
            F.col(id_col).alias("_pid"),
            F.transform(F.slice(F.col(vec_col), j * sub + 1, sub),
                        lambda x: x.cast("double")).alias("_pv"))
        books.append(kmeans_fit(sl, "_pv", id_col="_pid", k=256,
                                iters=iters, seed=seed + 7 * j + 1,
                                fit_fraction=fit_fraction))
    return books


def _pq_encode_udf(codebooks):
    """Arrow-vectorized PQ encoder: per vector, the argmin-distance
    code in each sub-space plus the RECONSTRUCTION's L2 norm (the
    norm the ADC probe ratios against — storing the raw vector's norm
    would make the served cosine inconsistent with the codec).  One
    numpy matmul per (batch, sub-space)."""
    Cs = [np.asarray(b, dtype=np.float64) for b in codebooks]
    c2s = [(C * C).sum(axis=1) for C in Cs]
    m = len(Cs)
    sub = Cs[0].shape[1]

    # one flat array<double> of [code_0..code_{m-1}, rnorm] — a
    # Series→DataFrame (struct) hint is not a supported pandas-UDF
    # signature on Spark 4; the caller splits it expression-side
    @F.pandas_udf("array<double>")
    def encode(v: pd.Series) -> pd.Series:
        X = np.stack(v.to_numpy()).astype(np.float64)      # n x dim
        n = X.shape[0]
        out = np.empty((n, m + 1), dtype=np.float64)
        r2 = np.zeros(n, dtype=np.float64)
        for j in range(m):
            Xj = X[:, j * sub:(j + 1) * sub]               # n x sub
            d2 = c2s[j][None, :] - 2.0 * (Xj @ Cs[j].T)    # n x k_j
            cj = d2.argmin(axis=1)
            out[:, j] = cj
            r2 += (Cs[j][cj] ** 2).sum(axis=1)
        out[:, m] = np.sqrt(r2)
        return pd.Series(list(out))

    return encode


def _pq_lut_udf(codebooks):
    """Arrow-vectorized ADC table builder: per QUERY vector, the
    flattened m×256 lookup ``lut[j*256 + c] = dot(q_j, codebook[j][c])``
    (unused tail entries of a <256 codebook stay 0 and are never
    indexed — codes are < the codebook's real size by construction).
    16 KB per query row at m=8; queries are the broadcast side."""
    Cs = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(Cs)
    sub = Cs[0].shape[1]

    @F.pandas_udf("array<double>")
    def lut(v: pd.Series) -> pd.Series:
        X = np.stack(v.to_numpy()).astype(np.float64)      # n x dim
        n = X.shape[0]
        out = np.zeros((n, m * 256), dtype=np.float64)
        for j in range(m):
            Xj = X[:, j * sub:(j + 1) * sub]               # n x sub
            out[:, j * 256:j * 256 + Cs[j].shape[0]] = Xj @ Cs[j].T
        return pd.Series(list(out))

    return lut


def build_vector_index(corpus: DataFrame, store_path: str, *,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       n_centroids: int = 16, iters: int = 2,
                       seed: int = 42, fit_fraction: float = 1.0,
                       n_buckets: int = 16,
                       quantize: bool = False,
                       pq_m: int = 0,
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
    reserved = {"cell", "id", "vec", "norm", "qvec", "qscale",
                "pqcode"}
    clash = [c for c in meta_cols if c in reserved]
    if clash:
        raise ValueError(f"meta_cols {clash} collide with the "
                         "index's reserved column names")
    missing = [c for c in meta_cols if c not in corpus.columns]
    if missing:
        raise ValueError(f"corpus lacks meta_cols {missing}")
    if pq_m and quantize:
        raise ValueError("pq_m and quantize are mutually exclusive — "
                         "one storage codec per store")
    if pq_m < 0:
        raise ValueError("pq_m must be >= 0")
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
        if side.get("pq_m", 0) != int(pq_m):
            mism["pq_m"] = (int(pq_m), side.get("pq_m", 0))
        if mism:
            raise ValueError(
                f"vector index at {store_path!r} layout is immutable; "
                f"mismatched params {mism}")
        cents = side["centroids"]
        books = side.get("pq_codebooks")
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
        books = None
        doc = {"centroids": cents,
               "n_centroids": int(n_centroids),
               "dim": len(cents[0]) if cents else 0,
               "seed": int(seed),
               "quantize": bool(quantize),
               "meta_cols": list(meta_cols),
               "vec_col": vec_col, "id_col": id_col}
        if pq_m:
            dim = doc["dim"]
            if dim % int(pq_m) != 0:
                raise ValueError(
                    f"pq_m={pq_m} must divide the vector dim {dim}")
            books = _fit_pq_codebooks(corpus, vec_col, id_col,
                                      m=int(pq_m), dim=dim,
                                      iters=iters, seed=seed,
                                      fit_fraction=fit_fraction)
            doc["pq_m"] = int(pq_m)
            doc["pq_codebooks"] = books
        # sidecar BEFORE the first commit: a crash in between leaves
        # a pinned quantizer and no data — re-run converges; the
        # reverse order could publish vectors celled by a quantizer
        # nobody recorded
        fsutil.ensure_dir(store_path, spark=spark)
        fsutil.write_text_atomic(
            store_path.rstrip("/") + "/" + _SIDECAR,
            json.dumps(doc), spark=spark)
    assign1 = _nearest_cells_udf(cents, 1)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    if books is not None:
        # PQ codec: m byte-sized codes + the reconstruction's norm —
        # the raw vector never reaches the store
        enc = _pq_encode_udf(books)
        m = len(books)
        rows = (corpus.select(
                    assign1(F.col(vec_col))[0].alias("cell"),
                    F.col(id_col).alias("id"),
                    enc(F.col(vec_col)).alias("_e"),
                    *[F.col(c) for c in meta_cols])
                .select("cell", "id",
                        F.transform(
                            F.slice(F.col("_e"), 1, m),
                            lambda x: x.cast("smallint"))
                        .alias("pqcode"),
                        F.element_at(F.col("_e"), m + 1)
                        .alias("norm"),
                        *[F.col(c) for c in meta_cols]))
        rows = rows.localCheckpoint(eager=True)
        return manifest_merge(
            rows, store_path, ["cell"], epoch_id=epoch_id,
            n_buckets=n_buckets,
            merge_fn=lambda stored, updates:
                updates if stored is None else
                stored.unionByName(updates))
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
    tests).

    On a PQ store (``build_vector_index(pq_m=...)``) the re-rank is
    ADC: each query ships its m×256 dot-product table and every
    candidate scores in m additions against its stored byte codes —
    the served cosine is exact FOR THE CODEC (query vs the codebook
    reconstruction, whose norm the store carries), approximate vs the
    raw corpus even at full probe; the recall tests audit the gap.
    ``where`` composes unchanged (meta columns are stored next to the
    codes)."""
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
    books = side.get("pq_codebooks")
    qv = F.transform(F.col(qvec), lambda x: x.cast("double"))
    qcols = [F.col(qid).alias("query_id"), _norm(qv).alias("_qn"),
             F.explode(assign_p(F.col(qvec))).alias("cell")]
    if books is not None:
        # ADC: the per-query m×256 lookup table replaces the vector —
        # candidates score by m table additions, never a
        # reconstruction
        qcols.insert(1, _pq_lut_udf(books)(F.col(qvec)).alias("_lut"))
    else:
        qcols.insert(1, qv.alias("_qvec"))
    q = queries.select(*qcols) \
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
    if books is not None:
        m = int(side["pq_m"])
        # Σ_j lut[j*256 + code_j] == dot(query, reconstruction);
        # _lut is an attribute reference, so the HOF lambda reads it
        # once per row (the interpreted-HOF trap bites expressions,
        # not references)
        adc = F.aggregate(
            F.zip_with(
                F.col("pqcode"),
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda c, j: F.element_at(
                    F.col("_lut"),
                    (j * 256 + c.cast("int") + 1).cast("int"))),
            F.lit(0.0), lambda acc, x: acc + x)
        scored = joined.select(
            "query_id", F.col("id").alias("neighbor_id"),
            (adc / (F.col("_qn") * F.col("norm"))).alias("cosine"))
    else:
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
