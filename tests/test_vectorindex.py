"""Persisted IVF vector index (operators/vectorindex.py): full-probe
serving must equal ``cosine_topk`` bit-for-bit, incremental builds
must equal one-shot builds, probes must read only the probed cells'
buckets, and the n_probe recall dial is audited, never silent."""

import re

import pytest
from pyspark.sql import functions as F

from wrangle_pypes_spark.operators.similarity import cosine_topk
from wrangle_pypes_spark.operators.vectorindex import (
    build_vector_index, vector_index_stats, vector_index_topk)


@pytest.fixture(scope="module")
def emb(spark, tables):
    return (tables["embeddings"]
            .select("vec_id", "embedding").cache())


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_full_probe_equals_exact_cosine_topk(spark, emb, tmp_path):
    store = str(tmp_path / "vx")
    build_vector_index(emb, store, n_centroids=8, n_buckets=8)
    q = emb.filter(F.col("vec_id") < 15)
    got = vector_index_topk(spark, store, q, k=5, n_probe=8)
    exp = cosine_topk(emb, q, id_col="vec_id", vec_col="embedding",
                      k=5)
    assert _rows(got) == _rows(exp)  # bit-identical, incl. ties


def test_incremental_build_equals_one_shot(spark, emb, tmp_path):
    one = str(tmp_path / "one")
    inc = str(tmp_path / "inc")
    build_vector_index(emb, one, n_centroids=8, n_buckets=8)
    # the incremental store must pin the SAME quantizer the one-shot
    # fitted, or cells differ trivially: reuse its centroids — the
    # production path (fit once on a sample, reuse per batch)
    import json

    side = json.loads(open(f"{one}/_vindex.json").read())
    cents = side["centroids"]
    b1 = emb.filter(F.col("vec_id") % 2 == 0)
    b2 = emb.filter(F.col("vec_id") % 2 == 1)
    build_vector_index(b1, inc, n_centroids=8, n_buckets=8,
                       centroids=cents, epoch_id=0)
    build_vector_index(b2, inc, n_centroids=8, n_buckets=8,
                       centroids=cents, epoch_id=1)
    q = emb.filter(F.col("vec_id") < 10)
    for probe in (2, 8):
        assert _rows(vector_index_topk(spark, inc, q, k=5,
                                       n_probe=probe)) == \
            _rows(vector_index_topk(spark, one, q, k=5,
                                    n_probe=probe))


def test_probe_reads_only_probed_cells_buckets(spark, emb, tmp_path):
    """The serving payoff: a probe plans only the probed cells'
    bucket directories, never the whole store."""
    store = str(tmp_path / "pr")
    build_vector_index(emb, store, n_centroids=16, n_buckets=16)
    q = emb.filter(F.col("vec_id") == 3)
    out = vector_index_topk(spark, store, q, k=5, n_probe=2)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    counts = {int(n) for n in
              re.findall(r"InMemoryFileIndex\((\d+) paths?\)", plan)}
    assert counts and max(counts) <= 2  # <= n_probe bucket dirs


def test_recall_at_small_n_probe_audited(spark, emb, tmp_path):
    """ANN honesty: recall@5 of the pruned probe vs the exact
    baseline has a pinned floor — quality loss is measured, never
    silent."""
    store = str(tmp_path / "rc")
    build_vector_index(emb, store, n_centroids=16, n_buckets=8)
    q = emb.filter(F.col("vec_id") < 40)
    exact = {(r.query_id, r.neighbor_id) for r in
             cosine_topk(emb, q, id_col="vec_id",
                         vec_col="embedding", k=5).collect()}
    ann = {(r.query_id, r.neighbor_id) for r in
           vector_index_topk(spark, store, q, k=5,
                             n_probe=4).collect()}
    recall = len(ann & exact) / len(exact)
    assert recall >= 0.55, recall
    # probing more cells strictly helps
    ann8 = {(r.query_id, r.neighbor_id) for r in
            vector_index_topk(spark, store, q, k=5,
                              n_probe=8).collect()}
    assert len(ann8 & exact) >= len(ann & exact)


def test_quantized_store_roundtrip_recall(spark, emb, tmp_path):
    """int8 cells: 4x smaller store; the re-rank runs on the
    dequantized reconstruction and stays near-exact."""
    store = str(tmp_path / "q8")
    build_vector_index(emb, store, n_centroids=8, n_buckets=8,
                       quantize=True)
    q = emb.filter(F.col("vec_id") < 20)
    exact = {(r.query_id, r.neighbor_id) for r in
             cosine_topk(emb, q, id_col="vec_id",
                         vec_col="embedding", k=5).collect()}
    got = {(r.query_id, r.neighbor_id) for r in
           vector_index_topk(spark, store, q, k=5,
                             n_probe=8).collect()}
    assert len(got & exact) / len(exact) >= 0.9
    # the stored vectors really are int8 + scale, not doubles
    from wrangle_pypes_spark.sources.manifest import manifest_read

    sch = dict((f.name, f.dataType.simpleString())
               for f in manifest_read(spark, store).schema.fields)
    assert sch["qvec"] == "array<tinyint>" and "vec" not in sch


def test_layout_immutable_and_validation(spark, emb, tmp_path):
    store = str(tmp_path / "im")
    build_vector_index(emb, store, n_centroids=8, n_buckets=8)
    with pytest.raises(ValueError, match="immutable"):
        build_vector_index(emb, store, n_centroids=16, n_buckets=8)
    with pytest.raises(ValueError, match="immutable"):
        build_vector_index(emb, store, n_centroids=8, n_buckets=8,
                           quantize=True)
    with pytest.raises(ValueError, match="centroids"):
        build_vector_index(emb, store, n_centroids=8, n_buckets=8,
                           centroids=[[0.0] * 8] * 8)
    q = emb.limit(3)
    with pytest.raises(ValueError, match="no vector index"):
        vector_index_topk(spark, str(tmp_path / "none"), q)
    with pytest.raises(ValueError, match="k must be"):
        vector_index_topk(spark, store, q, k=0)
    st = vector_index_stats(spark, store)
    stats = st.collect()
    assert sum(r.n_vectors for r in stats) == emb.count()
    assert all(r.n_centroids == 8 for r in stats)


def test_sidecar_pinned_before_first_commit(spark, emb, tmp_path,
                                            monkeypatch):
    """Crash between sidecar write and first commit: the quantizer is
    pinned, no vectors are visible, and a re-run with the SAME params
    converges (different params fail the immutability check)."""
    import os

    import wrangle_pypes_spark.operators.vectorindex as vx_mod

    store = str(tmp_path / "crash")

    def _boom(*a, **kw):
        raise RuntimeError("injected crash before first commit")

    real = vx_mod.manifest_merge
    monkeypatch.setattr(vx_mod, "manifest_merge", _boom)
    with pytest.raises(RuntimeError, match="injected"):
        build_vector_index(emb, store, n_centroids=8, n_buckets=8)
    assert os.path.exists(os.path.join(store, "_vindex.json"))
    q = emb.limit(2)
    with pytest.raises(ValueError, match="committed"):
        vector_index_topk(spark, store, q, k=3)
    monkeypatch.setattr(vx_mod, "manifest_merge", real)
    with pytest.raises(ValueError, match="immutable"):
        build_vector_index(emb, store, n_centroids=16, n_buckets=8)
    build_vector_index(emb, store, n_centroids=8, n_buckets=8)
    got = vector_index_topk(spark, store, q, k=3, n_probe=8)
    exp = cosine_topk(emb, q, id_col="vec_id", vec_col="embedding",
                      k=3)
    assert _rows(got) == _rows(exp)


def test_streaming_maintainer_equals_one_shot(spark, emb, tmp_path):
    """Drain the embeddings as micro-batches into the index with a
    pre-fitted quantizer; the streamed store must serve exactly what
    the one-shot build serves — batch boundaries are invisible."""
    from wrangle_pypes_spark.operators.similarity import kmeans_fit
    from wrangle_pypes_spark.streaming import foreach_batch_vector_index

    cents = kmeans_fit(emb, "embedding", id_col="vec_id", k=8)
    one = str(tmp_path / "one")
    build_vector_index(emb, one, n_centroids=8, n_buckets=8,
                       centroids=cents)

    src = str(tmp_path / "src")
    emb.repartition(3).write.parquet(src)
    stream = (spark.readStream
              .schema("vec_id long, embedding array<float>")
              .option("maxFilesPerTrigger", 1).parquet(src))
    store = str(tmp_path / "sidx")
    ckpt = str(tmp_path / "ckpt")
    q = foreach_batch_vector_index(stream, store, n_centroids=8,
                                   n_buckets=8, centroids=cents,
                                   checkpoint=ckpt)
    q.awaitTermination()

    probe = emb.filter(F.col("vec_id") < 10)
    for n_probe in (2, 8):
        assert _rows(vector_index_topk(spark, store, probe, k=5,
                                       n_probe=n_probe)) == \
            _rows(vector_index_topk(spark, one, probe, k=5,
                                    n_probe=n_probe))
    # full probe over the streamed store == exact brute force
    assert _rows(vector_index_topk(spark, store, probe, k=5,
                                   n_probe=8)) == \
        _rows(cosine_topk(emb, probe, id_col="vec_id",
                          vec_col="embedding", k=5))


def test_filtered_ann_exact_at_full_probe(spark, tables, tmp_path):
    """Filtered ANN (r10): meta columns live on the index rows and a
    `where` predicate prunes candidates BEFORE the re-rank — at full
    probe the filtered result equals brute force over the filtered
    corpus, row for row, with k fully filled from the filtered set."""
    emb3 = tables["embeddings"].select("vec_id", "embedding", "label")
    store = str(tmp_path / "fvx")
    build_vector_index(emb3, store, n_centroids=8, n_buckets=8,
                       meta_cols=["label"])
    q = emb3.filter(F.col("vec_id") < 12)
    got = vector_index_topk(spark, store, q, k=5, n_probe=8,
                            where="label = 2")
    exp = cosine_topk(emb3.filter(F.col("label") == 2), q,
                      id_col="vec_id", vec_col="embedding", k=5)
    assert _rows(got) == _rows(exp)
    # every neighbor really satisfies the predicate
    labels = {r.label for r in
              emb3.join(got.select(F.col("neighbor_id")
                                   .alias("vec_id")), "vec_id")
              .select("label").collect()}
    assert labels == {2}

    # validation: filtered query against a meta-less store refuses
    bare = str(tmp_path / "bare")
    build_vector_index(emb3.select("vec_id", "embedding"), bare,
                       n_centroids=8, n_buckets=8)
    with pytest.raises(ValueError, match="meta_cols"):
        vector_index_topk(spark, bare, q, where="label = 2")
    # reserved/missing meta col names fail loudly at build
    with pytest.raises(ValueError, match="reserved"):
        build_vector_index(emb3.withColumnRenamed("label", "norm"),
                           str(tmp_path / "x1"), n_centroids=8,
                           meta_cols=["norm"])
    with pytest.raises(ValueError, match="lacks meta_cols"):
        build_vector_index(emb3, str(tmp_path / "x2"), n_centroids=8,
                           meta_cols=["nope"])
    # layout immutability covers meta_cols too
    with pytest.raises(ValueError, match="immutable"):
        build_vector_index(emb3, store, n_centroids=8, n_buckets=8,
                           meta_cols=[])


def test_rejected_build_pins_no_sidecar(spark, tables, tmp_path):
    """Validation precedes the sidecar write: a rejected build leaves
    NO pinned layout, so the corrected retry builds cleanly instead
    of tripping the immutability check on a garbage sidecar."""
    import os

    emb3 = tables["embeddings"].select("vec_id", "embedding", "label")
    store = str(tmp_path / "rj")
    with pytest.raises(ValueError, match="lacks meta_cols"):
        build_vector_index(emb3, store, n_centroids=8,
                           meta_cols=["nope"])
    assert not os.path.exists(os.path.join(store, "_vindex.json"))
    build_vector_index(emb3, store, n_centroids=8, n_buckets=8,
                       meta_cols=["label"])
    got = vector_index_topk(spark, store, emb3.limit(3), k=3,
                            n_probe=8, where="label = 0")
    assert got.count() > 0


def test_pq_store_adc_recall_and_schema(spark, emb, tmp_path):
    """r11 product quantization: the store holds m byte-sized codes +
    the reconstruction norm (never the vector), the probe scores by
    ADC table additions, and recall vs the exact baseline carries a
    pinned floor — the FAISS IVF-PQ layout on the manifest store."""
    store = str(tmp_path / "pq")
    build_vector_index(emb, store, n_centroids=8, n_buckets=8,
                       pq_m=8)
    q = emb.filter(F.col("vec_id") < 20)
    exact = {(r.query_id, r.neighbor_id) for r in
             cosine_topk(emb, q, id_col="vec_id",
                         vec_col="embedding", k=5).collect()}
    got = vector_index_topk(spark, store, q, k=5, n_probe=8)
    rows = got.collect()
    hits = {(r.query_id, r.neighbor_id) for r in rows}
    assert len(hits & exact) / len(exact) >= 0.6  # pinned ADC floor
    # every query returns exactly k, cosines in [-1, 1 + eps]
    from collections import Counter

    per_q = Counter(r.query_id for r in rows)
    assert all(v == 5 for v in per_q.values()) and len(per_q) == 20
    assert all(-1.001 <= r.cosine <= 1.001 for r in rows)
    # the stored rows really are codes + norm, no vectors
    from wrangle_pypes_spark.sources.manifest import manifest_read

    sch = dict((f.name, f.dataType.simpleString())
               for f in manifest_read(spark, store).schema.fields)
    assert sch["pqcode"] == "array<smallint>"
    assert "vec" not in sch and "qvec" not in sch
    # ADC == cosine against the codebook reconstruction (exact for
    # the codec): rebuild the reconstruction in numpy and compare
    import json

    import numpy as np

    side = json.loads(open(f"{store}/_vindex.json").read())
    books = [np.asarray(b) for b in side["pq_codebooks"]]
    sub = books[0].shape[1]
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    codes = {r.id: r.pqcode for r in
             manifest_read(spark, store).select("id", "pqcode")
             .collect()}
    checked = 0
    for r in rows[:50]:
        qv = vecs[r.query_id]
        rec = np.concatenate([books[j][codes[r.neighbor_id][j]]
                              for j in range(len(books))])
        want = float(qv @ rec / (np.linalg.norm(qv)
                                 * np.linalg.norm(rec)))
        assert abs(want - r.cosine) < 1e-9, (r, want)
        checked += 1
    assert checked > 0


def test_pq_layout_immutable_and_validation(spark, emb, tmp_path):
    store = str(tmp_path / "pqv")
    with pytest.raises(ValueError, match="mutually exclusive"):
        build_vector_index(emb, store, pq_m=8, quantize=True)
    with pytest.raises(ValueError, match="divide"):
        build_vector_index(emb, store, pq_m=7)  # 64 % 7 != 0
    import os

    assert not os.path.exists(f"{store}/_vindex.json")  # no pin
    build_vector_index(emb, store, n_centroids=8, n_buckets=8,
                       pq_m=8, epoch_id=0)
    with pytest.raises(ValueError, match="immutable"):
        build_vector_index(emb, store, n_centroids=8, n_buckets=8,
                           pq_m=4, epoch_id=1)
    with pytest.raises(ValueError, match="immutable"):
        build_vector_index(emb, store, n_centroids=8, n_buckets=8,
                           epoch_id=1)  # pq store, pq_m omitted


def test_pq_incremental_equals_one_shot(spark, emb, tmp_path):
    """Codebooks pin with the first batch; later batches encode under
    the SAME codebooks, so incremental == one-shot exactly."""
    one = str(tmp_path / "pone")
    inc = str(tmp_path / "pinc")
    b1 = emb.filter(F.col("vec_id") % 2 == 0)
    b2 = emb.filter(F.col("vec_id") % 2 == 1)
    # one-shot fits on b1 too (fit set must match for equality)
    build_vector_index(b1, one, n_centroids=8, n_buckets=8, pq_m=8,
                       epoch_id=0)
    build_vector_index(b2, one, n_centroids=8, n_buckets=8, pq_m=8,
                       epoch_id=1)
    build_vector_index(b1, inc, n_centroids=8, n_buckets=8, pq_m=8,
                       epoch_id=0)
    build_vector_index(b2, inc, n_centroids=8, n_buckets=8, pq_m=8,
                       epoch_id=1)
    q = emb.filter(F.col("vec_id") < 10)
    assert _rows(vector_index_topk(spark, one, q, k=5, n_probe=8)) \
        == _rows(vector_index_topk(spark, inc, q, k=5, n_probe=8))


def test_pq_filtered_where_composes(spark, tables, tmp_path):
    """meta_cols + where work unchanged on a PQ store: the predicate
    prunes candidates before ADC scoring."""
    emb3 = tables["embeddings"].select("vec_id", "embedding", "label")
    store = str(tmp_path / "pqf")
    build_vector_index(emb3, store, n_centroids=8, n_buckets=8,
                       pq_m=8, meta_cols=["label"])
    q = emb3.filter(F.col("vec_id") < 10)
    out = vector_index_topk(spark, store, q, k=5, n_probe=8,
                            where="label >= 5").collect()
    labels = {r.vec_id: r.label for r in emb3.collect()}
    assert out and all(labels[r.neighbor_id] >= 5 for r in out)
