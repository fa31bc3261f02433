"""Inverted token index (operators/textindex.py): index-resident BM25
must equal the full-scan ``bm25_scores`` bit-for-bit, incremental
builds must equal one-shot builds, and lookups must touch only the
probed tokens' buckets."""

import re

import pytest
from pyspark.sql import functions as F

from wrangle_pypes_spark.functions.text import bm25_scores
from wrangle_pypes_spark.operators.textindex import (
    STATS_KEY, build_text_index, index_stats, text_index_search)

DOCS = [
    (1, "spark shuffles data across the cluster"),
    (2, "window functions sort within partitions"),
    (3, "spark spark spark shuffle shuffle window"),
    (4, "a completely unrelated document about cats"),
    (5, ""),  # zero tokens: still counts toward N / avgdl
    (6, "shuffle partitions size the spark shuffle"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_search_equals_full_scan_bm25(spark, tmp_path):
    docs = _docs(spark)
    store = str(tmp_path / "idx")
    build_text_index(docs, store, n_buckets=8)
    for terms in (["spark", "shuffle", "window"],
                  ["spark"],
                  ["cats", "partitions"],
                  ["nosuchterm", "spark"],
                  ["nosuchterm"]):
        got = _rows(text_index_search(spark, store, terms))
        exp = _rows(bm25_scores(docs, terms))
        assert got == exp, f"mismatch for {terms}"


def test_incremental_build_equals_one_shot(spark, tmp_path):
    docs = _docs(spark)
    one = str(tmp_path / "one")
    inc = str(tmp_path / "inc")
    build_text_index(docs, one, n_buckets=8)
    build_text_index(docs.filter(F.col("doc_id") <= 3), inc,
                     n_buckets=8, epoch_id=0)
    build_text_index(docs.filter(F.col("doc_id") > 3), inc,
                     n_buckets=8, epoch_id=1)
    terms = ["spark", "shuffle", "window", "cats"]
    assert _rows(text_index_search(spark, inc, terms)) == \
        _rows(text_index_search(spark, one, terms))
    # and both equal the corpus scan
    assert _rows(text_index_search(spark, inc, terms)) == \
        _rows(bm25_scores(docs, terms))


def test_stop_tokens_excluded_and_stats(spark, tmp_path):
    docs = _docs(spark)
    store = str(tmp_path / "stp")
    build_text_index(docs, store, n_buckets=8,
                     stop_tokens=["the", "a", "SPARK"])
    st = index_stats(spark, store, top=50)
    toks = {r.token for r in st.collect()}
    assert "the" not in toks and "spark" not in toks
    assert "shuffle" in toks
    # a stopped query term simply contributes nothing
    got = text_index_search(spark, store, ["spark", "shuffle"])
    assert all(r.n_terms_hit == 1 for r in got.collect())


def test_search_validation_and_empty_results(spark, tmp_path):
    docs = _docs(spark)
    store = str(tmp_path / "v")
    with pytest.raises(ValueError, match="no index"):
        text_index_search(spark, str(tmp_path / "missing"), ["x"])
    build_text_index(docs, store, n_buckets=8)
    with pytest.raises(ValueError, match="non-empty"):
        text_index_search(spark, store, [])
    out = text_index_search(spark, store, ["zzz_not_there"])
    assert out.count() == 0
    assert out.columns == ["doc_id", "n_terms_hit", "bm25"]


def test_lookup_prunes_to_probed_buckets(spark, tmp_path):
    """The serving claim: a search's scan holds only the probed
    tokens' bucket directories, never the whole index."""
    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i + 1} common") for i in range(200)],
        "doc_id int, text string")
    store = str(tmp_path / "p")
    build_text_index(docs, store, n_buckets=32)
    q = text_index_search(spark, store, ["tok7", "tok9"])
    q.collect()
    plan = q._jdf.queryExecution().executedPlan().toString()
    counts = [int(n) for n in
              re.findall(r"InMemoryFileIndex\((\d+) paths?\)", plan)]
    assert counts and max(counts) <= 3  # 2 terms + stats row


def test_zero_token_docs_count_toward_corpus_stats(spark, tmp_path):
    """Dropping doc 5 (empty text) from the index would shift N and
    avgdl and every score; parity with bm25_scores pins this, but
    assert the stats row directly too."""
    from wrangle_pypes_spark.sources.manifest import manifest_read

    docs = _docs(spark)
    store = str(tmp_path / "z")
    build_text_index(docs, store, n_buckets=8)
    stats = (manifest_read(spark, store)
             .filter(F.col("token") == STATS_KEY).collect()[0])
    assert stats.n_docs == 6
    assert stats.sum_dl == sum(len(t.split()) for _, t in DOCS)


def test_streaming_maintainer_equals_one_shot(spark, tmp_path):
    from wrangle_pypes_spark.streaming import foreach_batch_text_index

    docs = _docs(spark)
    src = str(tmp_path / "src")
    docs.repartition(3).write.parquet(src)
    stream = (spark.readStream.schema("doc_id int, text string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    store = str(tmp_path / "sidx")
    ckpt = str(tmp_path / "ckpt")
    q = foreach_batch_text_index(stream, store, n_buckets=8,
                                 checkpoint=ckpt)
    q.awaitTermination()
    terms = ["spark", "shuffle", "window", "cats"]
    assert _rows(text_index_search(spark, store, terms)) == \
        _rows(bm25_scores(docs, terms))

    # replay with the SAME checkpoint: nothing new, store unchanged
    from wrangle_pypes_spark.sources.manifest import manifest_current
    before = manifest_current(store)
    stream2 = (spark.readStream.schema("doc_id int, text string")
               .option("maxFilesPerTrigger", 1).parquet(src))
    q2 = foreach_batch_text_index(stream2, store, n_buckets=8,
                                  checkpoint=ckpt)
    q2.awaitTermination()
    assert manifest_current(store) == before

    # resume-without-checkpoint warns (the monotonic-batch-id trap)
    with pytest.warns(UserWarning, match="WITHOUT a checkpoint"):
        stream3 = (spark.readStream.schema("doc_id int, text string")
                   .option("maxFilesPerTrigger", 1).parquet(src))
        q3 = foreach_batch_text_index(stream3, store, n_buckets=8)
        q3.awaitTermination()


def test_search_max_df_skips_hot_terms(spark, tmp_path):
    """A stopword-grade query term is skipped by max_df BEFORE its
    postings explode: scores equal a query without the term, and
    n_terms_hit excludes it."""
    docs = spark.createDataFrame(
        [(i, f"common tok{i}") for i in range(50)],
        "doc_id int, text string")
    store = str(tmp_path / "hot")
    build_text_index(docs, store, n_buckets=8)

    with_hot = _rows(text_index_search(spark, store,
                                       ["common", "tok7"], max_df=10))
    without = _rows(text_index_search(spark, store, ["tok7"]))
    assert with_hot == without  # 'common' (df=50) skipped entirely

    # no cap: the hot term participates for every doc
    full = text_index_search(spark, store, ["common", "tok7"])
    assert full.count() == 50

    import pytest as _pt
    with _pt.raises(ValueError, match="max_df"):
        text_index_search(spark, store, ["x"], max_df=0)
