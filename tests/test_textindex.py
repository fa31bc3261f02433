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
    # the streamed store carries block metadata too: block-max top-k
    # over it equals the full-scan sorted cut
    from wrangle_pypes_spark.operators.textindex import text_index_topk
    got = [tuple(r) for r in
           text_index_topk(spark, store, terms, 3).collect()]
    got.sort(key=lambda r: (-r[2], r[0]))
    assert got == _topk_expected(docs, terms, 3)

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

# ------------------------------------------------- block-split postings

def test_blocked_index_bit_identical_with_planted_hot_token(
        spark, tmp_path):
    """VERDICT r8 #2: a planted stopword-grade token ('common' in
    every doc) with a block_limit small enough to force splits —
    search must stay bit-identical to the full-scan bm25_scores, and
    no stored row may exceed block_limit postings."""
    from wrangle_pypes_spark.sources.manifest import manifest_read

    docs = spark.createDataFrame(
        [(i, f"common tok{i} tok{i % 7}") for i in range(100)],
        "doc_id int, text string")
    store = str(tmp_path / "blk")
    build_text_index(docs, store, n_buckets=8, block_limit=16)

    rows = manifest_read(spark, store).collect()
    sizes = {}
    for r in rows:
        assert len(r.postings) <= 16, (r.token, r.block)
        sizes.setdefault(r.token, []).append(len(r.postings))
    # the hot token really did split into multiple bounded blocks
    assert len(sizes["common"]) == 7 and sum(sizes["common"]) == 100
    # blocks partition the postings: df on every row is the total
    for r in rows:
        if r.token == "common":
            assert r.df == 100
    # invariant: at most one underfull block per token
    for tok, ss in sizes.items():
        if tok != STATS_KEY:
            assert sum(1 for s in ss if s < 16) <= 1, (tok, ss)

    for terms in (["common"], ["common", "tok3"], ["tok5"],
                  ["common", "tok1", "nosuch"]):
        assert _rows(text_index_search(spark, store, terms)) == \
            _rows(bm25_scores(docs, terms)), terms


def test_blocked_incremental_merge_bounded_and_exact(spark, tmp_path):
    """Incremental folds re-chunk only underfull blocks: after many
    small batches every row stays bounded, at most one underfull
    block per token survives, and search equals the one-shot scan."""
    from wrangle_pypes_spark.sources.manifest import manifest_read

    docs = spark.createDataFrame(
        [(i, "common " + ("alpha " if i % 2 else "beta ") + f"tok{i}")
         for i in range(60)],
        "doc_id int, text string")
    store = str(tmp_path / "inc")
    for e, lo in enumerate(range(0, 60, 12)):
        build_text_index(
            docs.filter((F.col("doc_id") >= lo)
                        & (F.col("doc_id") < lo + 12)),
            store, n_buckets=8, block_limit=8, epoch_id=e)

    rows = manifest_read(spark, store).collect()
    per_tok = {}
    for r in rows:
        assert len(r.postings) <= 8, (r.token, r.block)
        per_tok.setdefault(r.token, []).append(len(r.postings))
    assert sum(per_tok["common"]) == 60
    for tok, ss in per_tok.items():
        if tok != STATS_KEY:
            assert sum(1 for s in ss if s < 8) <= 1, (tok, ss)
    # block ids are 0..k within each token
    blocks = {}
    for r in rows:
        blocks.setdefault(r.token, []).append(r.block)
    for tok, bs in blocks.items():
        assert sorted(bs) == list(range(len(bs))), (tok, bs)

    terms = ["common", "alpha", "beta", "tok3"]
    assert _rows(text_index_search(spark, store, terms)) == \
        _rows(bm25_scores(docs, terms))


def test_merge_accepts_pre_blocksplit_stored_rows(spark):
    """A store written by the r8 (one-row-per-token) format lacks the
    block column; the first post-upgrade merge treats those rows as
    block 0 and re-chunks them under the limit."""
    from wrangle_pypes_spark.operators.textindex import (merge_postings,
                                                         postings_frame)

    docs = spark.createDataFrame(
        [(i, "common") for i in range(20)], "doc_id int, text string")
    new = postings_frame(docs, block_limit=4).localCheckpoint()
    old = (postings_frame(
        spark.createDataFrame([(100 + i, "common rare") for i in range(8)],
                              "doc_id int, text string"),
        block_limit=10 ** 6).drop("block"))  # legacy shape: no block col
    out = merge_postings(old, new, block_limit=4).collect()
    per = {}
    for r in out:
        assert len(r.postings) <= 4
        per.setdefault(r.token, 0)
        per[r.token] += len(r.postings)
    assert per["common"] == 28 and per["rare"] == 8
    stats = [r for r in out if r.token == STATS_KEY][0]
    assert stats.n_docs == 28


def test_derive_stop_tokens(spark, tmp_path):
    from wrangle_pypes_spark.operators.textindex import derive_stop_tokens

    docs = spark.createDataFrame(
        [(i, f"common tok{i}" + (" semi" if i < 30 else ""))
         for i in range(50)],
        "doc_id int, text string")
    store = str(tmp_path / "stp")
    build_text_index(docs, store, n_buckets=8, block_limit=16)
    assert derive_stop_tokens(spark, store, max_df_frac=0.9) == ["common"]
    assert derive_stop_tokens(spark, store, max_df_frac=0.5) == \
        ["common", "semi"]
    with pytest.raises(ValueError, match="max_df_frac"):
        derive_stop_tokens(spark, store, max_df_frac=0.0)
    with pytest.raises(ValueError, match="supposed to be small"):
        derive_stop_tokens(spark, store, max_df_frac=0.01, limit=3)
    # the derived list plugs straight back into a rebuild
    store2 = str(tmp_path / "re")
    build_text_index(docs, store2, n_buckets=8,
                     stop_tokens=derive_stop_tokens(
                         spark, store, max_df_frac=0.9))
    toks = {r.token for r in index_stats(spark, store2, top=100).collect()}
    assert "common" not in toks and "semi" in toks


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# random batch sequences over a tiny vocabulary: doc text = words
# drawn from 6 tokens, docs split across 1-4 batches
_doc_strategy = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
             min_size=0, max_size=8),
    min_size=1, max_size=14).map(
        lambda docs: [(i, " ".join(ws)) for i, ws in enumerate(docs)])


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_doc_strategy, cuts=st.lists(st.integers(1, 13),
                                         max_size=3),
       block_limit=st.sampled_from([1, 2, 3, 5]))
def test_property_blocked_incremental_equals_one_shot(
        spark, tmp_path_factory, docs, cuts, block_limit):
    """Random docs / batch boundaries / block limits: the incremental
    blocked index always equals the one-shot build AND the full-scan
    BM25, every stored row stays within block_limit, and at most one
    underfull block per token survives each merge."""
    from wrangle_pypes_spark.sources.manifest import manifest_read

    base = tmp_path_factory.mktemp("prop_tidx")
    frame = spark.createDataFrame(docs, "doc_id int, text string")
    bounds = sorted({c for c in cuts if c < len(docs)})
    slices = []
    prev = 0
    for b in bounds + [len(docs)]:
        if b > prev:
            slices.append((prev, b))
            prev = b
    inc = str(base / "inc")
    for e, (lo, hi) in enumerate(slices):
        build_text_index(
            frame.filter((F.col("doc_id") >= lo)
                         & (F.col("doc_id") < hi)),
            inc, n_buckets=4, block_limit=block_limit, epoch_id=e)

    rows = manifest_read(spark, inc).collect()
    per_tok: dict = {}
    for r in rows:
        assert len(r.postings) <= block_limit, (r.token, r.block)
        per_tok.setdefault(r.token, []).append(len(r.postings))
    for tok, sizes in per_tok.items():
        if tok != STATS_KEY:
            assert sum(1 for s in sizes if s < block_limit) <= 1, \
                (tok, sizes)

    terms = ["aa", "bb", "cc", "dd", "ee", "ff"]
    got = _rows(text_index_search(spark, inc, terms))
    assert got == _rows(bm25_scores(frame, terms))


# --------------------------------------------------- block-max top-k

def _topk_expected(docs, terms, k):
    """Full-scan reference: bm25_scores sorted by (rounded bm25 desc,
    doc asc), first k — the contract text_index_topk must match."""
    rows = bm25_scores(docs, terms).collect()
    rows.sort(key=lambda r: (-r.bm25, r.doc_id))
    return [tuple(r) for r in rows[:k]]


def test_topk_exact_vs_full_search_with_hot_token(spark, tmp_path):
    """Block-max pruning is exact, never a recall trade: identical
    rows to the full search's sorted top-k, on a corpus with a
    planted stopword-grade token and a block_limit forcing splits."""
    docs = spark.createDataFrame(
        [(i, f"common tok{i % 23} rare{i % 97}") for i in range(400)],
        "doc_id int, text string")
    store = str(tmp_path / "tk")
    build_text_index(docs, store, n_buckets=8, block_limit=16)
    from wrangle_pypes_spark.operators.textindex import text_index_topk

    for terms, k in ((["common", "tok3"], 5),
                     (["common", "rare7", "tok3"], 10),
                     (["rare13"], 3),
                     (["common"], 7),
                     (["nosuch", "tok5"], 4)):
        got = [tuple(r) for r in
               text_index_topk(spark, store, terms, k).collect()]
        got.sort(key=lambda r: (-r[2], r[0]))
        assert got == _topk_expected(docs, terms, k), (terms, k)

    # k exceeding the match count: every matching doc returned
    got = text_index_topk(spark, store, ["rare13"], 1000).collect()
    assert len(got) == len(_topk_expected(docs, ["rare13"], 1000))


def test_topk_planner_prunes_hot_blocks(spark, tmp_path):
    """The pruning is REAL: with a discriminative rare term setting a
    high theta, most of the hot term's bounded blocks drop; and the
    planner's bound logic is safe (every kept-set score run equals
    the unpruned run)."""
    import math

    from wrangle_pypes_spark.operators.textindex import (
        _plan_topk_blocks, text_index_topk)
    from wrangle_pypes_spark.sources.manifest import manifest_read

    # hot term everywhere; rare term in 5 docs which also carry a
    # high-tf discriminator
    docs = spark.createDataFrame(
        [(i, "common " + ("special special special " if i < 5 else "")
          + f"filler{i % 11}") for i in range(600)],
        "doc_id int, text string")
    store = str(tmp_path / "pl")
    build_text_index(docs, store, n_buckets=8, block_limit=32)

    rows = manifest_read(spark, store).collect()
    metas = [{"token": r.token, "block": r.block, "df": r.df,
              "max_tf": r.max_tf, "min_dl": r.min_dl,
              "min_doc": r.min_doc, "max_doc": r.max_doc}
             for r in rows if r.token in ("common", "special")]
    n_docs = next(r.n_docs for r in rows if r.token == "")
    avgdl = next(r.sum_dl for r in rows if r.token == "") / n_docs
    # theta at the level only special-carrying docs can reach
    idf_s = math.log(1 + (n_docs - 5 + 0.5) / (5 + 0.5))
    theta = idf_s  # well above any common-only doc's possible total
    kept, pruned = _plan_topk_blocks(metas, theta, k1=1.2, b=0.75,
                                     n_docs=n_docs, avgdl=avgdl)
    n_common = sum(1 for m in metas if m["token"] == "common")
    kept_common = sum(1 for t, _ in kept if t == "common")
    assert pruned > 0 and kept_common < n_common
    # the blocks covering the special docs' range survive for scoring
    assert any(t == "common" for t, _ in kept)

    # end-to-end: the pruned path equals the full search's sorted cut
    got = [tuple(r) for r in
           text_index_topk(spark, store, ["common", "special"],
                           5).collect()]
    got.sort(key=lambda r: (-r[2], r[0]))
    assert got == _topk_expected(docs, ["common", "special"], 5)
    assert all(r[0] < 5 for r in got)  # the special docs win


def test_topk_planner_overlapping_ranges_bound(spark):
    """ADVICE r10: a term's block doc ranges OVERLAP after incremental
    merges (the re-chunked underfull tail spans the passed-through
    full blocks), so the max_doc list sorted by min_doc is NOT
    sorted.  The planner must still include the wide block's ub in
    the cross-term bound — the old bisect-on-max under-bounded and
    pruned a block holding a true top-k posting."""
    import math

    from wrangle_pypes_spark.operators.textindex import _plan_topk_blocks

    n_docs, avgdl, k1, b = 1000, 10.0, 1.2, 0.75

    def idf(df_):
        return math.log(1.0 + (n_docs - df_ + 0.5) / (df_ + 0.5))

    def ub(df_, max_tf, min_dl):
        return (idf(df_) * (max_tf * (k1 + 1))
                / (max_tf + k1 * (1 - b + b * min_dl / avgdl)))

    # t2's blocks sorted by min_doc: a WIDE re-chunked block (0..1000,
    # high ub) followed by a narrow full block (10..20, low ub) — the
    # max_doc list [1000, 20] is unsorted, the old bisect for
    # lo=500 skipped the wide block entirely
    metas = [
        {"token": "t1", "block": 0, "df": 50, "max_tf": 1,
         "min_dl": 10, "min_doc": 500, "max_doc": 600},
        {"token": "t2", "block": 1, "df": 100, "max_tf": 5,
         "min_dl": 5, "min_doc": 0, "max_doc": 1000},
        {"token": "t2", "block": 0, "df": 100, "max_tf": 1,
         "min_dl": 10, "min_doc": 10, "max_doc": 20},
    ]
    ub1 = ub(50, 1, 10)
    ub_wide = ub(100, 5, 5)
    # theta between t1-alone and t1 + the wide overlapping t2 block:
    # correct planning must KEEP t1's block (a doc in 500..600 can
    # reach ub1 + ub_wide); under-bounding pruned it
    theta = ub1 + 0.5 * ub_wide
    kept, _ = _plan_topk_blocks(metas, theta, k1=k1, b=b,
                                n_docs=n_docs, avgdl=avgdl)
    assert ("t1", 0) in kept
    # and a genuinely unreachable block still prunes (theta above
    # everything t1 + t2 could ever sum to)
    kept2, pruned2 = _plan_topk_blocks(
        metas, ub1 + ub_wide + ub(100, 1, 10) + 1.0, k1=k1, b=b,
        n_docs=n_docs, avgdl=avgdl)
    assert ("t1", 0) not in kept2 and pruned2 > 0


def test_topk_incremental_overlapping_blocks(spark, tmp_path):
    """ADVICE r10 end-to-end: build the index INCREMENTALLY with
    interleaved, non-monotonic doc ids so merge_postings really
    produces overlapping block ranges, then pin the exactness claim
    against the full-scan cut on that store."""
    from wrangle_pypes_spark.operators.textindex import text_index_topk
    from wrangle_pypes_spark.sources.manifest import manifest_read

    def _text(i):
        return (f"aa tok{i % 7} {'cc' if i % 3 == 0 else 'dd'} "
                f"rare{i % 53}")

    b1 = spark.createDataFrame(
        [(i, _text(i)) for i in range(0, 400, 2)],
        "doc_id int, text string")
    b2 = spark.createDataFrame(
        [(i, _text(i)) for i in range(1, 400, 2)],
        "doc_id int, text string")
    store = str(tmp_path / "ovl")
    build_text_index(b1, store, n_buckets=4, block_limit=8, epoch_id=0)
    build_text_index(b2, store, n_buckets=4, block_limit=8, epoch_id=1)

    # the hazard precondition really holds: the hot term's block doc
    # ranges overlap (batch 2's odd ids interleave batch 1's evens)
    ranges = sorted(
        (r.min_doc, r.max_doc) for r in
        manifest_read(spark, store).filter(F.col("token") == "aa")
        .select("min_doc", "max_doc").collect())
    assert len(ranges) > 2
    assert any(ranges[i][1] >= ranges[i + 1][0]
               for i in range(len(ranges) - 1)), ranges

    docs = b1.unionByName(b2)
    for terms, k in ((["aa", "rare7"], 5),
                     (["aa", "cc", "tok3"], 10),
                     (["cc", "rare13"], 7),
                     (["aa"], 4)):
        got = [tuple(r) for r in
               text_index_topk(spark, store, terms, k).collect()]
        got.sort(key=lambda r: (-r[2], r[0]))
        assert got == _topk_expected(docs, terms, k), (terms, k)


def test_topk_legacy_store_and_validation(spark, tmp_path):
    """A store committed before the block-meta columns derives them on
    read; argument validation fails loudly."""
    from wrangle_pypes_spark.operators.textindex import text_index_topk
    from wrangle_pypes_spark.sources.manifest import (manifest_merge,
                                                      manifest_read)

    docs = spark.createDataFrame(
        [(i, f"alpha beta tok{i % 5}") for i in range(60)],
        "doc_id int, text string")
    store = str(tmp_path / "lg")
    build_text_index(docs, store, n_buckets=4, block_limit=8)
    # strip the meta columns, as an r9-early store would look
    legacy = manifest_read(spark, store).select(
        "token", "block", "postings", "df", "n_docs", "sum_dl") \
        .localCheckpoint()
    store2 = str(tmp_path / "lg2")
    manifest_merge(legacy, store2, ["token"], n_buckets=4)
    got = [tuple(r) for r in
           text_index_topk(spark, store2, ["alpha", "tok2"],
                           4).collect()]
    got.sort(key=lambda r: (-r[2], r[0]))
    assert got == _topk_expected(docs, ["alpha", "tok2"], 4)

    # a TRUE pre-block (r8) store also lacks the 'block' column: the
    # shim must default it, not raise (ADVICE r10).  Its single row
    # per token requires re-flattening postings into one array.
    pre = (manifest_read(spark, store)
           .groupBy("token")
           .agg(F.array_sort(F.flatten(F.collect_list("postings")))
                .alias("postings"),
                F.max("df").alias("df"),
                F.max("n_docs").alias("n_docs"),
                F.max("sum_dl").alias("sum_dl"))
           .localCheckpoint())
    store3 = str(tmp_path / "lg3")
    manifest_merge(pre, store3, ["token"], n_buckets=4)
    got = [tuple(r) for r in
           text_index_topk(spark, store3, ["alpha", "tok2"],
                           4).collect()]
    got.sort(key=lambda r: (-r[2], r[0]))
    assert got == _topk_expected(docs, ["alpha", "tok2"], 4)

    with pytest.raises(ValueError, match="k must be"):
        text_index_topk(spark, store, ["x"], 0)
    with pytest.raises(ValueError, match="non-empty"):
        text_index_topk(spark, store, [], 5)
    with pytest.raises(ValueError, match="no index"):
        text_index_topk(spark, str(tmp_path / "none"), ["x"], 5)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_doc_strategy,
       k=st.integers(1, 8),
       block_limit=st.sampled_from([1, 2, 4]),
       terms=st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "zz"]),
                      min_size=1, max_size=4))
def test_property_topk_equals_full_sorted_cut(
        spark, tmp_path_factory, docs, k, block_limit, terms):
    """Fuzz the block-max exactness claim: random corpora, ks, block
    limits, and term sets (including absent terms) — the pruned top-k
    always equals the full search sorted by (bm25 desc, id) cut at
    k."""
    from wrangle_pypes_spark.operators.textindex import text_index_topk

    base = tmp_path_factory.mktemp("prop_topk")
    frame = spark.createDataFrame(docs, "doc_id int, text string")
    store = str(base / "idx")
    build_text_index(frame, store, n_buckets=4,
                     block_limit=block_limit)
    full = [tuple(r) for r in
            text_index_search(spark, store, terms).collect()]
    full.sort(key=lambda r: (-r[2], r[0]))
    got = [tuple(r) for r in
           text_index_topk(spark, store, terms, k).collect()]
    got.sort(key=lambda r: (-r[2], r[0]))
    assert got == full[:k], (terms, k, block_limit)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_doc_strategy,
       k=st.integers(1, 6),
       block_limit=st.sampled_from([1, 2, 3]),
       parity=st.integers(2, 3),
       terms=st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "zz"]),
                      min_size=1, max_size=3))
def test_property_topk_exact_on_incremental_stores(
        spark, tmp_path_factory, docs, k, block_limit, parity, terms):
    """Fuzz the ADVICE r10 fix: split random corpora into interleaved
    batches (doc_id % parity), so incremental merges re-chunk
    underfull tails into blocks whose doc ranges OVERLAP the
    passed-through full blocks.  The pruned top-k over the resulting
    store must still equal the full search's sorted cut — for every
    random corpus, split, block limit, and term set."""
    from wrangle_pypes_spark.operators.textindex import text_index_topk

    base = tmp_path_factory.mktemp("prop_topk_inc")
    frame = spark.createDataFrame(docs, "doc_id int, text string")
    store = str(base / "idx")
    for i in range(parity):
        batch = frame.filter(F.col("doc_id") % parity == i)
        build_text_index(batch, store, n_buckets=4,
                         block_limit=block_limit, epoch_id=i)
    full = [tuple(r) for r in
            text_index_search(spark, store, terms).collect()]
    full.sort(key=lambda r: (-r[2], r[0]))
    got = [tuple(r) for r in
           text_index_topk(spark, store, terms, k).collect()]
    got.sort(key=lambda r: (-r[2], r[0]))
    assert got == full[:k], (terms, k, block_limit, parity)


# ------------------------------------------------------ phrase search

def _phrase_expected(docs, phrase):
    """Brute-force reference: count consecutive-token occurrences in
    the lowercased whitespace token stream of every doc."""
    want = [t.lower() for t in phrase.split()]
    out = {}
    for doc_id, text in docs:
        toks = [t for t in text.lower().split() if t != ""]
        n = sum(1 for i in range(len(toks) - len(want) + 1)
                if toks[i:i + len(want)] == want)
        if n > 0:
            out[doc_id] = n
    return out


def test_phrase_search_exact_counts(spark, tmp_path):
    docs = [
        (1, "spark shuffles data and spark shuffles data again"),
        (2, "shuffles spark data"),
        (3, "spark spark shuffles data"),
        (4, "spark shuffles"),
        (5, ""),
        (6, "the spark shuffles data the spark shuffles data"),
    ]
    frame = spark.createDataFrame(docs, "doc_id int, text string")
    store = str(tmp_path / "ph")
    build_text_index(frame, store, n_buckets=8, with_positions=True,
                     block_limit=4)
    from wrangle_pypes_spark.operators.textindex import (
        text_index_phrase)

    for phrase in ("spark shuffles data", "spark shuffles",
                   "spark spark", "shuffles data again",
                   "data spark", "nosuch phrase"):
        got = {r.doc_id: r.n_occurrences for r in
               text_index_phrase(spark, store, phrase).collect()}
        assert got == _phrase_expected(docs, phrase), phrase
    # single-token phrase = tf
    got = {r.doc_id: r.n_occurrences for r in
           text_index_phrase(spark, store, "spark").collect()}
    assert got == _phrase_expected(docs, "spark")


def test_phrase_search_incremental_and_validation(spark, tmp_path):
    docs = [(i, f"alpha beta gamma tok{i % 5} alpha beta")
            for i in range(60)]
    frame = spark.createDataFrame(docs, "doc_id int, text string")
    store = str(tmp_path / "phi")
    build_text_index(frame.filter(F.col("doc_id") % 2 == 0), store,
                     n_buckets=4, with_positions=True, block_limit=8,
                     epoch_id=0)
    build_text_index(frame.filter(F.col("doc_id") % 2 == 1), store,
                     n_buckets=4, with_positions=True, block_limit=8,
                     epoch_id=1)
    from wrangle_pypes_spark.operators.textindex import (
        text_index_phrase)

    got = {r.doc_id: r.n_occurrences for r in
           text_index_phrase(spark, store, "alpha beta").collect()}
    assert got == _phrase_expected(docs, "alpha beta")
    assert all(v == 2 for v in got.values()) and len(got) == 60
    # positional layout does not disturb BM25 serving on the store
    assert _rows(text_index_search(spark, store, ["alpha", "tok3"])) \
        == _rows(bm25_scores(frame, ["alpha", "tok3"]))

    # a non-positional store refuses phrase queries loudly
    store2 = str(tmp_path / "nopos")
    build_text_index(frame, store2, n_buckets=4)
    with pytest.raises(ValueError, match="no positions"):
        text_index_phrase(spark, store2, "alpha beta")
    with pytest.raises(ValueError, match="at least one token"):
        text_index_phrase(spark, store, "   ")


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_doc_strategy,
       parity=st.integers(1, 3),
       phrase=st.lists(st.sampled_from(["aa", "bb", "cc", "zz"]),
                       min_size=1, max_size=3))
def test_property_phrase_counts_match_brute_force(
        spark, tmp_path_factory, docs, parity, phrase):
    """Fuzz the phrase-exactness claim: random corpora, batch splits,
    and phrases (including repeated and absent tokens) — the
    positional index's occurrence counts always equal the Python
    brute force over the token stream."""
    from wrangle_pypes_spark.operators.textindex import (
        text_index_phrase)

    base = tmp_path_factory.mktemp("prop_phrase")
    frame = spark.createDataFrame(docs, "doc_id int, text string")
    store = str(base / "idx")
    for i in range(parity):
        build_text_index(frame.filter(F.col("doc_id") % parity == i),
                         store, n_buckets=4, block_limit=2,
                         with_positions=True, epoch_id=i)
    got = {r.doc_id: r.n_occurrences for r in
           text_index_phrase(spark, store, phrase).collect()}
    assert got == _phrase_expected(docs, " ".join(phrase)), \
        (phrase, parity)


def test_layout_sidecar_pins_build_params(spark, tmp_path):
    """r11 (VERDICT r10 #2): the first build pins stop_tokens /
    block_limit / with_positions in a _tindex.json sidecar; a later
    build call with different values raises instead of silently
    mixing layouts, and identical values keep working."""
    docs = _docs(spark)
    store = str(tmp_path / "pin")
    build_text_index(docs.filter(F.col("doc_id") <= 3), store,
                     n_buckets=8, stop_tokens=["the", "A"],
                     block_limit=8, epoch_id=0)
    # same layout (case/order-insensitive stop list): fine
    build_text_index(docs.filter(F.col("doc_id") > 3), store,
                     n_buckets=8, stop_tokens=["a", "THE"],
                     block_limit=8, epoch_id=1)
    for bad in (dict(stop_tokens=["the"], block_limit=8),
                dict(stop_tokens=["the", "a"], block_limit=4),
                dict(stop_tokens=["the", "a"], block_limit=8,
                     with_positions=True)):
        with pytest.raises(ValueError, match="immutable"):
            build_text_index(docs, store, n_buckets=8, **bad)


def test_phrase_raises_on_stop_excluded_term(spark, tmp_path):
    """r11 (VERDICT r10 'wrong' #1): a phrase containing a build-time
    stop token must RAISE — its postings were never stored, so the
    old behavior (empty result) was indistinguishable from 'phrase
    absent'."""
    from wrangle_pypes_spark.operators.textindex import (
        _SIDECAR, text_index_phrase)

    docs = [(1, "slow hash batch runs"), (2, "slow batch")]
    frame = spark.createDataFrame(docs, "doc_id int, text string")
    store = str(tmp_path / "stopph")
    build_text_index(frame, store, n_buckets=4, with_positions=True,
                     stop_tokens=["hash"])
    with pytest.raises(ValueError, match="stop_tokens"):
        text_index_phrase(spark, store, "slow hash batch")
    with pytest.raises(ValueError, match="'hash'"):
        text_index_phrase(spark, store, "HASH runs")
    # phrases without stop terms still serve; the removed stopword is
    # NOT bridged (positions are original, adjacency is exact +1)
    got = {r.doc_id: r.n_occurrences for r in
           text_index_phrase(spark, store, "slow batch").collect()}
    assert got == {2: 1}
    # legacy store (sidecar removed): can't check — documented
    # silent-empty fallback, never a crash
    import os
    os.remove(str(tmp_path / "stopph" / _SIDECAR))
    assert text_index_phrase(
        spark, store, "slow hash batch").count() == 0


def test_catalog_recognizes_textindex(spark, tmp_path):
    from wrangle_pypes_spark.sources.catalog import (describe_store,
                                                     store_kind)

    store = str(tmp_path / "cat")
    build_text_index(_docs(spark), store, n_buckets=8,
                     stop_tokens=["the"], with_positions=True,
                     block_limit=32)
    assert store_kind(store, spark=spark) == "textindex"
    row = describe_store(spark, store).collect()[0]
    assert row.kind == "textindex"
    assert "block_limit=32" in row.detail
    assert "positions" in row.detail and "stops=1" in row.detail
