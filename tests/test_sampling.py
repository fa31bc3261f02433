"""Sampling / packing / histogram: determinism, rate accuracy, budget
properties."""

import pytest
from pyspark.sql import functions as F

from wrangle_pypes_spark.operators.sampling import (
    deterministic_sample,
    deterministic_shuffle,
    histogram,
    pack_sequences,
    split_assign,
    stratified_sample,
)


def test_deterministic_sample_rate_and_stability(spark, tables):
    o = tables["orders"]
    s1 = deterministic_sample(o, "o_orderkey", 0.3)
    s2 = deterministic_sample(o.repartition(7), "o_orderkey", 0.3)
    ids1 = {r.o_orderkey for r in s1.select("o_orderkey").collect()}
    ids2 = {r.o_orderkey for r in s2.select("o_orderkey").collect()}
    assert ids1 == ids2  # invariant to partitioning
    rate = len(ids1) / o.count()
    assert 0.25 < rate < 0.35
    # nested: a 0.1 sample with same seed is a subset of the 0.3 sample
    ids3 = {r.o_orderkey for r in
            deterministic_sample(o, "o_orderkey", 0.1)
            .select("o_orderkey").collect()}
    assert ids3 <= ids1


def test_stratified_sample_rates(spark, tables):
    d = tables["documents"]
    s = stratified_sample(d, "lang", {"en": 0.5, "de": 1.0}, key_col="doc_id")
    got = {r.lang: r.n for r in
           s.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    full = {r.lang: r.n for r in
            d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(got) == {"en", "de"}  # unlisted strata dropped
    assert got["de"] == full["de"]
    assert 0.3 * full["en"] < got["en"] < 0.7 * full["en"]


def test_pack_sequences_budget(spark):
    rows = [(i, 1000) for i in range(10)]  # 10 docs x 1000 tokens
    df = spark.createDataFrame(rows, "doc_id long, n long")
    packed = pack_sequences(df, token_col="n", max_tokens=2500,
                            order_col="doc_id")
    by_pack = {r.pack_id: r.s for r in
               packed.groupBy("pack_id").agg(F.sum("n").alias("s")).collect()}
    # budget 2500: packs hold 3 docs (cumsum-start formulation) except tail
    assert all(s <= 2500 + 1000 for s in by_pack.values())  # <=1 doc overflow
    assert sum(by_pack.values()) == 10000  # nothing lost
    # deterministic
    again = {r.doc_id: r.pack_id for r in packed.collect()}
    assert again == {r.doc_id: r.pack_id for r in pack_sequences(
        df.repartition(5), token_col="n", max_tokens=2500,
        order_col="doc_id").collect()}


def test_histogram_totals_and_clamping(spark, tables):
    c = tables["customer"]
    h = histogram(c, "c_acctbal", lo=0.0, hi=1000.0, nbins=4)
    rows = h.collect()
    assert sum(r.n for r in rows) == c.count()  # out-of-range clamped, kept
    assert all(0 <= r.bin <= 3 for r in rows)


def test_mix_plan_rates_and_caps(spark, tables):
    from wrangle_pypes_spark.operators.sampling import mix_plan

    d = tables["documents"]
    total = d.agg(F.sum("n_chars")).collect()[0][0]
    # budget = half the corpus, equal weights over two real sources
    plan = mix_plan(d, source_col="source", token_col="n_chars",
                    weights={"src0": 1.0, "src1": 1.0},
                    token_budget=total / 2)
    for src in ("src0", "src1"):
        p = plan[src]
        assert p["target"] == pytest.approx(total / 4)
        assert 0.0 < p["rate"] <= 1.0
        assert p["rate"] == pytest.approx(
            min(1.0, p["target"] / p["available"]))
    # a budget larger than availability caps the rate at 1 (no upsampling)
    plan_big = mix_plan(d, source_col="source", token_col="n_chars",
                        weights={"src0": 1.0}, token_budget=total * 10)
    assert plan_big["src0"]["rate"] == 1.0
    # unknown source: rate 0
    plan_unk = mix_plan(d, source_col="source", token_col="n_chars",
                        weights={"nope": 1.0}, token_budget=100.0)
    assert plan_unk["nope"]["rate"] == 0.0
    assert plan_unk["nope"]["available"] == 0.0


def test_mix_corpus_hits_budget_and_is_deterministic(spark, tables):
    from wrangle_pypes_spark.operators.sampling import mix_corpus

    d = tables["documents"]
    total = d.agg(F.sum("n_chars")).collect()[0][0]
    budget = total / 3
    kwargs = dict(source_col="source", token_col="n_chars",
                  key_col="doc_id",
                  weights={"src0": 2.0, "src1": 1.0}, token_budget=budget)
    out = mix_corpus(d, **kwargs)
    got = {r["source"]: r["tok"] for r in
           out.groupBy("source").agg(F.sum("n_chars").alias("tok"))
           .collect()}
    assert set(got) <= {"src0", "src1"}  # unlisted sources dropped
    # per-source token totals within 25% of min(target, available)
    # (Bernoulli sampling variance at this corpus size; rate caps at 1)
    from wrangle_pypes_spark.operators.sampling import mix_plan
    plan = mix_plan(d, source_col="source", token_col="n_chars",
                    weights=kwargs["weights"], token_budget=budget)
    for src in ("src0", "src1"):
        expected = min(plan[src]["target"], plan[src]["available"])
        assert got[src] == pytest.approx(expected, rel=0.25)
    # deterministic and partitioning-invariant
    ids1 = sorted(r.doc_id for r in out.select("doc_id").collect())
    ids2 = sorted(r.doc_id for r in
                  mix_corpus(d.repartition(13), **kwargs)
                  .select("doc_id").collect())
    assert ids1 == ids2


def test_split_assign_disjoint_exhaustive_stable(spark, tables):
    docs = tables["documents"]
    n = docs.count()
    out = split_assign(docs, "doc_id")
    # exhaustive: every row gets exactly one split (withColumn => same rows)
    assert out.count() == n
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == n
    # dominant split gets the bulk; tolerance loose at tiny sf
    assert counts["train"] / n > 0.90
    # stable: same seed -> identical assignment; different seed -> differs
    again = {r["doc_id"]: r["split"] for r in
             split_assign(docs, "doc_id").select("doc_id", "split").collect()}
    first = {r["doc_id"]: r["split"] for r in
             out.select("doc_id", "split").collect()}
    assert again == first
    other = {r["doc_id"]: r["split"] for r in
             split_assign(docs, "doc_id", seed=7)
             .select("doc_id", "split").collect()}
    assert other != first


def test_temperature_mix_rates_and_tail_upweighting(spark, tables):
    from wrangle_pypes_spark.operators import (temperature_mix,
                                               temperature_mix_plan)

    docs = tables["documents"]
    total = docs.agg(F.sum("n_chars")).collect()[0][0]
    budget = float(total) * 0.25
    # alpha=1 keeps natural proportions -> every source gets the SAME
    # rate (budget/total), so the mix is a uniform thinning
    plan1 = temperature_mix_plan(docs, source_col="source",
                                 token_col="n_chars", alpha=1.0,
                                 token_budget=budget)
    rates1 = {s: p["rate"] for s, p in plan1.items()}
    for r in rates1.values():
        assert r == pytest.approx(budget / float(total), rel=1e-9)
    # alpha=0.5 up-weights the smaller sources relative to natural
    plan_h = temperature_mix_plan(docs, source_col="source",
                                  token_col="n_chars", alpha=0.5,
                                  token_budget=budget)
    smallest = min(plan_h, key=lambda s: plan_h[s]["available"])
    largest = max(plan_h, key=lambda s: plan_h[s]["available"])
    assert plan_h[smallest]["rate"] > rates1[smallest]
    assert plan_h[largest]["rate"] < rates1[largest]
    # the sampled mix is deterministic and stays within every source's
    # availability
    out = temperature_mix(docs, source_col="source", token_col="n_chars",
                          key_col="doc_id", alpha=0.5,
                          token_budget=budget, hash_scheme="md5")
    again = temperature_mix(docs, source_col="source", token_col="n_chars",
                            key_col="doc_id", alpha=0.5,
                            token_budget=budget, hash_scheme="md5")
    ids = sorted(r.doc_id for r in out.select("doc_id").collect())
    assert ids == sorted(r.doc_id for r in again.select("doc_id").collect())
    kept_tok = out.agg(F.sum("n_chars")).collect()[0][0]
    assert 0 < kept_tok < total


def test_temperature_mix_plan_ignores_null_source(spark):
    """A NULL source key is dropped from the inferred source list
    (ADVICE r3) instead of blowing up sorted() with None-vs-str; the
    membership filter never keeps NULL-source rows anyway."""
    from wrangle_pypes_spark.operators import (temperature_mix,
                                               temperature_mix_plan)

    rows = [("web", 100, 1), ("code", 50, 2), (None, 999, 3),
            ("web", 100, 4)]
    df = spark.createDataFrame(rows, "source string, n_tok long, id long")
    plan = temperature_mix_plan(df, source_col="source",
                                token_col="n_tok", alpha=0.5,
                                token_budget=100.0)
    assert set(plan) == {"web", "code"}  # no None key
    out = temperature_mix(df, source_col="source", token_col="n_tok",
                          key_col="id", alpha=0.5, token_budget=1000.0,
                          hash_scheme="md5")
    assert all(r.source is not None for r in out.collect())


def test_split_assign_null_id_routing(spark):
    """NULL ids must never silently land in the eval split: the default
    fails the job; an explicit quarantine label routes them visibly."""
    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (2, "c")], "doc_id int, body string")
    from pyspark.errors import PySparkException

    with pytest.raises(PySparkException):
        split_assign(df, "doc_id").collect()
    out = {r["doc_id"]: r["split"] for r in
           split_assign(df, "doc_id", on_null="_unsplit").collect()}
    assert out[None] == "_unsplit"
    assert all(v in {"train", "val", "test"}
               for k, v in out.items() if k is not None)


def test_split_assign_weights_normalized(spark, tables):
    docs = tables["documents"]
    out = split_assign(docs, "doc_id",
                       splits=(("a", 50), ("b", 50)), seed=1)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert abs(counts.get("a", 0) / total - 0.5) < 0.1


def test_deterministic_shuffle_total_order_and_reproducibility(spark, tables):
    docs = tables["documents"].select("doc_id")
    out = deterministic_shuffle(docs, "doc_id", num_partitions=4)
    # the produced order (partition-major, then within-partition) is the
    # global shuffle_key order: collect per partition and concatenate
    parts = (out.withColumn("_pid", F.spark_partition_id())
             .select("_pid", "shuffle_key", "doc_id").collect())
    seq = [(r["_pid"], r["shuffle_key"], r["doc_id"]) for r in parts]
    # rows arrive partition by partition already sorted; the concatenated
    # (key, id) sequence must therefore be globally sorted
    keys_in_order = [(k, d) for _, k, d in seq]
    assert keys_in_order == sorted(keys_in_order)
    # reproducible permutation: same seed -> same order
    out2 = deterministic_shuffle(docs, "doc_id", num_partitions=4)
    assert [r["doc_id"] for r in out2.collect()] == \
        [d for _, _, d in seq]
    # a different seed is a different permutation
    out3 = deterministic_shuffle(docs, "doc_id", seed=9, num_partitions=4)
    assert [r["doc_id"] for r in out3.collect()] != \
        [d for _, _, d in seq]


def test_split_and_shuffle_are_map_side_plans(spark, tables):
    docs = tables["documents"]
    plan = split_assign(docs, "doc_id")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan  # map-only: no shuffle for assignment
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    splan = deterministic_shuffle(docs, "doc_id")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "rangepartitioning" in splan.lower()  # total order via range part.
    assert "BatchEvalPython" not in splan and "ArrowEvalPython" not in splan


# -- property-style invariants (one Spark job per example batch) ------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(weights=st.lists(
    st.tuples(st.sampled_from(["a", "b", "c", "d"]),
              st.floats(min_value=0.01, max_value=100.0,
                        allow_nan=False, allow_infinity=False)),
    min_size=1, max_size=4, unique_by=lambda t: t[0]))
def test_split_assign_always_disjoint_exhaustive(spark, weights):
    """For ANY positive weight vector: every row lands in exactly one
    split, and only declared split names appear."""
    df = spark.range(200).withColumnRenamed("id", "doc_id")
    out = split_assign(df, "doc_id", splits=tuple(weights), seed=3)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 200
    assert set(counts) <= {name for name, _ in weights}


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(alpha=st.floats(min_value=0.0, max_value=1.0,
                       allow_nan=False, allow_infinity=False),
       budget_frac=st.floats(min_value=0.05, max_value=2.0,
                             allow_nan=False, allow_infinity=False))
def test_temperature_mix_plan_invariants(spark, tables, alpha, budget_frac):
    """For ANY alpha in [0,1] and ANY budget: rates stay in [0,1] and
    expected kept tokens (rate x available) never exceed the budget when
    no source is cap-saturated at rate 1."""
    from wrangle_pypes_spark.operators import temperature_mix_plan

    docs = tables["documents"]
    total = float(docs.agg(F.sum("n_chars")).collect()[0][0])
    plan = temperature_mix_plan(docs, source_col="source",
                                token_col="n_chars", alpha=alpha,
                                token_budget=total * budget_frac)
    for p in plan.values():
        assert 0.0 <= p["rate"] <= 1.0
    expected = sum(p["rate"] * p["available"] for p in plan.values())
    if all(p["rate"] < 1.0 for p in plan.values()):
        assert expected == pytest.approx(total * budget_frac, rel=1e-6)
    else:
        assert expected <= total * budget_frac * (1 + 1e-9)


def test_cap_per_group_exact_and_approx(spark):
    """exact=True keeps EXACTLY max_per_group members per group, chosen
    by md5 draw (deterministic across runs and partitionings); the
    approx path keeps ~cap with a map-only filter and agrees on the
    under-cap groups (everything kept)."""
    from wrangle_pypes_spark.operators import cap_per_group

    rows = [("big", i) for i in range(200)] + [("small", 1000 + i)
                                               for i in range(5)]
    df = spark.createDataFrame(rows, "source string, doc_id long")
    ex = cap_per_group(df, "source", key_col="doc_id", max_per_group=10)
    got = {}
    for r in ex.collect():
        got.setdefault(r.source, set()).add(r.doc_id)
    assert len(got["big"]) == 10
    assert got["small"] == {1000, 1001, 1002, 1003, 1004}  # under cap
    # deterministic: same members again, even repartitioned
    again = cap_per_group(df.repartition(7), "source",
                          key_col="doc_id", max_per_group=10)
    got2 = {}
    for r in again.collect():
        got2.setdefault(r.source, set()).add(r.doc_id)
    assert got2 == got
    # approx path: no window sort, keeps roughly the cap
    ap = cap_per_group(df, "source", key_col="doc_id",
                       max_per_group=10, exact=False)
    plan = ap._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    n_big = ap.filter("source = 'big'").count()
    assert 2 <= n_big <= 25  # Bernoulli around 10
    assert ap.filter("source = 'small'").count() == 5


def test_weighted_sample_pps_proportional_and_deterministic(spark):
    """Rows with weight >= W/k are always kept; heavy rows are kept at a
    visibly higher rate than light rows; re-running yields the same set
    (pure hash, no RNG)."""
    from wrangle_pypes_spark.operators import weighted_sample_pps

    rows = [(i, 1) for i in range(500)] + [(1000 + i, 100) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    # W = 2500; k=25 -> p(heavy) = 25*100/2500 = 1.0, p(light) = 0.01
    out = weighted_sample_pps(df, key_col="doc_id", weight_col="w", k=25)
    ids = {r.doc_id for r in out.collect()}
    assert {1000 + i for i in range(20)} <= ids          # certainties kept
    assert len(ids - {1000 + i for i in range(20)}) <= 15  # few light rows
    again = {r.doc_id for r in weighted_sample_pps(
        df, key_col="doc_id", weight_col="w", k=25).collect()}
    assert ids == again


def test_topp_per_group_nucleus(spark):
    """Per group, rows ordered by score desc are kept until cumulative
    tokens reach p of the total; the crossing row is kept, the rest
    dropped; ties break by id."""
    from wrangle_pypes_spark.operators import topp_per_group

    df = spark.createDataFrame(
        [("a", 1, 0.9, 40), ("a", 2, 0.8, 40), ("a", 3, 0.7, 20),
         ("b", 4, 0.5, 10), ("b", 5, 0.5, 10)],
        "src string, doc_id long, score double, tok long")
    # group a total=100, p=0.5 -> keep doc 1 (cum 40 < 50) and doc 2
    # (crossing: cum-tok = 40 < 50), drop doc 3 (cum-tok = 80)
    out = topp_per_group(df, group_col="src", score_col="score",
                         token_col="tok", p=0.5, id_col="doc_id")
    got = {r.doc_id: r.cum_tokens for r in out.collect()}
    assert set(got) == {1, 2, 4}          # b: tie -> doc 4 first, covers 0.5
    assert got[1] == 40 and got[2] == 80 and got[4] == 10


def test_gumbel_topk_properties(spark):
    """Exactly k rows come back; re-runs return the SAME set; a much
    higher score is (essentially) always selected; temperature -> 0
    approaches deterministic top-k by score."""
    from wrangle_pypes_spark.operators import gumbel_topk

    rows = [(i, 0.0) for i in range(100)] + [(1000, 50.0), (1001, 50.0)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    got = {r.doc_id for r in gumbel_topk(
        df, "score", key_col="doc_id", k=10).collect()}
    assert len(got) == 10
    assert {1000, 1001} <= got      # +50 dominates unit-scale gumbels
    again = {r.doc_id for r in gumbel_topk(
        df, "score", key_col="doc_id", k=10).collect()}
    assert got == again

    cold = {r.doc_id for r in gumbel_topk(
        df, "score", key_col="doc_id", k=2,
        temperature=1e-9).collect()}
    assert cold == {1000, 1001}     # near-argmax at low temperature


def test_curriculum_order(spark):
    from wrangle_pypes_spark.operators.sampling import curriculum_order
    df = spark.createDataFrame([(i, float(i)) for i in range(100)],
                               "id long, score double")
    out = curriculum_order(df, "score", id_col="id", n_bands=4,
                           num_partitions=4)
    rows = out.collect()  # collect preserves partition order
    assert len(rows) == 100
    # equal-frequency bands
    from collections import Counter
    c = Counter(r.band for r in rows)
    assert c == {0: 25, 1: 25, 2: 25, 3: 25}
    # global order is band-major, shuffle-key minor
    seen = [(r.band, r.shuffle_key, r.id) for r in rows]
    assert seen == sorted(seen)
    # banding respects the score: all band-0 scores < all band-3 scores
    max_b0 = max(r.score for r in rows if r.band == 0)
    min_b3 = min(r.score for r in rows if r.band == 3)
    assert max_b0 < min_b3
    # shuffled within band: not id-ordered inside band 0
    b0_ids = [r.id for r in rows if r.band == 0]
    assert b0_ids != sorted(b0_ids)
    # deterministic across runs; new seed reshuffles, same membership
    again = [(r.band, r.shuffle_key, r.id)
             for r in curriculum_order(df, "score", id_col="id",
                                       n_bands=4,
                                       num_partitions=4).collect()]
    assert again == seen
    reseed = curriculum_order(df, "score", id_col="id", n_bands=4,
                              seed=7, num_partitions=4).collect()
    assert [r.id for r in reseed] != [r.id for r in rows]
    assert {(r.id, r.band) for r in reseed} == \
        {(r.id, r.band) for r in rows}
    # anti-curriculum reverses the band order
    desc = curriculum_order(df, "score", id_col="id", n_bands=4,
                            ascending=False, num_partitions=4).collect()
    assert [r.band for r in desc] == sorted(
        [r.band for r in desc], reverse=True)
    import pytest
    with pytest.raises(ValueError, match="n_bands"):
        curriculum_order(df, "score", id_col="id", n_bands=1)
