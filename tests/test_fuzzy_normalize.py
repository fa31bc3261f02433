"""Blocked fuzzy string pairs + unicode text normalization."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from wrangle_pypes_spark.functions.text import normalize_text
from wrangle_pypes_spark.operators.fuzzy import fuzzy_string_pairs
from wrangle_pypes_spark.plans import audit


def test_normalize_text_chain(spark):
    messy = ("‘Hi’ “there” – ok…"
             "​x\x07y\t z  w\n\n\n\nnext  line ")
    [r] = spark.createDataFrame([Row(t=messy)]).select(
        normalize_text(F.col("t")).alias("c")).collect()
    assert r.c == "'Hi' \"there\" - ok...xy z w\n\nnext line"


def test_normalize_text_idempotent_and_null(spark):
    df = spark.createDataFrame([Row(t="plain  text"), Row(t=None)])
    out = df.select(normalize_text(F.col("t")).alias("c"),
                    normalize_text(normalize_text(F.col("t"))).alias("c2"))
    rows = out.collect()
    assert rows[0].c == "plain text" and rows[0].c == rows[0].c2
    assert rows[1].c is None


@pytest.fixture(scope="module")
def names(spark):
    return spark.createDataFrame(
        [Row(name=n) for n in
         ["red widget", "red widgets", "red gadget", "blue bolt",
          "blue bolts", "ned widget", "red widget"]])  # dup on purpose


def test_fuzzy_self_pairs(names):
    out = fuzzy_string_pairs(
        names, names, left_col="name", right_col="name",
        max_distance=2, block="prefix", block_len=1,
        dedup_self_pairs=True)
    pairs = {(r.name_l, r.name_r): r.distance for r in out.collect()}
    assert pairs[("red widget", "red widgets")] == 1
    assert pairs[("blue bolt", "blue bolts")] == 1
    # "ned widget" vs "red widget" is d=1 but blocked apart on prefix
    assert ("ned widget", "red widget") not in pairs
    # values are deduped: no (x, x) diagonal, each pair once
    assert all(l < r for (l, r) in pairs)


def test_fuzzy_block_both_recovers_prefix_miss(names):
    out = fuzzy_string_pairs(
        names, names, left_col="name", right_col="name",
        max_distance=2, block="both", block_len=1,
        dedup_self_pairs=True)
    pairs = {(r.name_l, r.name_r) for r in out.collect()}
    assert ("ned widget", "red widget") in pairs  # suffix block catches it
    assert ("blue bolt", "blue bolts") in pairs   # prefix block kept


def test_fuzzy_short_strings_match_longer(spark):
    """Strings shorter than block_len must still pair with longer ones
    that keep the short value as a prefix (VERDICT r5 defect #4:
    fixed-length keys made ('a','ab') at d=1 unfindable)."""
    df = spark.createDataFrame(
        [Row(name=n) for n in ["a", "ab", "abc", "xa", "abcd", "zzzz"]])
    out = fuzzy_string_pairs(
        df, df, left_col="name", right_col="name",
        max_distance=2, block="prefix", block_len=3,
        dedup_self_pairs=True)
    pairs = {(r.name_l, r.name_r): r.distance for r in out.collect()}
    assert pairs[("a", "ab")] == 1        # short nat key met by supp key
    assert pairs[("a", "abc")] == 2
    assert pairs[("ab", "abc")] == 1
    assert pairs[("ab", "abcd")] == 2
    assert pairs[("abc", "abcd")] == 1    # long-long via natural keys
    # first-min(len,block_len)-chars contract: the edit hits char 1
    assert ("a", "xa") not in pairs
    # supplemental keys never pair two LONG strings through a short
    # shared prefix — and nothing reaches "zzzz"
    assert not any("zzzz" in p for p in pairs)


def test_fuzzy_short_strings_suffix_and_empty(spark):
    df = spark.createDataFrame(
        [Row(name=n) for n in ["a", "ba", "cba", "", "az"]])
    out = fuzzy_string_pairs(
        df, df, left_col="name", right_col="name",
        max_distance=2, block="suffix", block_len=3,
        dedup_self_pairs=True)
    pairs = {(r.name_l, r.name_r): r.distance for r in out.collect()}
    assert pairs[("a", "ba")] == 1        # last-char key 'a' preserved
    assert pairs[("ba", "cba")] == 1
    assert pairs[("a", "cba")] == 2
    # empty string emits no block key: matches nothing
    assert not any("" in p for p in pairs)
    # 'az' ends differently: outside the suffix contract vs 'a'
    assert ("a", "az") not in pairs


def _lev(a, b):
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.mark.parametrize("block,block_len,d", [
    ("prefix", 2, 1), ("prefix", 3, 2), ("suffix", 2, 1),
])
def test_fuzzy_blocking_contract_exhaustive(spark, block, block_len, d):
    """Exhaustive check over every string of length ≤3 on {a,b}: a pair
    is returned EXACTLY when lev ≤ d, the length band holds, both sides
    are non-empty, and the first (prefix) / last (suffix)
    min(|x|, |y|, block_len) characters agree — the closed-form recall
    contract of natural+supplemental key blocking."""
    universe = [""]
    for L in (1, 2, 3):
        from itertools import product
        universe += ["".join(p) for p in product("ab", repeat=L)]
    df = spark.createDataFrame([Row(name=n) for n in universe])
    out = fuzzy_string_pairs(
        df, df, left_col="name", right_col="name",
        max_distance=d, block=block, block_len=block_len,
        dedup_self_pairs=True)
    got = {(r.name_l, r.name_r) for r in out.collect()}

    def core(s, m):
        return s[:m] if block == "prefix" else s[-m:] if m else ""

    want = set()
    for x in universe:
        for y in universe:
            if not (x and y and x < y):
                continue
            if abs(len(x) - len(y)) > d or _lev(x, y) > d:
                continue
            m = min(len(x), len(y), block_len)
            if core(x, m) == core(y, m):
                want.add((x, y))
    assert got == want


def test_fuzzy_two_table_and_plan(spark, names):
    other = spark.createDataFrame([Row(label="red midget"),
                                   Row(label="zzz")])
    out = fuzzy_string_pairs(
        names, other, left_col="name", right_col="label",
        max_distance=2, block="prefix", block_len=1)
    rows = {(r.name, r.label) for r in out.collect()}
    assert ("red widget", "red midget") in rows
    assert not any(l == "zzz" or r == "zzz" for l, r in rows)
    rep = audit(out)
    assert rep.jvm_only()
    assert "CartesianProduct" not in rep.plan
    assert "BroadcastNestedLoopJoin" not in rep.plan
