"""Text analysis for training-data pipelines — pure Column expressions
plus a few corpus-level DataFrame operators (top n-grams, PMI).

Each function is deterministic and (where registered in
``__spark_entry__``) has an ANSI-SQL oracle twin, so correctness is
checkable against DuckDB on the ``documents`` table.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Minimal per-language stopword lists for the n-gram/stopword language-ID
# heuristic.  (Real pipelines plug in fastText-style models via a pandas
# UDF; the heuristic keeps the hot path JVM-side.)
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "es": ("el", "la", "los", "de", "que", "y", "en", "un", "una", "por"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
}


def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens, empties removed."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != F.lit(""))


def token_count(text: Column) -> Column:
    """Whitespace token count (the cheap proxy; BPE-ish subword estimate
    below adds punctuation/wordpiece splits)."""
    return F.size(tokens(text))


def subword_token_estimate(text: Column) -> Column:
    """BPE-ish token-count estimate without a tokenizer model: words plus
    extra tokens for long words (≈1 per 4 chars beyond 4) plus
    punctuation marks.  Deterministic, SQL-expressible."""
    toks = tokens(text)
    word_cost = F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, t: acc + 1 + F.greatest(
            F.ceil((F.length(t) - 4) / 4.0), F.lit(0)).cast("long"))
    punct = F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return (word_cost + punct).alias("subword_tokens")


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]: mean of
    (a) alpha-character ratio, (b) non-stopword diversity
    (distinct/total tokens), (c) length sanity (tokens in [5, 5000]).
    Deterministic; mirrors C4-style quality filters."""
    toks = tokens(text)
    n = F.size(toks)
    alpha_ratio = (F.length(F.regexp_replace(F.lower(text), r"[^a-z]", ""))
                   / F.greatest(F.length(text), F.lit(1))).cast("double")
    diversity = (F.size(F.array_distinct(toks))
                 / F.greatest(n, F.lit(1))).cast("double")
    len_ok = F.when((n >= 5) & (n <= 5000), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round((alpha_ratio + diversity + len_ok) / 3.0, 6)


def normalize_text(text: Column) -> Column:
    """Unicode cleanup for crawl text (ftfy-lite): map curly quotes /
    en- and em-dashes / NBSP to ASCII, spell out the ellipsis, strip
    zero-width characters and C0/DEL control codes (newline and tab
    survive), collapse space/tab runs, cap blank-line runs at one, and
    trim.  One ``translate`` plus a fixed regexp_replace chain — pure
    JVM, map-only, whole-stage codegen; the identical chain runs in the
    oracle engine (RE2-safe patterns, global-flag mirrored).
    """
    t = F.translate(text,
                    "\u2018\u2019\u201c\u201d\u00a0\u2013\u2014",
                    "''\"\" --")
    t = F.regexp_replace(t, "\u2026", "...")
    t = F.regexp_replace(t, "[\u200b\u200c\u200d\ufeff]", "")
    t = F.regexp_replace(t, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "")
    t = F.regexp_replace(t, r"[ \t]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n{3,}", "\n\n")
    return F.trim(t)


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens(text)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return (hits / F.greatest(F.size(toks), F.lit(1))).cast("double")


def lang_id(text: Column) -> Column:
    """Stopword-vote language ID over the supported languages; 'und'
    (undetermined) when no stopword hits at all."""
    toks = tokens(text)
    scores = []
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        scores.append(F.struct(
            F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).alias("hits"),
            F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))  # max by (hits, lang)
    return F.when(best.getField("hits") > 0,
                  best.getField("lang")).otherwise(F.lit("und"))


_SCRIPT_CLASSES = (
    ("latin", r"\p{IsLatin}"),
    ("cyrillic", r"\p{IsCyrillic}"),
    ("han", r"\p{IsHan}"),
    ("arabic", r"\p{IsArabic}"),
    ("hangul", r"\p{IsHangul}"),
    ("kana", r"[\p{IsHiragana}\p{IsKatakana}]"),
    ("greek", r"\p{IsGreek}"),
)


def script_mix(text: Column, *, round_digits: int = 4) -> Column:
    """Unicode-script composition of a document: struct of
    ``n_chars`` (non-whitespace characters) plus per-script character
    fractions (latin, cyrillic, han, arabic, hangul, kana, greek,
    other).  The script histogram is the cheap complement to
    :func:`lang_id`: stopword voting only covers languages with a
    stopword table, while the script mix flags CJK/Cyrillic/Arabic
    content, mixed-script spam (e.g. Cyrillic homoglyphs inside Latin
    text), and mojibake — before any tokenizer touches the bytes.

    ``other`` covers digits, punctuation, and symbols (Unicode
    "Common" script — deliberately not a listed class).  Empty text
    → all fractions 0 with ``n_chars`` 0; NULL text → NULL struct
    fields.  Pure ``regexp_count`` Column expressions — map-only,
    whole-stage codegen; RE2-based oracle engines express the same
    classes as ``\\p{Latin}`` etc.
    """
    n = F.regexp_count(text, F.lit(r"\S"))
    denom = F.greatest(n, F.lit(1))
    fields = [n.alias("n_chars")]
    counted = None
    for name, pat in _SCRIPT_CLASSES:
        c = F.regexp_count(text, F.lit(pat))
        counted = c if counted is None else counted + c
        fields.append(F.round(c / denom, round_digits).alias(name))
    fields.append(F.round((n - counted) / denom, round_digits)
                  .alias("other"))
    return F.struct(*fields)


def word_ngrams(text: Column, n: int) -> Column:
    """Word ``n``-grams as space-joined strings (empty array when the
    document has fewer than ``n`` tokens).

    Identical output for every n; the small-n cases take cheaper plans
    because this expression sits in the hot loop of dsir/tf-idf/
    decontamination/PMI: n=1 is the token array itself and n=2 pairs
    adjacent tokens with one ``zip_with`` (two array allocations per
    DOC) instead of a ``slice``+``concat_ws`` per POSITION.
    """
    empty = F.array().cast("array<string>")
    toks = tokens(text)
    wc = F.size(toks)
    if n == 1:
        # coalesce: NULL text must yield [] on every path (tokens(NULL)
        # is NULL), preserving the 'identical output for every n' claim
        return F.coalesce(toks, empty)
    if n == 2:
        k = F.greatest(wc - 1, F.lit(0))
        return F.coalesce(F.zip_with(
            F.slice(toks, 1, k), F.slice(toks, 2, k),
            lambda a, b: F.concat(a, F.lit(" "), b)), empty)
    # n-step zip_with chain over shifted slices, NOT an index lambda
    # over sequence(): a lambda that reads the outer token array
    # (slice(toks, i, n) inside transform) re-evaluates the
    # tokenization per element in the interpreted HOF path — O(wc²)
    # per document.  Every slice below is a HOF child, evaluated once.
    k = F.greatest(wc - (n - 1), F.lit(0))
    grams = F.slice(toks, 1, k)
    for j in range(2, n + 1):
        grams = F.zip_with(grams, F.slice(toks, j, k),
                           lambda a, b: F.concat_ws(" ", a, b))
    return F.when(wc >= n, grams).otherwise(empty)


def corpus_top_ngrams(docs: DataFrame, text_col: str = "text", *,
                      id_col: str = "doc_id", n: int = 3,
                      k: int = 25) -> DataFrame:
    """Corpus-wide top-``k`` word ``n``-grams: (ngram, total_count,
    n_docs), ordered by total count (n-gram string breaks ties so the
    top-k cut is deterministic).

    The boilerplate detector of web-corpus curation: a handful of
    n-grams with huge counts across many documents = navigation chrome /
    licence headers to strip before training.

    Scale: explode → (id, ngram) hash-aggregate with map-side partial
    aggregation, then a second aggregate on the gram string — two
    shuffles, but the first collapses the exploded grams to per-doc
    counts (the bulk of the data) and the second moves only one row per
    distinct (doc, gram).  The top-k cut means only k rows reach the
    driver, never the full gram distribution; ``n_docs`` is a plain
    ``count(*)`` over the per-doc rows in the second aggregate.
    """
    grams = docs.select(
        F.col(id_col),
        F.explode(word_ngrams(F.col(text_col), n)).alias("ngram"))
    per_doc = grams.groupBy(id_col, "ngram").agg(
        F.count("*").alias("c"))  # partial-aggregates before the shuffle
    counts = per_doc.groupBy("ngram").agg(
        F.sum("c").alias("total_count"),
        F.count("*").alias("n_docs"))
    return counts.orderBy(F.desc("total_count"), "ngram").limit(k)


def unigram_logprob_score(docs: DataFrame, text_col: str = "text", *,
                          id_col: str = "doc_id",
                          round_digits: int = 4,
                          cache_registry: Optional[list] = None
                          ) -> DataFrame:
    """Per-document unigram-LM score: average negative log-probability
    of the document's tokens under the CORPUS unigram distribution —
    the cheap perplexity proxy of public web-corpus curation (a doc of
    globally-rare tokens scores high = gibberish candidate; a doc of
    only ultra-common tokens scores low = boilerplate candidate).

    Two aggregates, both map-side partial: (1) corpus token counts
    (vocab-sized, broadcast back), (2) per-doc mean of
    ``-ln p(token)`` over token instances.  The broadcast keeps the
    per-token join shuffle-free, so corpus cost is one explode + one
    doc-keyed aggregate — the same shape as tf-idf.

    The score is rounded to ``round_digits`` decimals: float summation
    order differs between engines (and between partitionings), and the
    ~1e-13 reassociation noise below the rounding grain is exactly what
    a cross-engine value oracle must not depend on.

    The vocab-sized frequency table is persisted (it feeds both the
    total and the broadcast join, and must survive until the caller's
    action).  Long-lived drivers looping over corpora should pass a
    list as ``cache_registry`` and ``unpersist()`` its entries after
    materializing — the same cleanup contract as
    ``aio.async_get_or_create``.
    """
    toks = docs.select(F.col(id_col),
                       F.explode(tokens(F.col(text_col))).alias("_tok"))
    freqs = toks.groupBy("_tok").agg(F.count("*").alias("_tf"))
    # persist the vocab-sized table: it feeds both the total (one
    # vocab-sized aggregate — never a second corpus-sized pass) and the
    # broadcast join back onto the token stream
    freqs = freqs.persist()
    if cache_registry is not None:
        cache_registry.append(freqs)
    # empty corpus (or all-empty texts): sum is NULL — any positive
    # stand-in works, no row ever evaluates the log
    total = freqs.agg(F.sum("_tf")).collect()[0][0] or 1
    scored = (toks.join(F.broadcast(freqs), "_tok")
              .groupBy(id_col)
              .agg(F.count("*").alias("n_tokens"),
                   F.round(F.avg(-F.log(F.col("_tf") / F.lit(float(total)))),
                           round_digits).alias("avg_neg_logprob")))
    return scored


def inverted_index(docs: DataFrame, text_col: str = "text", *,
                   id_col: str = "doc_id",
                   min_df: int = 1,
                   max_df: Optional[int] = None,
                   postings_shards: int = 16) -> DataFrame:
    """Build an inverted index keyed by ``(token, shard)``: each row
    carries the token-level ``df`` (document frequency) and
    ``total_tf`` (corpus term frequency) plus ``postings`` — that
    shard's array of ``(doc, tf)`` structs sorted by doc id.  Readers
    union a token's shards (``WHERE token = ?`` prunes to ≤
    ``postings_shards`` rows).

    Why sharded: a per-token ``collect_list`` is unbounded on the
    high-df tail — at web scale a stopword-class token would
    materialize one row holding ~every doc id, an executor OOM on
    exactly the rows a 100 TB corpus guarantees exist.  Sharding by
    ``pmod(xxhash64(doc), S)`` bounds every postings array at roughly
    ``|docs| / S`` regardless of skew, and S scales with the corpus
    (pick ``S ≈ max_expected_df / rows_per_array_budget``).

    Shape at scale: explode → per-(doc, token) count with map-side
    partials (collapses the token stream to one row per posting before
    any shuffle) → (token, shard)-keyed aggregate building the arrays →
    token-keyed roll-up of the per-shard counts (vocab×S tiny rows)
    joined back for token-level ``df``/``total_tf``.  The join is
    token-keyed sort-merge; rows stream through it one bounded array at
    a time, so no task ever holds a full token's postings.

    ``min_df`` drops hapax noise (common in web corpora); ``max_df``
    is the stopword-suppression escape — tokens in more than ``max_df``
    documents are dropped entirely.  ``postings_shards=1`` keeps the
    legacy single-row-per-token layout (no ``shard`` column) for small
    corpora where lookups should be single-row.
    """
    toks = docs.select(F.col(id_col).alias("doc"),
                       F.explode(tokens(F.col(text_col))).alias("token"))
    postings = toks.groupBy("token", "doc").agg(F.count("*").alias("tf"))
    if postings_shards <= 1:
        idx = (postings.groupBy("token")
               .agg(F.count("*").alias("df"),
                    F.sum("tf").alias("total_tf"),
                    F.sort_array(F.collect_list(
                        F.struct("doc", "tf"))).alias("postings")))
    else:
        shard = F.pmod(F.xxhash64("doc"),
                       F.lit(postings_shards)).cast("int")
        per_shard = (postings.withColumn("shard", shard)
                     .groupBy("token", "shard")
                     .agg(F.count("*").alias("_shard_df"),
                          F.sum("tf").alias("_shard_tf"),
                          F.sort_array(F.collect_list(
                              F.struct("doc", "tf"))).alias("postings")))
        tok_stats = (per_shard.groupBy("token")
                     .agg(F.sum("_shard_df").alias("df"),
                          F.sum("_shard_tf").alias("total_tf")))
        idx = (per_shard.join(tok_stats, "token")
               .select("token", "shard", "df", "total_tf", "postings"))
    if min_df > 1:
        idx = idx.filter(F.col("df") >= min_df)
    if max_df is not None:
        idx = idx.filter(F.col("df") <= max_df)
    return idx


def token_pmi_pairs(docs: DataFrame, text_col: str = "text", *,
                    id_col: str = "doc_id", min_pair_docs: int = 2,
                    n_docs: Optional[int] = None,
                    top_m_tokens: Optional[int] = 10_000,
                    cache_registry: Optional[list] = None) -> DataFrame:
    """Pointwise mutual information for token pairs co-occurring in the
    same document: (tok_a, tok_b, n_ab, pmi) for every unordered pair
    seen in at least ``min_pair_docs`` documents.

    pmi = ln(N · n_ab / (n_a · n_b)) over document frequencies —
    positive = the tokens attract (phrases, topics), negative = repel.

    Scale: tokens are distinct'd PER DOCUMENT before the pair
    self-join, so the join is co-partitioned on ``id_col`` — and the
    vocabulary entering the join is ENFORCED to the ``top_m_tokens``
    tokens by document frequency (deterministic tie-break on the token
    string).  Without that bound one pathological 50k-distinct-token
    document emits ~1.2B pairs; with it, a document contributes pairs
    only among its globally-frequent tokens — which is also what PMI
    is for, since a pair below ``min_pair_docs`` can never surface and
    hapax tokens only waste the join.  ``top_m_tokens=None`` disables
    the bound (small corpora).

    One marginals pass does double duty via ``rollup``: the per-token
    rows are the document frequencies ``n_t`` and the grand-total row
    carries ``count(DISTINCT doc)`` — so ``N`` (docs contributing ≥1
    token; empty documents carry no co-occurrence signal) costs no
    second corpus scan.  Pass ``n_docs`` to skip even that collect.
    The vocab-sized marginals table is persisted (it feeds the top-M
    cut, the scalar N, and both broadcast joins); long-lived drivers
    pass ``cache_registry`` and unpersist after materializing, as with
    :func:`unigram_logprob_score`.
    """
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"))
    marg = (toks.rollup("tok")
            .agg(F.count("*").alias("n_t"),
                 F.count_distinct("_id").alias("_nd"),
                 F.grouping("tok").alias("_g"))
            .persist())
    if cache_registry is not None:
        cache_registry.append(marg)
    if n_docs is None:
        row = marg.filter(F.col("_g") == 1).collect()
        n_docs = int(row[0]["_nd"]) if row else 0
    marginals = marg.filter(F.col("_g") == 0).select("tok", "n_t")
    if top_m_tokens is not None:
        top = (marginals.orderBy(F.desc("n_t"), "tok")
               .limit(top_m_tokens).select("tok"))
        toks = toks.join(F.broadcast(top), "tok")
    a, b = toks.alias("a"), toks.alias("b")
    pairs = a.join(b, (F.col("a._id") == F.col("b._id")) &
                   (F.col("a.tok") < F.col("b.tok")))
    co = (pairs.groupBy(F.col("a.tok").alias("tok_a"),
                        F.col("b.tok").alias("tok_b"))
          .agg(F.count("*").alias("n_ab"))
          .filter(F.col("n_ab") >= min_pair_docs))
    ma = F.broadcast(marginals.select(F.col("tok").alias("tok_a"),
                                     F.col("n_t").alias("n_a")))
    mb = F.broadcast(marginals.select(F.col("tok").alias("tok_b"),
                                     F.col("n_t").alias("n_b")))
    return (co.join(ma, "tok_a").join(mb, "tok_b")
            .select("tok_a", "tok_b", "n_ab",
                    F.round(F.log(F.col("n_ab") * F.lit(float(n_docs)) /
                                  (F.col("n_a") * F.col("n_b"))), 6)
                    .alias("pmi")))


def chunk_documents(docs: DataFrame, text_col: str = "text", *,
                    id_col: str = "doc_id", chunk_tokens: int = 512,
                    overlap_tokens: int = 0) -> DataFrame:
    """Split documents into fixed-size token windows with optional
    overlap: (id, chunk_idx, chunk, n_tokens) — the embedding/-context-
    window preprocessing step, as a pure Column plan.

    Window ``i`` starts at token ``1 + i·stride`` (stride = chunk −
    overlap); the final window may be shorter; empty documents yield no
    chunks.  Unlike the Python-UDTF chunker (``functions/udtfs.py``)
    this stays entirely inside whole-stage codegen — sequence/transform/
    slice build all windows in one pass, then ``posexplode`` fans out
    1→N with no shuffle at all (chunking is map-only at any scale).
    """
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError("need 0 <= overlap_tokens < chunk_tokens")
    stride = chunk_tokens - overlap_tokens
    toks = tokens(F.col(text_col))
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks) - overlap_tokens, F.lit(1)),
        F.lit(stride))
    chunks = F.when(F.size(toks) > 0, F.transform(
        starts, lambda s: F.struct(
            F.concat_ws(" ", F.slice(toks, s, chunk_tokens)).alias("chunk"),
            F.least(F.size(toks) - s + 1, F.lit(chunk_tokens))
            .alias("n_tokens"))
    )).otherwise(F.array().cast(
        "array<struct<chunk:string,n_tokens:int>>"))
    return (docs
            .select(F.col(id_col),
                    F.posexplode(chunks).alias("chunk_idx", "_c"))
            .select(id_col, "chunk_idx",
                    F.col("_c.chunk").alias("chunk"),
                    F.col("_c.n_tokens").alias("n_tokens")))


def doc_fingerprint(text: Column) -> Column:
    """Canonical content fingerprint: md5 over the sorted distinct token
    set.  Robust to word order / duplication; identical across engines
    (md5 is bit-stable), so it doubles as the cross-engine dedup key."""
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text))))
    return F.md5(canon)


def bm25_scores(docs: DataFrame, query_terms: Sequence[str], *,
                text_col: str = "text", id_col: str = "doc_id",
                k1: float = 1.2, b: float = 0.75,
                round_digits: int = 4) -> DataFrame:
    """Okapi BM25 relevance of every document against a bag of query
    terms — the classic lexical ranker (and the retrieval baseline any
    embedding search gets compared to):

    ``score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) /
                 (tf(t,d) + k1·(1 − b + b·|d|/avgdl))``
    with ``idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))``.

    Output: (id, n_terms_hit, bm25) for documents matching ≥ 1 term.
    All inputs to the formula are exact integers (tf, df, |d|, N) plus
    one exact-int division (avgdl), so the rounded score is
    reproducible in any engine with IEEE doubles and ``ln``.

    Scale shape: tokens are exploded ONCE and filtered to the query
    bag immediately (the filter is a broadcast literal array — the
    corpus-scale stream shrinks to query-term hits before any
    shuffle); df/tf come from two aggregates over that filtered
    stream; doc lengths ride a map-only projection; the per-term stats
    table (≤ |query| rows) broadcasts onto the final doc-keyed sum.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})
    bag = F.array(*[F.lit(t) for t in terms])
    toks = tokens(F.col(text_col))
    base = docs.select(F.col(id_col).alias("_doc"),
                       toks.alias("_toks"),
                       F.size(toks).alias("_dl"))
    # one corpus aggregate: N and avgdl (exact ints -> one division)
    tot = base.agg(F.count("*").alias("n"),
                   F.sum("_dl").alias("s")).collect()[0]
    n_docs, avgdl = int(tot["n"]), float(tot["s"] or 0) / max(int(tot["n"]), 1)
    hits = (base.select("_doc", "_dl",
                        F.explode(F.filter(
                            "_toks", lambda t: F.array_contains(bag, t)))
                        .alias("_t")))
    tf = hits.groupBy("_doc", "_dl", "_t").agg(F.count("*").alias("_tf"))
    df_t = tf.groupBy("_t").agg(F.count("*").alias("_df"))
    idf = F.log(F.lit(1.0) +
                (F.lit(float(n_docs)) - F.col("_df") + 0.5)
                / (F.col("_df") + 0.5))
    contrib = (tf.join(F.broadcast(df_t), "_t")
               .select("_doc",
                       (idf * (F.col("_tf") * (k1 + 1))
                        / (F.col("_tf") + F.lit(k1)
                           * (1 - b + F.lit(b) * F.col("_dl")
                              / F.lit(avgdl)))).alias("_s")))
    return (contrib.groupBy("_doc")
            .agg(F.count("*").cast("long").alias("n_terms_hit"),
                 F.round(F.sum("_s"), round_digits).alias("bm25"))
            .select(F.col("_doc").alias(id_col), "n_terms_hit", "bm25"))


def bpe_induce(docs: DataFrame, text_col: str = "text", *,
               num_merges: int = 10,
               min_pair_count: int = 2) -> list[tuple[str, str]]:
    """Induce byte-pair-encoding merges from a corpus — the classic
    subword-vocabulary construction (Sennrich et al.), distributed the
    way the reference implementations batch it: statistics run over the
    DISTINCT-WORD frequency table, never the raw corpus, so after one
    corpus scan each merge iteration touches |vocabulary| rows.

    Returns the ordered merge list ``[(left, right), ...]`` — a
    driver-side model artifact like ``kmeans_fit``'s centroids; apply
    it with :func:`bpe_segment`.  Deterministic: the best pair per
    round is ``max_by`` on (count, pair-string) — ties break
    lexicographically, so re-runs (and any engine) produce the same
    merges.

    Scale shape: ONE corpus scan builds the (word, freq) table
    (hash-aggregate, map-side partial), persisted; each of the
    ``num_merges`` rounds is an explode of adjacent symbol pairs
    weighted by word freq → a 1-row ``max_by`` aggregate → a map-only
    fold rewriting the symbol arrays, with ``localCheckpoint`` per
    round so the plan cannot double (the iterative-Spark discipline of
    ``connected_components``/``pagerank``).  Stops early when no pair
    reaches ``min_pair_count``.
    """
    vocab = (docs
             .select(F.explode(tokens(F.col(text_col))).alias("_w"))
             .groupBy("_w").agg(F.count("*").alias("_f"))
             .select(F.split(F.col("_w"), "").alias("_syms"), "_f")
             .localCheckpoint(eager=True))
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = vocab.select(
            "_f",
            F.explode(F.zip_with(
                F.slice("_syms", 1,
                        F.greatest(F.size("_syms") - 1, F.lit(0))),
                F.slice("_syms", 2,
                        F.greatest(F.size("_syms") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("l"), b.alias("r"))))
            .alias("_p"))
        best = (pairs.groupBy("_p").agg(F.sum("_f").alias("_n"))
                .agg(F.max_by(
                    F.struct("_p", "_n"),
                    F.struct(F.col("_n"),
                             F.concat(F.col("_p.l"), F.lit("\x00"),
                                      F.col("_p.r")))).alias("_b"))
                .collect()[0]["_b"])
        if best is None or best["_n"] < min_pair_count:
            break
        left, right = best["_p"]["l"], best["_p"]["r"]
        merges.append((left, right))
        la, ra, ma = F.lit(left), F.lit(right), F.lit(left + right)
        merged = F.aggregate(
            F.col("_syms"),
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0) & (F.element_at(acc, -1) == la)
                & (x == ra),
                F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(ma))
            ).otherwise(F.concat(acc, F.array(x))))
        # LAZY checkpoint (the pagerank r14 trick): the rewrite
        # materializes under the NEXT round's max_by job instead of a
        # dedicated eager job — one driver action per merge round, and
        # the final round's rewrite (never read) is never computed.
        # Lineage still truncates at every materialized round.
        vocab = (vocab.select(merged.alias("_syms"), "_f")
                 .localCheckpoint(eager=False))
    return merges


def bpe_segment(text: Column, merges: "list[tuple[str, str]]") -> Column:
    """Apply an ordered BPE merge list to whitespace tokens → array of
    subword symbols per document.  Map-only: one fold per merge per
    word (fine for the small merge lists :func:`bpe_induce` builds;
    production tokenizers bake thousands of merges into a real
    tokenizer — this is the corpus-side reference implementation that
    pins the semantics)."""
    def apply_one(syms: Column, left: str, right: str) -> Column:
        la, ra, ma = F.lit(left), F.lit(right), F.lit(left + right)
        return F.aggregate(
            syms, F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0) & (F.element_at(acc, -1) == la)
                & (x == ra),
                F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(ma))
            ).otherwise(F.concat(acc, F.array(x))))

    def segment_word(w: Column) -> Column:
        syms = F.split(w, "")
        for left, right in merges:
            syms = apply_one(syms, left, right)
        return syms

    return F.flatten(F.transform(tokens(text), segment_word))


def zipf_fit(docs: DataFrame, text_col: str = "text", *,
             top_k: int = 1000, round_digits: int = 6) -> DataFrame:
    """Least-squares Zipf fit over the corpus rank-frequency curve:
    regress ``ln(tf)`` on ``ln(rank)`` for the ``top_k`` most frequent
    tokens and return one row ``(n_terms, zipf_slope, zipf_intercept,
    zipf_r2)``.  A healthy natural-language corpus fits ``slope ≈ -1``
    with high r²; machine-generated or template-heavy corpora bend the
    curve — a one-row diagnostic cheap enough to run per ingest batch.

    Scale shape: one corpus-sized explode into a map-side-combined
    vocab aggregate, then a DISTRIBUTED top-k (``orderBy().limit()``
    compiles to TakeOrdered — no single-partition sort of the vocab);
    only the ``top_k`` surviving rows pass through the single-partition
    ``row_number`` window, and the regression aggregates them to one
    row.  Ties in frequency are totally ordered by token string so the
    cut at ``top_k`` is deterministic cross-engine.

    Results are rounded: the regression moments are sums over
    ``top_k`` well-conditioned logs, so engines differ only below
    ~1e-10 — far under the ``round_digits`` grain.
    """
    from pyspark.sql import Window

    toks = docs.select(F.explode(tokens(F.col(text_col))).alias("_tok"))
    freqs = toks.groupBy("_tok").agg(F.count("*").alias("_tf"))
    top = freqs.orderBy(F.col("_tf").desc(), F.col("_tok").asc()) \
               .limit(int(top_k))
    w = Window.orderBy(F.col("_tf").desc(), F.col("_tok").asc())
    ranked = top.withColumn("_rank", F.row_number().over(w))
    y = F.log(F.col("_tf").cast("double"))
    x = F.log(F.col("_rank").cast("double"))
    return ranked.agg(
        F.count("*").alias("n_terms"),
        F.round(F.regr_slope(y, x), round_digits).alias("zipf_slope"),
        F.round(F.regr_intercept(y, x), round_digits).alias("zipf_intercept"),
        F.round(F.regr_r2(y, x), round_digits).alias("zipf_r2"))


def html_to_text(html: Column) -> Column:
    """Map-only HTML → plain-text extraction, the web-corpus ingest
    staple (the C4/CCNet pipelines run exactly this class of strip
    before any quality rule sees the text).  Pure ``regexp_replace``
    chain — JVM-side, whole-stage-codegen'd, zero shuffle:

    1. drop ``<script>`` / ``<style>`` blocks wholesale (their text is
       code, not prose) and HTML comments;
    2. replace every remaining tag with a space (tags are word
       boundaries: ``a</p><p>b`` must not fuse into ``ab``);
    3. decode the high-frequency entities (&lt; &gt; &quot; &#39;
       &nbsp;, then &amp; LAST — decoding the ampersand first would
       double-decode nested escapes like ``&amp;lt;`` into ``<`` when
       the page's visible text is the literal ``&lt;``); the long
       tail of exotic entities is left as-is rather than
       half-decoded;
    4. collapse whitespace runs and trim.

    Patterns are RE2-safe (no backreferences or lookaround) so the
    same chain runs verbatim in other engines for oracle checks.
    """
    t = F.regexp_replace(html, r"(?is)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"<[^>]+>", " ")
    for ent, rep in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
                     ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")):
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def extract_links(html: Column) -> Column:
    """All ``href`` targets in an HTML document, in document order —
    the crawl-frontier / link-graph half of web ingest (PageRank over
    the domain graph, anchor harvesting, outlink counts).

    One ``regexp_extract_all`` — map-only, JVM-side.  Handles single-,
    double-, and un-quoted attribute values; case-insensitive; tolerant
    of other attributes before ``href``.  RE2-safe (no lookaround) so
    the identical pattern runs in oracle engines.
    """
    pat = r"""(?i)<a[^>]*\shref\s*=\s*["']?([^"'\s>]+)"""
    return F.regexp_extract_all(html, F.lit(pat), F.lit(1))


def extract_links_with_text(html: Column) -> Column:
    """(href, anchor_text) struct pairs in document order — anchor text
    is a classic relevance/label signal (it describes the TARGET page,
    so harvesting it builds weak supervision for retrieval training).

    Two ``regexp_extract_all`` passes over the SAME pattern (one per
    capture group — the engine extracts one group per call), zipped
    into structs; the match sets are identical by construction, so the
    zip never misaligns.  Anchor text is the raw inner HTML of the
    ``<a>`` element (may itself contain non-anchor tags — run
    :func:`html_to_text` over it for plain text); non-``<a>``-wrapped
    urls are not matched, same contract as :func:`extract_links`.

    UNCLOSED anchors (common in real web HTML) yield NO pair here —
    their hrefs still appear in :func:`extract_links`.  Every anchor
    open is first marked with a ``\\x01`` sentinel and inner text
    matches ``[^\\x01]*?``, so a broken ``<a href=X>`` can never
    swallow the next anchor's href into its "text" (a bare lazy
    ``(.*?)</a>`` would span across the following ``<a``).  The
    sentinel needs no regex lookaround, so the contract is
    reproducible in RE2-based oracle engines; input text containing a
    literal ``\\x01`` control char (invalid in HTML) may drop that
    one anchor.
    """
    marked = F.regexp_replace(html, r"(?i)(<a[\s>])", "\x01$1")
    pat = ("(?is)\x01<a[^>\x01]*\\shref\\s*=\\s*[\"']?"
           "([^\"'\\s>]+)[^>\x01]*>"
           "([^\x01]*?)</a\\s*>")
    hrefs = F.regexp_extract_all(marked, F.lit(pat), F.lit(1))
    texts = F.regexp_extract_all(marked, F.lit(pat), F.lit(2))
    return F.zip_with(hrefs, texts,
                      lambda h, t: F.struct(h.alias("href"),
                                            t.alias("anchor")))


def bigram_logprob_score(docs: DataFrame, text_col: str = "text", *,
                         id_col: str = "doc_id",
                         alpha: float = 1.0,
                         round_digits: int = 4,
                         cache_registry: Optional[list] = None
                         ) -> DataFrame:
    """Interpolated bigram-LM scoring — the KenLM-lite upgrade over
    :func:`unigram_logprob_score`: per-document mean ``-ln p(w2|w1)``
    with additive unigram interpolation

        ``p(w2|w1) = (c(w1,w2) + alpha * p(w2)) / (c(w1,·) + alpha)``

    where ``c(w1,·)`` is the bigram-prefix count and ``p(w2)`` the
    corpus unigram MLE.  Word-salad documents score high even when
    individual tokens are common — the signal unigram scoring misses.

    Scale shape: the scan+tokenize lineage re-evaluates in THREE
    map-only branches (bigram-count build, join probe, unigram
    counts) — recompute-over-materialize is the deliberate trade, a
    corpus-scale tokenized intermediate is never persisted.  Each
    aggregate is map-side partial.  The bigram count table is joined
    back by a key-partitioned SHUFFLE join — never broadcast: a
    web-scale bigram vocabulary is data-sized.  The unigram and
    prefix tables are vocab-sized, persisted (register via
    ``cache_registry`` for cleanup) and broadcast.  Scores carry the
    same ``round_digits`` cross-engine contract as the unigram
    scorer.  Documents with fewer than two tokens emit no bigrams and
    are absent from the output.
    """
    toks = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_ts"))
    ts = F.col("_ts")
    kk = F.greatest(F.size(ts) - 1, F.lit(0))
    pairs_arr = F.when(
        F.size(ts) >= 2,
        # zip of shifted slices, not element_at indexing: even though
        # _ts is a projected column, CollapseProject can inline the
        # tokenization into a consuming lambda, going O(wc²) per doc
        F.zip_with(F.slice(ts, 1, kk), F.slice(ts, 2, kk),
                   lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bi = (toks.select(F.col(id_col), F.explode(pairs_arr).alias("_p"))
          .select(F.col(id_col), F.col("_p.w1").alias("_w1"),
                  F.col("_p.w2").alias("_w2")))

    bic = bi.groupBy("_w1", "_w2").agg(F.count("*").alias("_c12"))
    # prefix counts derive from the bigram table (vocab-sized input),
    # not from a third corpus pass
    pref = (bic.groupBy("_w1")
            .agg(F.sum("_c12").cast("long").alias("_c1")).persist())
    stream = toks.select(F.explode("_ts").alias("_tok"))
    uni = stream.groupBy("_tok").agg(F.count("*").alias("_tf")).persist()
    if cache_registry is not None:
        cache_registry.extend([pref, uni])
    total = uni.agg(F.sum("_tf")).collect()[0][0] or 1

    p_w2 = F.col("_tf") / F.lit(float(total))
    p_cond = ((F.col("_c12") + F.lit(float(alpha)) * p_w2)
              / (F.col("_c1") + F.lit(float(alpha))))
    return (bi.join(bic, ["_w1", "_w2"])
            .join(F.broadcast(pref), "_w1")
            .join(F.broadcast(uni.withColumnRenamed("_tok", "_w2")),
                  "_w2")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_bigrams"),
                 F.round(F.avg(-F.log(p_cond)), round_digits)
                 .alias("avg_neg_logprob_bi")))
