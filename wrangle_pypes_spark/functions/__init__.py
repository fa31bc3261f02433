"""Scalar/column function library: text analysis + general helpers.

The reference delegates all scalar work to arbitrary Python callables
(``Cast``/``Custom``/``Map`` — reference ``transformations.py:64-77``);
here every function is a native Column expression so it stays inside
whole-stage codegen.
"""

from .urls import (
    blocklist_filter,
    canonical_url,
    domain_stats,
    host_suffix_set,
    registered_domain,
    url_host,
    url_port,
    url_path,
    url_query,
    url_scheme,
    url_tld,
)
from .text import (
    bigram_logprob_score,
    html_to_text,
    STOPWORDS,
    bm25_scores,
    bpe_induce,
    bpe_segment,
    chunk_documents,
    corpus_top_ngrams,
    doc_fingerprint,
    extract_links,
    inverted_index,
    lang_id,
    normalize_text,
    quality_score,
    script_mix,
    token_count,
    token_pmi_pairs,
    tokens,
    unigram_logprob_score,
    zipf_fit,
    word_ngrams,
)

__all__ = ("STOPWORDS", "bigram_logprob_score", "bm25_scores", "bpe_induce", "bpe_segment",
           "chunk_documents",
           "corpus_top_ngrams", "html_to_text",
           "doc_fingerprint", "extract_links", "inverted_index", "lang_id", "quality_score",
           "script_mix", "token_count", "token_pmi_pairs", "tokens",
           "normalize_text",
           "unigram_logprob_score", "word_ngrams", "zipf_fit",
           "blocklist_filter", "canonical_url", "domain_stats",
           "host_suffix_set", "registered_domain", "url_host", "url_path",
           "url_port", "url_query", "url_scheme", "url_tld")
