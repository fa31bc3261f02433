"""Scalar/column function library: text analysis + general helpers.

The reference delegates all scalar work to arbitrary Python callables
(``Cast``/``Custom``/``Map`` — reference ``transformations.py:64-77``);
here every function is a native Column expression so it stays inside
whole-stage codegen.
"""

from .text import (
    STOPWORDS,
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
    tokens,
)

__all__ = ("STOPWORDS", "doc_fingerprint", "lang_id", "quality_score",
           "token_count", "tokens")
