"""Python UDTFs — the table-function escape hatch (one row in, N out).

Spark-first policy ordering for 1→N expansion:
1. ``explode``/``posexplode`` over native array expressions (codegen);
2. ``mapInPandas`` generators (Arrow-batched — see multimodal);
3. a registered UDTF (this module) when the expansion must be callable
   from SQL (``..., LATERAL chunk_text(text, 30)``) or needs per-row
   Python logic.  Row-at-a-time Python: keep off the hot path.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk string, n_tokens int")
class ChunkText:
    """Split a document into fixed-size token chunks (context windows
    for training): yields (chunk_idx, chunk_text, n_tokens)."""

    def eval(self, text: str, chunk_size: int):  # noqa: D102
        if text is None:
            return
        toks = text.split()
        for i in range(0, len(toks), chunk_size):
            part = toks[i:i + chunk_size]
            yield i // chunk_size, " ".join(part), len(part)


def register_udtfs(spark) -> None:
    """Make the module's UDTFs callable from SQL."""
    spark.udtf.register("chunk_text", ChunkText)
