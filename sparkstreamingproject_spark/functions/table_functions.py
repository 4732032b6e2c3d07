"""Python user-defined table functions (Spark 4 `@udtf` API).

The engine's production table-generating ops are JVM-side explodes and
Arrow-batched mapInPandas (see text_chunk_windows — the vectorized
chunker); a UDTF is the third extension point: a SQL-addressable
row→rows function (`SELECT ... FROM tbl, chunk_text(text)`) for
call-sites that live in SQL strings rather than DataFrame code. UDTFs
execute row-at-a-time in Python — fine for control-plane/low-volume
use; keep corpus-scale chunking on the vectorized path.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

CHUNK_TOKENS = 16
CHUNK_STRIDE = 8


@udtf(returnType="chunk_idx int, chunk string, n_tokens int")
class ChunkText:
    """Sliding token windows over one document's text (window
    CHUNK_TOKENS, stride CHUNK_STRIDE; the final window starts at the
    first stride covering the tail) as a SQL table function — the
    materialized-text sibling of the plan-only text_chunk_windows
    query."""

    def eval(self, text: str):
        if not text:
            return
        toks = text.split(" ")
        idx = 0
        for start in range(0, len(toks), CHUNK_STRIDE):
            window = toks[start:start + CHUNK_TOKENS]
            yield idx, " ".join(window), len(window)
            idx += 1
            if start + CHUNK_TOKENS >= len(toks):
                break


def register(spark) -> None:
    spark.udtf.register("chunk_text", ChunkText)
