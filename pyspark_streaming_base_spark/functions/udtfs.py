"""Python UDTFs (Spark 4 user-defined table functions) — the SQL-lateral
API surface of the engine.

``ChunkDoc`` mirrors the expression-based document chunker
(``queries/text.py::q86_doc_chunking``: 32-token windows, stride 24) as a
table function usable from pure SQL::

    SELECT c.* FROM documents, LATERAL chunk_doc(doc_id, text) c

API-surface note, not a hot path: UDTFs evaluate row-at-a-time in Python
workers — the registry's q86 stays the 100 TB implementation (sequence +
slice expressions, zero Python). The parity test asserts the two produce
identical chunks, so a SQL user composing LATERAL joins gets the same
semantics the optimized path computes.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

#: Must match queries/text.py q86 (single source of chunking geometry).
CHUNK_SIZE = 32
CHUNK_STRIDE = 24


@udtf(returnType="chunk_id: bigint, n_chunk_tokens: bigint, chunk_text: string")
class ChunkDoc:
    """Overlapping token windows of one document, q86 geometry."""

    def eval(self, doc_id: int, text: str):  # noqa: ARG002 (SQL signature)
        toks = [w for w in (text or "").split(" ") if w]
        n = len(toks)
        for s in range(0, n, CHUNK_STRIDE):
            piece = toks[s : s + CHUNK_SIZE]
            yield s // CHUNK_STRIDE, len(piece), " ".join(piece)


def register_udtfs(spark: SparkSession) -> None:
    """Register every engine UDTF for SQL use on this session."""
    spark.udtf.register("chunk_doc", ChunkDoc)
