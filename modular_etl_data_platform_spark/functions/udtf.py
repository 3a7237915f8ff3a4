"""Python UDTF surface (SURVEY §2.11).

The reference declares no UDTFs — every table-generating op it needs is
native (G1 date-dim via ``explode(sequence(...))``). The engine still
exposes the registration point so users can add table functions the
built-ins can't express; ``ChunkText`` is the worked example (and the
UDTF twin of the expression-based ``corpus/text.py::chunk_text``, which
remains the hot-path form — UDTFs run row-at-a-time in Python workers,
so prefer the native expression unless per-row logic genuinely needs
Python).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_no int, chunk_text string, chunk_tokens int")
class ChunkText:
    """Overlapping token-window chunks of one document.

    SQL: ``SELECT c.* FROM docs, LATERAL chunk_text(text, 50, 10) c``.
    """

    def eval(self, text: str, chunk_tokens: int = 50, overlap: int = 10):
        if text is None:
            return
        words = text.split(" ")
        stride = max(chunk_tokens - overlap, 1)
        n = 0
        for start in range(0, max(len(words) - overlap, 1), stride):
            window = words[start : start + chunk_tokens]
            if not window:
                break
            yield n, " ".join(window), len(window)
            n += 1


def register_udtfs(spark) -> None:
    """Register the engine's UDTFs for SQL use on a session."""
    spark.udtf.register("chunk_text", ChunkText)
