"""Python UDTFs (table functions) — Spark 4 lateral generators.

The LLM-pipeline use case: document CHUNKING — one doc in, N
fixed-token-budget chunks out, the row-expanding shape `explode` can't
express when per-row logic is non-trivial. UDTFs run in the Python
worker (Arrow-batched control flow, row-wise eval), so keep them to
genuinely generative logic; pure array math belongs in expressions.

No ``from __future__ import annotations`` here (PEP 563 breaks
pandas_udf/udtf hint inspection).
"""

from pyspark.sql.functions import udtf

CHUNK_TOKENS = 50


@udtf(
    returnType=(
        "doc_id bigint, chunk_idx int, chunk_text string, n_tokens int"
    )
)
class ChunkDocuments:
    """Split a document into fixed-size token chunks (the standard
    pre-tokenization windowing for LLM training corpora)."""

    def eval(self, doc_id: int, text: str):
        if text is None:  # a NULL doc has no chunks — emit nothing
            return
        toks = text.split(" ")
        for idx, start in enumerate(range(0, len(toks), CHUNK_TOKENS)):
            chunk = toks[start : start + CHUNK_TOKENS]
            yield doc_id, idx, " ".join(chunk), len(chunk)


@udtf
class NGramWindows:
    """POLYMORPHIC UDTF (Spark 4 ``analyze`` API): emits sliding
    n-gram windows where the OUTPUT SCHEMA depends on the constant
    argument ``n`` — one ``tok_i`` column per gram position plus the
    joined gram, a shape a fixed returnType cannot express. The
    static ``analyze`` runs on the DRIVER at plan time (n must be a
    foldable literal); ``eval`` then yields matching-width rows in
    the Python worker."""

    @staticmethod
    def analyze(doc_id, text, n):
        from pyspark.sql.functions import AnalyzeResult
        from pyspark.sql.types import (
            IntegerType,
            LongType,
            StringType,
            StructType,
        )

        if n.value is None or not isinstance(n.value, int) or n.value < 1:
            raise ValueError("NGramWindows: n must be a positive int literal")
        schema = (
            StructType()
            .add("doc_id", LongType())
            .add("pos", IntegerType())
        )
        for i in range(n.value):
            schema = schema.add(f"tok{i}", StringType())
        schema = schema.add("gram", StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, doc_id: int, text: str, n: int):
        if text is None:  # a NULL doc has no windows — emit nothing
            return
        toks = text.split(" ")
        for pos in range(len(toks) - n + 1):
            win = toks[pos : pos + n]
            yield (doc_id, pos, *win, " ".join(win))
