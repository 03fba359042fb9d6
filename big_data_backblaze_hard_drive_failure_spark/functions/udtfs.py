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
        toks = text.split(" ")
        for idx, start in enumerate(range(0, len(toks), CHUNK_TOKENS)):
            chunk = toks[start : start + CHUNK_TOKENS]
            yield doc_id, idx, " ".join(chunk), len(chunk)
