"""Scalar/array/JSON function layer (SURVEY.md §2.9 extended surface).

Everything here is a *Column expression builder* — pure JVM-side
``pyspark.sql.functions`` compositions that stay inside whole-stage
codegen. No Python UDFs: at 100 TB the difference between a codegen
expression and a row-wise UDF is the difference between a scan-bound
job and a pickle-bound one. The only Python crossing in the whole
datapipe layer is the Arrow-batched multimodal decode stub
(functions/multimodal.py), where external decoders genuinely require
Python.
"""

from .text import (
    avg_token_len,
    ngram_shingles,
    token_count_regex,
    tokens,
    unique_tokens,
)
from .vector import cosine_similarity, dot_product, l2_norm
from .hashing import minhash_expr, simhash16_bit_sums, text_sha256

__all__ = [
    "tokens",
    "unique_tokens",
    "ngram_shingles",
    "avg_token_len",
    "token_count_regex",
    "dot_product",
    "l2_norm",
    "cosine_similarity",
    "text_sha256",
    "minhash_expr",
    "simhash16_bit_sums",
]
