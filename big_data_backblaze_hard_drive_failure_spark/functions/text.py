"""Text-analysis expressions: tokenization, shingles, stats.

All are array-function compositions over ``split()`` — narrow,
codegen-friendly, no explode unless a query genuinely needs one row
per token. Fixture ``documents.text`` is single-space-separated ASCII
(FIXTURES.md), so the whitespace tokenizer is exact; the regex
tokenizer handles general text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish pre-tokenization: letter runs, digit runs, single punctuation
BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def tokens(text: Column | str) -> Column:
    """Whitespace tokens (order-preserving, duplicates kept)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def unique_tokens(text: Column | str) -> Column:
    """Distinct token set (order per first occurrence)."""
    return F.array_distinct(tokens(text))


def ngram_shingles(text: str, n: int = 3) -> Column:
    """Word n-gram shingles as space-joined strings: the unit set for
    MinHash/Jaccard near-dup detection. Built with
    ``transform(sequence(...))`` — no explode, no UDF. ``text`` is a
    column NAME (the expression references it several times).

    Docs with fewer than ``n`` tokens yield an EMPTY array: an
    unguarded ``sequence(1, size - n + 1)`` with a non-positive upper
    bound is a DESCENDING sequence in Spark (e.g. ``[1, 0]``), whose
    index 0 then crashes ``element_at`` at runtime.

    The tokenized array is bound ONCE via a 1-element ``transform``
    (SQL has no LET): higher-order lambdas are interpreted, so an
    inline ``split(text)`` inside the per-shingle lambda would re-split
    the document for every shingle position — O(tokens^2) per doc."""
    inner = (
        f"CASE WHEN size(toks) >= {n} THEN "
        f"transform(sequence(1, size(toks) - {n - 1}), "
        f"i -> array_join(slice(toks, CAST(i AS INT), {n}), ' ')) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    return F.expr(
        f"element_at(transform(array(split({text}, ' ')), toks -> {inner}), 1)"
    )


def token_count_regex(text: Column | str, pattern: str = BPE_ISH_PATTERN) -> Column:
    """Token count under a BPE-ish regex pre-tokenizer (the standard
    LLM-pipeline 'how many tokens is this corpus' estimator)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))


def avg_token_len(text: Column | str) -> Column:
    """Mean token length as exact-integer division (sum(len)/n) so the
    double is bit-identical across engines."""
    toks = tokens(text)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return total * 1.0 / F.size(toks)


def stopword_hits(text: Column | str, stopwords: tuple[str, ...]) -> Column:
    """Count of tokens that are stopwords (duplicates counted)."""
    lit_array = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(lit_array, t)))
