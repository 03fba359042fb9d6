"""Deterministic content hashing: fingerprints, MinHash, SimHash.

Cross-engine constraint: the DuckDB oracle must reproduce every hash,
so all hashing routes through ``md5``/``sha2`` (identical hex output
in Spark and DuckDB) rather than Spark's murmur ``hash()`` (engine-
private). MinHash 'permutations' are salted md5s; min is taken over
the HEX STRING ordering, which both engines sort identically
(lowercase hex, bytewise).

Scale: md5-per-token on 100 TB of text is embarrassingly parallel,
no shuffle until the signature group-by; signatures are tiny (k hex
strings per doc), so the group-by/band join shuffles O(docs), not
O(tokens).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_SALTS = ("s0|", "s1|", "s2|", "s3|")


def text_sha256(text: Column | str) -> Column:
    """Exact-dedup fingerprint (sha256 hex, 64 chars)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.sha2(c, 256)


def minhash_expr(token: Column | str, salt: str) -> Column:
    """One MinHash 'permutation': md5 of salted token; aggregate with
    ``F.min`` per doc to get the signature component."""
    c = F.col(token) if isinstance(token, str) else token
    return F.md5(F.concat(F.lit(salt), c))


def simhash16_bit_sums(token_col: str) -> list[Column]:
    """SimHash accumulators: for each of 16 bits, the per-token vote
    ``+1/-1`` derived from the first 4 hex digits of ``md5(token)``.
    Sum these per doc (``F.sum``), then sign -> fingerprint bit.

    Hex digit -> int via ``instr`` over the hex alphabet (portable to
    ANSI SQL, unlike ``conv``); bit k of digit via integer div/mod.
    """
    out: list[Column] = []
    for j in range(4):  # hex digit positions 1..4
        digit_val = (
            f"(instr('0123456789abcdef', "
            f"substring(md5({token_col}), {j + 1}, 1)) - 1)"
        )
        for k in range(4):  # bits within the digit
            bit = f"(({digit_val} div {2 ** k}) % 2)"
            out.append(F.expr(f"2 * {bit} - 1"))
    return out
