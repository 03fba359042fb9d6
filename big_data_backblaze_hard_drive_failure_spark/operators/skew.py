"""Skew-mitigation join: key salting.

AQE's skew-join handling (on in session.py) splits oversized
partitions at runtime and is the first line of defense. Salting is
the explicit fallback for the pathological case AQE can't fix: ONE
hot key whose single-key row group exceeds an executor (the classic
null-key / default-value / celebrity-entity problem).

Mechanics: the big (skewed) side gets a random salt in [0, n); the
small side is EXPLODED n ways (one copy per salt value); the join key
becomes (key, salt). The hot key's rows now spread across n tasks.
Cost: the small side is replicated n times — use only when the
replicated side stays broadcast-sized, and keep n close to the skew
factor, not larger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


_SALT_SAFE_HOW = {"inner", "left", "left_outer", "leftouter",
                  "left_semi", "leftsemi", "left_anti", "leftanti",
                  "semi", "anti"}  # Spark accepts the bare aliases too


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    seed: int | None = 42,
) -> DataFrame:
    """Equi-join ``skewed ⋈ small`` on ``on`` with the hot-key rows
    spread over ``n_salts`` subtasks. Result equals a plain join
    (salt columns are dropped) for the SUPPORTED join types only:
    inner / left / left_semi / left_anti. Right- and full-outer are
    rejected — the exploded small side would emit each unmatched
    small-side row once per salt (``n_salts`` duplicates with null
    left columns), which no post-hoc drop can undo safely."""
    if how.lower().replace("_", "") not in {
        h.replace("_", "") for h in _SALT_SAFE_HOW
    }:
        raise ValueError(
            f"salted_join does not support how={how!r}: the small side "
            "is replicated per salt, so right/full-outer joins would "
            "duplicate unmatched small-side rows n_salts times. "
            "Use inner/left/left_semi/left_anti, or salt the other side."
        )
    rand = F.rand(seed) if seed is not None else F.rand()
    left = skewed.withColumn(
        SALT_COL, (rand * n_salts).cast("int")
    )
    right = small.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    return left.join(right, [on, SALT_COL], how).drop(SALT_COL)
