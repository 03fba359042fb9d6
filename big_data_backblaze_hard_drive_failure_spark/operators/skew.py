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
    (salt columns are dropped)."""
    rand = F.rand(seed) if seed is not None else F.rand()
    left = skewed.withColumn(
        SALT_COL, (rand * n_salts).cast("int")
    )
    right = small.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    return left.join(right, [on, SALT_COL], how).drop(SALT_COL)
