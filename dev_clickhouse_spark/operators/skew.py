"""Skew-mitigating salted join.

At 100 TB, hot keys (one chatty agent, one boilerplate signature) overwhelm
single reducers in shuffle joins.  AQE's skew-join splitting
(spark.sql.adaptive.skewJoin — on in session.py) handles sort-merge skew at
runtime; ``salted_join`` is the explicit variant for when the skewed side
must hash-join a mid-sized table that can't broadcast: the skewed side gets a
uniform salt, the other side is replicated across all salt values, and the
join key becomes (key, salt) — fanning each hot key across ``salt_buckets``
reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    salt_buckets: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Join ``skewed`` to ``other`` on ``on`` with salt fan-out.

    ``other`` is exploded ×``salt_buckets`` (keep it the smaller side);
    supported ``how``: inner / left (semantics identical to the unsalted
    join — the salt is internal and dropped)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    keys = [on] if isinstance(on, str) else list(on)
    salted = skewed.withColumn(
        _SALT, (F.rand(seed) * salt_buckets).cast("int")
    )
    replicated = other.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted.join(replicated, on=[*keys, _SALT], how=how).drop(_SALT)
