"""Explicit skew-handling primitives (SURVEY.md §4 'explicit engineering').

AQE's skew-join splitting covers sort-merge joins, but two situations at
100 TB still need explicit handling:

1. **Skewed join keys** (one hot key dominates): ``salted_join`` explodes
   the small side N ways and sprays the big side's hot rows across the
   salts, turning one monster task into N normal ones.
2. **Skewed group keys**: ``salted_count`` does a two-phase aggregate
   (partial per salt → final) — the classic map-side-combine pattern made
   explicit for high-cardinality-value groupings where a single reducer
   would receive a hot key's entire value set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Join a skewed ``big`` side to a ``small`` side on ``key``.

    The small side is replicated once per salt (broadcast-sized inputs
    only); the big side picks a deterministic salt per row, so a hot key's
    rows fan out across ``n_salts`` tasks instead of one.

    Only big-side-preserving join types are valid: a small-side-preserving
    join would emit each unmatched small row once per salt.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        raise ValueError(f"salted_join does not support how={how!r}: "
                         "the replicated small side would duplicate "
                         "unmatched rows")
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    small_exp = small.withColumn("_salt", salts)
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*big.columns), F.lit(n_salts))
                  .cast("int"))
    out = big_salted.join(F.broadcast(small_exp), [key, "_salt"], how)
    return out.drop("_salt")


def salted_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """Two-phase count per key: partial counts on (key, salt) → final sum.

    Equivalent to ``df.groupBy(key).count()`` but no reducer ever sees
    more than ~1/n_salts of a hot key's rows in phase one.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    partial = salted.groupBy(key, "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").alias("count"))
