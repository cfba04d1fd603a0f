"""Skew-mitigation helpers (SURVEY.md §4.4): two-level (salted)
aggregation for algebraic aggregates. AQE's skew-join handling covers
joins; hot GROUP BY keys are handled here by salting the key space —
partial aggregation over (key, salt), then a final reduce over the tiny
(key) space. Results are exactly equal to the direct aggregation for
algebraic functions (sum/count/min/max); use the direct form for
non-decomposable aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summing partial counts
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """``aggs``: output_name → (fn, column), fn ∈ {sum,count,min,max}.

    Level 1 shuffles on (keys, salt) — hot keys split across n_salts
    reducers — level 2 shuffles only |distinct keys| rows.

    The salt is derived from row CONTENTS only (hash of every column):
    a non-deterministic salt (monotonically_increasing_id, rand) used as
    a shuffle key can drop/double-count partials when a stage retry
    recomputes map tasks with different values (SPARK-23207 class).
    Identical duplicate rows share a salt — correct, and hot keys still
    fan out because their non-key columns vary.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    partial_exprs = []
    final_exprs = []
    for name, (fn, col) in aggs.items():
        if fn not in _MERGE:
            raise ValueError(f"{fn} is not algebraic; use a direct groupBy")
        partial = F.count(col) if fn == "count" else getattr(F, fn)(col)
        partial_exprs.append(partial.alias(f"_p_{name}"))
        final_exprs.append(_MERGE[fn](f"_p_{name}").alias(name))
    return (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*partial_exprs)
        .groupBy(*keys)
        .agg(*final_exprs)
    )
