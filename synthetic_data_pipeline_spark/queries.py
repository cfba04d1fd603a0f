"""Central query registry: name → (spark builder, duckdb oracle SQL).

``__spark_entry__.py`` re-exports this. Every operator claimed done in
SURVEY.md §2 lands here with BOTH a builder and (when SQL-expressible)
an oracle — the driver's correctness gate runs the pair at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .functions.rounding import apply_sql_eround
from .operators import assembly, dedup, events, generation, mapping, relational, reshaping, similarity, sitscan, sketches, subqueries, textops
from .sources import multimodal

_MODULES = [assembly, dedup, events, generation, mapping, relational, reshaping, similarity, sitscan, sketches, subqueries, textops, multimodal]

def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry in natural module order. Any driver-window rotation
    (the external harness records only the first 50 entries) lives in
    ``__spark_entry__.py`` — the driver-contract layer — NOT here, so
    product code stays decoupled from harness artifacts."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        dup = set(out) & set(m.QUERIES)
        if dup:
            raise ValueError(f"duplicate query names: {dup}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        # boundary-safe rounding applied to every oracle; the Spark
        # builders apply the identical formula (eround / transformed
        # shared SQL), so both engines compute the same expression.
        out.update({k: apply_sql_eround(v) for k, v in m.ORACLES.items()})
    unknown = set(out) - set(all_queries())
    if unknown:
        raise ValueError(f"oracles without queries: {unknown}")
    return out
