"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship SIT-validation scan on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB-equivalent SQL per query (omitted only for
ops whose results are engine-specific by nature).

Driver-window rotation lives HERE, not in the product registry
(``synthetic_data_pipeline_spark/queries.py`` stays in natural module
order): the external harness records correctness rows for only the
FIRST 50 ``queries()`` entries per round, so ``DRIVER_WINDOW`` lists
the 50 names that most need a fresh driver row this round. Every query
is additionally verified every round by ``scripts/driver_sim.py``,
which emits a full-registry ``CORRECTNESS_LOCAL_r{N}.json`` artifact;
``tests/test_registry_window.py`` pins the window's invariants.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from synthetic_data_pipeline_spark.queries import all_oracles, all_queries  # noqa: E402

# Round-3 window. Composition:
#   * the 36 queries whose last driver row predates the round-2
#     ranking refactor of operators/relational.py (q01-q22, q24,
#     q26-q28, q30-q37, q80, q81) — VERDICT r2 "Next round" #1;
#   * every query whose implementation or shared dependency changed
#     since its last driver row: q98 (new), q56 (new oracle), q54
#     (band-signature invariant), q29 (ranking two-phase docs/guard),
#     q62/q90/q91/q93 (generation.py + sitscan.py issue-list work);
#   * queries this round's template/perf work will touch: q60, q61,
#     q63, q64, q65 (generated-corpus stats/mapping), q95 (retention
#     perf).
DRIVER_WINDOW = [
    "q01_pricing_summary", "q02_top_revenue_orders",
    "q03_regional_revenue", "q04_priority_with_returns",
    "q05_customers_without_orders", "q06_forecast_revenue",
    "q07_acctbal_by_nation", "q08_parts_by_type",
    "q09_returned_revenue_top_customers", "q10_rollup_orders",
    "q11_cube_lineitem", "q12_top_orders_per_customer",
    "q13_running_total", "q14_order_gap_days",
    "q15_top_parts_by_price", "q16_distinct_segments",
    "q17_nations_intersect", "q18_nations_except",
    "q19_entity_counts_by_nation", "q20_exists_heavy_orders",
    "q21_brand_prefix_stats", "q22_monthly_sales",
    "q24_price_percentiles", "q26_exact_distinct_customers",
    "q27_price_bucket_range_join", "q28_trailing_30d_spend",
    "q30_tumbling_hourly", "q31_sliding_hourly",
    "q32_user_sessions", "q33_json_prop_stats",
    "q34_asof_click_error", "q35_first_event_per_user_type",
    "q36_hourly_top_event", "q37_conversion_funnel",
    "q80_deterministic_sample", "q81_pivot_status",
    # changed since their last driver row (q99 is new: single-pass
    # redaction vs the chain oracle over the match-bearing generated
    # corpus; q100 is new: real-container media decode + features vs
    # an independently derived golden table)
    "q98_validation_failures", "q99_redact_generated",
    "q100_media_features", "q56_kmeans",
    "q54_cosine_near_dups", "q29_price_analytics",
    "q62_gen_validation_report", "q90_flagship_sit_scan",
    "q91_sit_issue_list", "q93_redact_documents",
    # touched by this round's planned template/perf work
    "q60_gen_meta_summary", "q61_gen_corpus_stats",
    "q63_mapping_pack_roundtrip", "q64_mapping_upsert",
]


def _windowed(entries: dict, strict: bool = True) -> dict:
    missing = [n for n in DRIVER_WINDOW if n not in entries]
    if strict and missing:
        raise ValueError(f"DRIVER_WINDOW names without entries: {missing}")
    ordered = {n: entries[n] for n in DRIVER_WINDOW if n in entries}
    ordered.update({n: v for n, v in entries.items() if n not in ordered})
    return ordered


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from synthetic_data_pipeline_spark.operators.sitscan import sit_match_counts

    return sit_match_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _windowed(all_queries())


def oracle_sql() -> dict[str, str]:
    # mirror the window order in case the driver iterates oracles;
    # non-strict: a window query may legitimately lack an oracle
    return _windowed(dict(all_oracles()), strict=False)
