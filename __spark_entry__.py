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

# Round-8 window (VERDICT r7 "Next round" #2). Composition — after
# this round NO registry query's last driver row is older than r6:
#   * the FIVE never-driver-checked queries born this round: q128
#     (BPE merge induction — VERDICT r7 #1), q129 (BPE compression
#     curve), q130 (SemDeDup-style semantic prune), q131 (duplicated
#     -span analysis), q132 (incremental span contamination);
#   * ALL TWENTY queries whose last driver row is r5 (the rotation
#     debt VERDICT r7 #3 flagged): q70-q79, q82, q92, q94-q97, q101,
#     q102, plus q47/q52 (which yielded their r7 slots to the r7
#     newborns);
#   * THREE r7 anchors whose code paths change THIS round: q54
#     (oversized-bucket guard), q104 (PPJoin prefix filtering), q122
#     (funnel lineage shared with the changed streaming-apply path);
#   * TWENTY-TWO oldest r6-era refreshes: the relational core
#     (q01-q03, q05, q08, q10, q12-q15, q22, q27, q29),
#     the SIT scan tier (q90 — ALSO changing this round with the
#     pre-guard, q91, q93, q98, q99), and the heaviest LLM-tier
#     headliners (q105-q107, q116). The 24 r6 rows left out (q19,
#     q20, q24, q28, q56, q60/q61, q63/q64, q81, q100, q103, q108-q115, q117,
#     q119, q123, q124) rotate in next round; each leaves an
#     in-window cousin on the same module.
DRIVER_WINDOW = [
    # never driver-checked (born this round): q128 BPE merges, q129
    # BPE compression curve, q130 semantic prune, q131 duplicated
    # spans, q132 incremental span contamination — they take the
    # slots of q24/q28/q20/q19 (percentile, trailing-window, EXISTS
    # and group-count cousins q22/q27/q29/q79/q05/q08 stay in-window)
    "q128_bpe_merges", "q129_bpe_compression", "q130_semantic_prune",
    "q131_duplicated_spans", "q132_incremental_spans",
    # r5-stale: relational / pivot tiers
    "q70_cheapest_supplier_per_nation", "q71_important_parts",
    "q72_top_revenue_nation", "q73_large_quantity_orders",
    "q74_disjunctive_revenue", "q75_wealthy_inactive_customers",
    "q76_grouping_sets", "q77_nation_pair_volume",
    "q78_brand_revenue_share", "q79_histogram_quantiles",
    "q82_unpivot_nation_stats",
    # r5-stale: events / text / funnel tiers
    "q92_salted_event_stats", "q94_token_chunks",
    "q95_dedup_retention", "q96_dataset_split", "q97_quality_filter",
    "q101_deduped_corpus", "q102_training_prep",
    "q47_pairwise_jaccard_sample", "q52_norm_stats",
    # r7 anchors on round-8-changed code paths
    "q54_cosine_near_dups", "q104_ngram_jaccard_join",
    "q122_pipeline_funnel",
    # r6-era refresh: relational core
    "q01_pricing_summary", "q02_top_revenue_orders",
    "q03_regional_revenue", "q05_customers_without_orders",
    "q08_parts_by_type", "q10_rollup_orders",
    "q12_top_orders_per_customer", "q13_running_total",
    "q14_order_gap_days", "q15_top_parts_by_price",
    "q22_monthly_sales",
    "q27_price_bucket_range_join",
    "q29_price_analytics",
    # r6-era refresh: SIT scan / validation (q90 changes this round)
    "q90_flagship_sit_scan", "q91_sit_issue_list",
    "q93_redact_documents", "q98_validation_failures",
    "q99_redact_generated",
    # r6-era refresh: heaviest LLM-tier headliners
    "q105_decontaminate", "q106_repetition_signals",
    "q107_quantized_knn", "q116_length_curriculum",
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
