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

# Round-6 window (VERDICT r5 "Next round" #1). Composition:
#   * 34 of the 41 queries whose last driver row is r3/r4 (the r5
#     rotation checked the complement) — the relational core, the
#     similarity stragglers q54/q56, the generation/mapping tier
#     q60-q61/q63-q64, pivot q81, the flagship scans q90-q91,
#     redaction q93, and q98-q100; the other eleven (q04/q06/q07/
#     q09/q11/q16/q17/q18/q21/q26/q80) yielded their slots to newborn operators, each
#     leaving an in-window cousin on the same code path;
#   * q103 as the anchor for the shared LP funnel (its lineage runs
#     shingles → LSH candidates → label propagation, covering the
#     round-6 funnel-sharing change for q46/q58/q95/q101 too);
#   * the NINETEEN operators NEW this round (q104–q119, q122–q124) —
#     brand-new code has no driver row at all, so it outranks
#     r5-green anchors.
DRIVER_WINDOW = [
    # relational core — last driver row r3/r4. Eleven of the original
    # 41-stale set (q04, q06, q07, q09, q11, q16-q18, q21, q26, q80)
    # yield
    # their slots to the q112–q119/q122 operators born this session:
    # never-driver-
    #   checked code outranks refreshing an r3/r4-green row, and each
    # displaced query leaves an in-window cousin on the same code path
    # (q06→q01 pushdown scan, q16/q26→q25-r5/q19 distinct-aggs,
    # q17/q18→q19 set-ops module, q21→q08 prefix-group stats,
    # q80→q96/q114 deterministic sampling).
    "q01_pricing_summary", "q02_top_revenue_orders",
    "q03_regional_revenue",
    "q05_customers_without_orders",
    "q08_parts_by_type",
    "q10_rollup_orders",
    "q12_top_orders_per_customer",
    "q13_running_total", "q14_order_gap_days",
    "q15_top_parts_by_price",
    "q19_entity_counts_by_nation", "q20_exists_heavy_orders",
    "q22_monthly_sales",
    "q24_price_percentiles",
    "q27_price_bucket_range_join", "q28_trailing_30d_spend",
    "q29_price_analytics",
    # similarity stragglers — last driver row r3/r4
    "q54_cosine_near_dups", "q56_kmeans",
    # generation / mapping tier — last driver row r3/r4
    "q60_gen_meta_summary", "q61_gen_corpus_stats",
    "q63_mapping_pack_roundtrip", "q64_mapping_upsert",
    # sampling / pivot — last driver row r3/r4
    "q81_pivot_status",
    # flagship scans, redaction, validation/media — last row r3/r4
    "q90_flagship_sit_scan", "q91_sit_issue_list",
    "q93_redact_documents", "q98_validation_failures",
    "q99_redact_generated", "q100_media_features",
    # anchor: q103 (new LP convergence probe) consumes the shared
    # funnel lineage (shingles → LSH candidates → LP), so it covers the
    # round-6 funnel-sharing change for the whole q46/q58/q95/q101
    # group; q61 (above, stale-rotation) covers the corpus-texture
    # change in plans/generate.py
    "q103_lp_convergence",
    # new operators this session — new code needs driver rows most:
    # q104–q108 displaced the r5-green continuity anchors q32/q36/q58/
    # q95/q102, and q109–q111 (added late in the session) displaced the
    # r5-green anchors q46/q62/q101, whose code paths are covered by
    # q103 + pytest + the full-registry local parity artifact
    "q104_ngram_jaccard_join", "q105_decontaminate",
    "q106_repetition_signals", "q107_quantized_knn",
    "q108_click_error_interval", "q109_perplexity_proxy",
    "q110_embedding_outliers", "q111_adaptive_quality",
    "q112_sequence_packing", "q113_domain_mixture",
    "q114_stratified_sample", "q115_packed_shards",
    "q116_length_curriculum", "q117_cms_heavy_hitters",
    "q118_incremental_dedup", "q119_token_shards",
    # the capstone funnel (q122) takes q11's slot (q10 keeps the
    # rollup/cube path in-window); the densify op (q123) takes q07's
    # (q03/q08/q19 keep the broadcast-dim + group-agg class)
    "q122_pipeline_funnel", "q123_dense_hourly",
    # q124 takes q09's slot (q02 keeps the ranked-top-k join-agg class)
    "q124_session_sequences",
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
