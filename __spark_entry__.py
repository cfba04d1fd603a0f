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

# Round-7 window (VERDICT r6 "Next round" #2). Composition — after this
# round NO registry query's last driver row is older than r5:
#   * the THREE queries that have never had a driver row: q120/q121/
#     q125 (born r6 outside the 50-slot window — the r6 ADVICE called
#     out exactly this gap);
#   * the ELEVEN queries whose last driver row is r3/r4 (they yielded
#     their r6 slots to the newborn operators): q04, q06, q07, q09,
#     q11, q16-q18, q21, q26, q80;
#   * FOUR r6 anchors whose code paths change THIS round and need a
#     fresh row on the new code: q54 (quantized verify pre-filter),
#     q122 (oracle split-parity fix), plus q104/q118 covering the
#     shared dedup-funnel/index lineage;
#   * THIRTY-TWO r5-era refreshes (events q30-q37, text q40-q49,
#     similarity q50-q53/q55/q57-q59, generation/mapping q62/q65-q67,
#     conditional-agg q23/q25) — oldest-first rotation. The 18 r5 rows
#     left out (q70-q79, q82, q92, q94-q97, q101, q102) rotate in next
#     round; each leaves an in-window cousin on the same module
#     (q70-q78→q04-q26 relational core, q92→q34-adjacent salted events
#     path via q37, q95/q101→q104/q118/q122 funnel, q96/q102→q122).
DRIVER_WINDOW = [
    # never driver-checked (born r6, post-window)
    "q120_temperature_mixture", "q121_source_divergence",
    "q125_fuzzy_prefix_dedup",
    # r3/r4-stale relational core
    "q04_priority_with_returns", "q06_forecast_revenue",
    "q07_acctbal_by_nation", "q09_returned_revenue_top_customers",
    "q11_cube_lineitem", "q16_distinct_segments",
    "q17_nations_intersect", "q18_nations_except",
    "q21_brand_prefix_stats", "q26_exact_distinct_customers",
    "q80_deterministic_sample",
    # r6 anchors on round-7-changed code paths
    "q54_cosine_near_dups", "q104_ngram_jaccard_join",
    "q118_incremental_dedup", "q122_pipeline_funnel",
    # r5-era refresh: events / streaming batch twins
    "q30_tumbling_hourly", "q31_sliding_hourly", "q32_user_sessions",
    "q33_json_prop_stats", "q34_asof_click_error",
    "q35_first_event_per_user_type", "q36_hourly_top_event",
    "q37_conversion_funnel",
    # born THIS round (never driver-checked code outranks refreshes;
    # the r6 ADVICE asked for this rule to be applied explicitly):
    # q126 DSIR importance weights, q127 cross-source leakage matrix.
    # They take the slots of q47 (bounded exact-Jaccard baseline —
    # q46 keeps the LSH+verify path in-window) and q52 (norm stats —
    # q50/q53/q55 keep the embedding-agg class in-window).
    "q126_dsir_weights", "q127_leakage_matrix",
    # r5-era refresh: text analysis
    "q40_token_stats", "q41_lang_id", "q42_quality_by_source",
    "q43_fingerprints", "q44_trigram_stats", "q45_exact_dedup",
    "q46_minhash_near_dups",
    "q48_simhash_buckets", "q49_bpe_token_stats",
    # r5-era refresh: similarity / sketches
    "q50_knn_bruteforce", "q51_label_centroids",
    "q53_ann_bucket_stats", "q55_ivf_ann", "q57_bloom_membership",
    "q58_dup_clusters", "q59_token_entropy",
    # r5-era refresh: generation / mapping / conditional aggs
    "q62_gen_validation_report", "q65_distinct_tcs_histogram",
    "q66_winnowing_fingerprints", "q67_tfidf_top_terms",
    "q23_conditional_agg", "q25_approx_distinct_customers",
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
