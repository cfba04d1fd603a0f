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

# Round-5 window (VERDICT r4 "Next round" #3). Composition:
#   * the 39 queries whose last driver row is r2 — the whole
#     LLM-pipeline tier (q40-q53, q55, q57-q59, q65-q67, q94-q97),
#     the TPC-H-pattern tier (q70-q79), plus q23, q25, q82, q92 —
#     the r3/r4 windows burned two rounds re-checking the other 50;
#   * q32 plus every other events-table query (q30, q31, q33-q37):
#     this round's normalize_ts loader fix changes the type they all
#     read, and q32 must flip its two-round-red driver row to green;
#   * three anchors re-pinning unchanged hot paths on the new loader:
#     q01 (relational core), q62 and q90 (flagship scans).
DRIVER_WINDOW = [
    # q32 first: driver-red in r3+r4, fixed this round (TIMESTAMP_NTZ)
    "q32_user_sessions",
    # events tier — all consumers of the normalized ts column
    "q30_tumbling_hourly", "q31_sliding_hourly",
    "q33_json_prop_stats", "q34_asof_click_error",
    "q35_first_event_per_user_type", "q36_hourly_top_event",
    "q37_conversion_funnel", "q92_salted_event_stats",
    # last driver row r2: relational stragglers
    "q23_conditional_agg", "q25_approx_distinct_customers",
    "q70_cheapest_supplier_per_nation", "q71_important_parts",
    "q72_top_revenue_nation", "q73_large_quantity_orders",
    "q74_disjunctive_revenue", "q75_wealthy_inactive_customers",
    "q76_grouping_sets", "q77_nation_pair_volume",
    "q78_brand_revenue_share", "q79_histogram_quantiles",
    "q82_unpivot_nation_stats",
    # last driver row r2: text-analysis / dedup / similarity tier
    "q40_token_stats", "q41_lang_id", "q42_quality_by_source",
    "q43_fingerprints", "q44_trigram_stats", "q45_exact_dedup",
    "q46_minhash_near_dups", "q47_pairwise_jaccard_sample",
    "q48_simhash_buckets", "q49_bpe_token_stats",
    "q50_knn_bruteforce", "q51_label_centroids", "q52_norm_stats",
    "q53_ann_bucket_stats", "q55_ivf_ann", "q57_bloom_membership",
    "q58_dup_clusters", "q59_token_entropy",
    "q65_distinct_tcs_histogram", "q66_winnowing_fingerprints",
    "q67_tfidf_top_terms", "q94_token_chunks",
    "q95_dedup_retention", "q96_dataset_split", "q97_quality_filter",
    # new this round: the dedup action materialized (anti-join +
    # summary over the LP clusters) and the composed training-data
    # prep chain (quality filter -> exact dedup -> split -> stats)
    "q101_deduped_corpus", "q102_training_prep",
    # anchor: generation.py changed this round (inject_faults refactor)
    "q62_gen_validation_report",
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
