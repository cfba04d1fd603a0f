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

# Round-13 window (VERDICT r12 Next #2). Composition — after this
# round NO registry query's last external driver row is older than
# r10 (staleness inventory recomputed from the CORRECTNESS_r*
# artifacts: 44 rows' newest row was r9; all 44 are in this window):
#   * the round-13 newborn q203 (the delta-release classification
#     funnel behind plans/release.py::update_release) — the standing
#     newborn rule;
#   * four changed-path anchors: q201 (its exact arm swapped from the
#     full-sort percentile() aggregate to the q200 sketch-guided
#     order statistic, VERDICT r12 #5 — values bit-identical, but the
#     path is new), q200 (the exact column's rounding gained the
#     1e-9 nudge on BOTH engines, ADVICE r12), and q155/q156 (the
#     boilerplate gram-set computation was factored through
#     source_gram_counts + boilerplate_threshold_filter so the
#     incremental release can merge persisted counts — identical
#     semantics, new code path);
#   * ALL 44 r9-stale rows;
#   * the second round-13 newborn q204 (token-weighted length
#     quantiles on the q200 sketch — VERDICT r12 #9, landed with its
#     q112/q174 token-budget consumer) takes the last slot; the r10
#     tier (49 rows) rotates wholesale in r14, led by q118.
# 2 + 4 + 44 = 50 exactly.
#
# --- Round-12 window rationale kept for the audit trail: newborns
# q200/q201/q202, changed-path anchors q198/q152/q170, the FULL
# 38-row r8-stale tier, and 6 r9 head-start rows
# (q145/q147/q103/q100/q133/q90); recorded green 50/50 in
# CORRECTNESS_r12.json. Round-11: five r10 newborns (q159-q163), all
# 36 r11 newborns, 23 r8-stale rows; green 50/50 in CORRECTNESS_r11.
DRIVER_WINDOW = [
    # round-13 newborn (update_release's gated funnel)
    "q203_delta_release_classes",
    # changed-path anchors: q201's exact arm now rides the q200
    # sketch-guided order statistic (VERDICT r12 #5) and q200's
    # exact column gained the 1e-9 rounding nudge on BOTH engines
    # (ADVICE r12); q155/q156's gram-set path was refactored
    # through source_gram_counts/boilerplate_threshold_filter for
    # the incremental release (same semantics, new code path)
    "q200_quantile_sketch", "q201_percentile_accuracy",
    "q155_boilerplate_clean", "q156_boilerplate_clean_stats",
    # the FULL 44-row r9-stale tier (last external row = r9,
    # recomputed from the CORRECTNESS_r* artifacts — VERDICT r12 #2)
    "q01_pricing_summary", "q19_entity_counts_by_nation",
    "q20_exists_heavy_orders", "q24_price_percentiles",
    "q28_trailing_30d_spend", "q46_minhash_near_dups",
    "q55_ivf_ann", "q56_kmeans",
    "q60_gen_meta_summary", "q61_gen_corpus_stats",
    "q62_gen_validation_report", "q63_mapping_pack_roundtrip",
    "q64_mapping_upsert", "q81_pivot_status",
    "q108_click_error_interval", "q109_perplexity_proxy",
    "q110_embedding_outliers", "q111_adaptive_quality",
    "q112_sequence_packing", "q113_domain_mixture",
    "q114_stratified_sample", "q115_packed_shards",
    "q117_cms_heavy_hitters", "q119_token_shards",
    "q122_pipeline_funnel", "q123_dense_hourly",
    "q124_session_sequences", "q126_dsir_weights",
    "q127_leakage_matrix", "q134_longest_dup_span",
    "q135_incremental_span_gate", "q136_bpe_vocab",
    "q137_bpe_encode", "q138_hard_negatives",
    "q139_cc_star_clusters", "q140_token_budget_waterfill",
    "q141_tokenizer_fertility", "q142_centroid_similarity",
    "q143_corpus_diversity", "q144_cluster_representatives",
    "q146_weighted_sample", "q148_image_phash_dups",
    "q149_bigram_lm_export", "q150_padding_audit",
    # second r13 newborn: weighted quantiles on the q200 sketch
    "q204_weighted_length_quantiles",
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
