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

# Round-12 window (VERDICT r11 Next #1). Composition — after this
# round NO registry query's last driver row is older than r9, and the
# r8 tier is fully cleared (the authoritative staleness inventory is
# computed from the CORRECTNESS_r* artifacts themselves — see
# tests/test_registry_window.py::R2_UNCHECKED — which shows the TRUE
# r8-stale set is 38 rows, not the 34 the r11 VERDICT prose
# enumerated: q47/q52/q71/q82 were r8-stale too):
#   * the two round-12 newborns (q200 mergeable quantile sketch, q201
#     approx_percentile accuracy audit) claim slots immediately — the
#     standing newborn rule;
#   * three changed-path anchors that MUST re-gate externally this
#     round: q198 (dispersion denominator changed n² → n·(n−1),
#     ADVICE r11 — its r11 row pinned the OLD semantics), and
#     q152/q170 (both now read the shared memoized signature frame
#     dedup.simhash_state — same lineage, but the rewiring deserves a
#     fresh row);
#   * ALL 38 r8-stale rows (every query whose last external row is
#     CORRECTNESS_r08);
#   * the round-12 release-funnel capstone q202 (build_release's
#     stage accounting as a driver-gated row — it took the head-start
#     slot q122 would have had: q202 IS the fresher member of the
#     funnel-accounting family, and q122 stays green in the local
#     gate and leads the r13 rotation with the rest of the r9 tier);
#   * 6 head-start rows from the r9 tier (last row CORRECTNESS_r09,
#     the tier r13 must finish): the release pipeline's dependency
#     queries first (q145 cluster-aware split + q147 boilerplate grams
#     + q103 LP labels — build_release now composes all three), the
#     two media rows q100/q133 newly added to bench HEADLINE, and the
#     flagship q90 (entry() rides it and the redaction refactor
#     touched its module).
# 2 + 3 + 38 + 1 + 6 = 50 exactly.
#
# --- Round-11 window rationale kept for the audit trail: five r10
# newborns (q159-q163), all 36 r11 newborns as they landed (each
# evicting an r8-stale row that left an in-window cousin — the full
# per-eviction rationale is in git history at 73d990c), and 23 of the
# r8-stale rows; recorded green 50/50 in CORRECTNESS_r11.json.
DRIVER_WINDOW = [
    # round-12 newborns
    "q200_quantile_sketch", "q201_percentile_accuracy",
    "q202_release_accounting",
    # changed-path anchors (semantics / shared-state rewiring)
    "q198_embedding_dispersion",
    "q152_simhash_hamming_join", "q170_detector_agreement",
    # the full r8-stale tier (38 rows — last external row = r8)
    "q02_top_revenue_orders", "q03_regional_revenue",
    "q05_customers_without_orders", "q08_parts_by_type",
    "q10_rollup_orders", "q13_running_total",
    "q14_order_gap_days", "q15_top_parts_by_price",
    "q22_monthly_sales", "q29_price_analytics",
    "q47_pairwise_jaccard_sample", "q52_norm_stats",
    "q54_cosine_near_dups", "q70_cheapest_supplier_per_nation",
    "q71_important_parts", "q72_top_revenue_nation",
    "q73_large_quantity_orders", "q74_disjunctive_revenue",
    "q77_nation_pair_volume", "q79_histogram_quantiles",
    "q82_unpivot_nation_stats", "q91_sit_issue_list",
    "q92_salted_event_stats", "q93_redact_documents",
    "q94_token_chunks", "q95_dedup_retention",
    "q96_dataset_split", "q97_quality_filter",
    "q98_validation_failures", "q101_deduped_corpus",
    "q102_training_prep", "q105_decontaminate",
    "q106_repetition_signals", "q107_quantized_knn",
    "q128_bpe_merges", "q129_bpe_compression",
    "q130_semantic_prune", "q131_duplicated_spans",
    # r9-tier head start (release-pipeline deps, funnel capstone,
    # the two new bench media rows, the flagship)
    "q145_cluster_aware_split", "q147_boilerplate_grams",
    "q103_lp_convergence",
    "q100_media_features", "q133_video_frame_features",
    "q90_flagship_sit_scan",
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
