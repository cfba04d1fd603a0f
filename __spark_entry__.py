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

# Round-9 window (VERDICT r8 "Next round" #1). Composition — after
# this round NO registry query's last driver row is older than r7:
#   * ALL TWENTY-FOUR rows whose last driver row is r6 (exactly the
#     rotation set round 8 promised): q19, q20, q24, q28, q56,
#     q60/q61, q63/q64, q81, q100, q103, q108-q115, q117, q119,
#     q123, q124;
#   * the THREE never-driver-checked queries born this round: q133
#     (video frame features — the PyAV/imageio-gated video arm's
#     driver-checked twin, two chained Arrow passes), q134 (longest
#     duplicated span — gaps-and-islands run lengths over q131's
#     position grams) and q135 (incremental longest-span ingest gate
#     with a persisted-index streaming twin);
#   * THREE anchors on round-9-changed code paths: q122 (the funnel
#     apply path gained the cross-batch keeper write-back), q100
#     (multimodal module gained the compressed-video arm; it is also
#     r6-stale, so it counts in both buckets), plus the evergreen
#     q01/q90 flagship anchors;
#   * FIFTEEN queries born MID-round-9 (q136-q140: the tokenizer
#     apply pair, hard-negative mining, star-contraction components,
#     the waterfill allocator; q141-q150: tokenizer fertility, the
#     centroid similarity matrix, corpus distinct-n diversity,
#     quality-based cluster representatives, the cluster-aware
#     leakage-free split, A-ES weighted sampling, boilerplate-gram
#     detection, perceptual-hash image dedup, the bigram-LM artifact
#     export, the pack-vs-pad audit) — never driver-checked, so they
#     claim slots immediately;
#   * the oldest r7-era refreshes, weighted toward the graded
#     LLM tiers: dedup (q46, q127), similarity (q55), textops
#     (q126), generation (q62). The r7 rows left out (q04, q06,
#     q07, q09, q11, q16-q18, q21, q23, q25, q26, q30-q37, q40-q45,
#     q48-q51, q53, q57-q59, q65-q67, q80, q118, q120, q121, q125 —
#     q45/q48/q49/q50/q53/q58/q65/q66/q118/q125 ceded their seats
#     to the q141-q150 newborns; q58's histogram stays checked via
#     the in-window q139 which shares its oracle, q118's
#     incremental-ingest pattern via the in-window q132/q135)
#     rotate next round; each leaves an in-window cousin on the same
#     module.
DRIVER_WINDOW = [
    # never driver-checked (born this round)
    "q133_video_frame_features", "q134_longest_dup_span",
    "q135_incremental_span_gate",
    # r6-stale: full promised rotation set
    "q19_entity_counts_by_nation", "q20_exists_heavy_orders",
    "q24_price_percentiles", "q28_trailing_30d_spend",
    "q56_kmeans", "q60_gen_meta_summary", "q61_gen_corpus_stats",
    "q63_mapping_pack_roundtrip", "q64_mapping_upsert",
    "q81_pivot_status", "q100_media_features", "q103_lp_convergence",
    "q108_click_error_interval", "q109_perplexity_proxy",
    "q110_embedding_outliers", "q111_adaptive_quality",
    "q112_sequence_packing", "q113_domain_mixture",
    "q114_stratified_sample", "q115_packed_shards",
    "q117_cms_heavy_hitters", "q119_token_shards",
    "q123_dense_hourly", "q124_session_sequences",
    # anchors on round-9-changed code paths + flagship evergreens
    "q122_pipeline_funnel", "q01_pricing_summary",
    "q90_flagship_sit_scan",
    # r7-era refresh: dedup / similarity / sketches tiers
    "q46_minhash_near_dups",
    "q127_leakage_matrix",
    "q55_ivf_ann",
    # r7-era refresh: textops / generation tiers
    "q126_dsir_weights",
    "q62_gen_validation_report",
    # born mid-round-9: the tokenizer APPLY pair (q136 vocab export,
    # q137 encoded docs), hard-negative mining (q138), star-
    # contraction connected components (q139) and the token-budget
    # waterfill (q140). They take the slots of the r7-refresh fillers
    # q40-q42, q44 and q34 — those stay r7-fresh and rotate next
    # round with the rest of the r7 cohort.
    "q136_bpe_vocab", "q137_bpe_encode",
    "q138_hard_negatives", "q139_cc_star_clusters",
    "q140_token_budget_waterfill",
    # born late-round-9: tokenizer fertility by language (q141, the
    # multilingual fairness audit riding q128's merge lineage), the
    # label-centroid similarity matrix (q142) and corpus-level
    # distinct-n diversity (q143). They displace the r7-refresh
    # fillers q45, q53 and q65 — those stay r7-fresh and rotate with
    # the r7 cohort next round.
    "q141_tokenizer_fertility", "q142_centroid_similarity",
    "q143_corpus_diversity",
    # quality-based cluster representative selection (q144, the
    # keep-the-best-copy dedup policy over the LP funnel's clusters)
    # and the cluster-aware leakage-free split (q145); they displace
    # the r7-refresh fillers q48 and q49 (q46 anchors the dedup tier,
    # q128/q136/q137/q141 cover the BPE tier).
    "q144_cluster_representatives",
    "q145_cluster_aware_split",
    # deterministic A-ES weighted sampling (q146); displaces the
    # r7-refresh filler q50 (q55 IVF + q138 anchor the similarity tier).
    "q146_weighted_sample",
    # within-source boilerplate 4-gram detection (q147); displaces the
    # r7-refresh filler q66 (q126/q62 keep the textops/generation
    # anchors; q131/q105 cover the gram tier in-window).
    "q147_boilerplate_grams",
    # perceptual-hash image dedup (q148, container-swapped twins);
    # displaces the r7-refresh filler q58 — q139 is in-window and
    # shares q58's oracle, so the histogram semantics stay checked.
    "q148_image_phash_dups",
    # bigram-LM artifact export (q149, the train side of q109/q111);
    # displaces the r7-refresh filler q125 (q46/q127 keep the dedup
    # tier anchored).
    "q149_bigram_lm_export",
    # pack-vs-pad decision audit (q150); displaces the r7-refresh
    # filler q118 — the incremental-ingest pattern stays checked via
    # the in-window q132/q135.
    "q150_padding_audit",
]
# q151 (behavioral bot signals), q152 (Manku-style SimHash
# Hamming-radius join), q153 (image thumbnails — the resize member
# of the multimodal quartet) and q154 (audio RMS/zero-crossing
# screen), born after the 50 slots were spoken for, deliberately stay
# OUT of the round-9 window rather than thin the five remaining
# r7-refresh anchors (q46, q127, q55, q126, q62) further; they are
# covered by the full-registry local gate this round and claim driver
# slots first thing in round 10.


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
