"""Regenerate PLANS.md: formatted physical plans of representative
queries, as reviewable evidence of plan quality (broadcasts, pushdown,
pruning, partial aggregation, TakeOrderedAndProject).

Usage: python scripts/dump_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHOWCASE = [
    ("q01_pricing_summary", "scan → pushed filter → partial+final hash agg"),
    ("q03_regional_revenue", "6-way star join: dims broadcast, facts SMJ"),
    ("q06_forecast_revenue", "all predicates pushed to the parquet scan"),
    ("q15_top_parts_by_price", "global top-k via TakeOrderedAndProject"),
    ("q22_monthly_sales", "column pruning: 2-column ReadSchema"),
    ("q34_asof_click_error", "as-of join: union + running last, one shuffle"),
    ("q46_minhash_near_dups", "MinHash funnel: checkpointed shingles, bucket join"),
    ("q104_ngram_jaccard_join", "capped posting lists: df-filter → shingle equi-join candidates → exact-Jaccard verify"),
    ("q105_decontaminate", "decontamination: benchmark gram set broadcast, narrow gram explode on the train side"),
    ("q106_repetition_signals", "repetition signals: two uniform (doc, gram) count shuffles, |sources|-key agg"),
    ("q107_quantized_knn", "quantized recall audit: 64-row dim stats broadcast, probe-side broadcast dot join"),
    ("q109_perplexity_proxy", "bigram-LM ppl: vocab-bounded model tables broadcast, one scan per pass"),
    ("q111_adaptive_quality", "adaptive filter: percentile threshold from pass 1 broadcast into pass 2"),
    ("q110_embedding_outliers", "outlier z-scores: two uniform dim-exploded aggs, |labels|-row moments broadcast"),
    ("q108_click_error_interval", "interval join: hash join on user_id, time-range as post-join filter"),
    ("q90_flagship_sit_scan", "single-scan multi-regex SIT validation"),
    ("q91_sit_issue_list", "per-pair scan: text never crosses the cap window's shuffle"),
    ("q92_salted_event_stats", "two-level salted agg: hot keys fan out on (key, salt)"),
    ("q93_redact_documents", "PII scrub: one scan, narrow map, zero shuffles"),
    ("q54_cosine_near_dups", "LSH band buckets → equi-join candidates → one-fold dot verify (norms precomputed)"),
    ("q95_dedup_retention", "LSH clusters via label propagation, lineage checkpointed per round"),
    ("q101_deduped_corpus", "dedup action: anti-join corpus vs retention list, one narrow pass"),
    ("q103_lp_convergence", "LP convergence probe: one extra min-label round over the memoized funnel"),
    ("q102_training_prep", "composed prep chain: filter → dedup window → split → agg, two shuffles"),
    ("q29_price_analytics", "two-phase global analytics: range buckets, no global window"),
    ("q112_sequence_packing", "token-budget shards: two-phase bucketed cumsum, no global sort point"),
    ("q114_stratified_sample", "stratified top-K: salted partial + merge aggs, no stratum window"),
    ("q113_domain_mixture", "mixture balancing: |sources|-row rate table broadcast, narrow accept filter"),
    ("q117_cms_heavy_hitters", "count-min sketch: 4096-cell agg, TakeOrdered top-K, broadcast probe join"),
    ("q118_incremental_dedup", "incremental ingest dedup: new-side signatures only, equi-join vs band index, no old-x-old work"),
    ("q119_token_shards", "exact-boundary packing: two-phase cumsum, narrow shard-span explode, exact-cap segments"),
    ("q121_source_divergence", "KL vs corpus: two partial-agg shuffles, token marginals joined back, |sources|-key reduce"),
    ("q122_pipeline_funnel", "capstone funnel: flags on one base frame, single reckoning agg, broadcast mixture threshold"),
    ("q123_dense_hourly", "densify: hour-key agg on the big table, spine-bounded global LOCF window"),
    ("q124_session_sequences", "sequence mining: user_id-partitioned session windows, bounded seq-string agg, TakeOrdered"),
    ("q32_user_sessions", "sessionization: one shuffle on user_id, two windows + agg"),
    ("q98_validation_failures", "failure lines: conditional-agg reuse of the q62 scan"),
    ("q99_redact_generated", "single-pass alternation redaction over generated corpus"),
    ("q100_media_features", "media decode: mapInPandas batches, schema-pinned features"),
    ("q131_duplicated_spans", "span diagnostic: position grams, min!=max two-value cross-doc agg, no pair join"),
    ("q133_video_frame_features", "video frames: explode-shaped sampler chained into a second mapInPandas decode"),
    ("q134_longest_dup_span", "longest dup span: doc_id-partitioned window over the duplicated-position subset only"),
    ("q135_incremental_span_gate", "ingest gate: new-side positional grams semi-join the distinct-gram index, no old-x-old work"),
    ("q137_bpe_encode", "tokenizer encode: corpus tokenized once, Zipf-bounded word map equi-join, vocab broadcast"),
    ("q138_hard_negatives", "hard negatives: bounded anchors broadcast, label inequality inside the join, one corpus scan"),
    ("q140_token_budget_waterfill", "waterfill: one per-source agg, |sources|²-row triangle join for the level, window-free"),
    ("q141_tokenizer_fertility", "fertility audit: one (lang, word) hash agg over the corpus, vocab-bounded wordmap join"),
    ("q142_centroid_similarity", "centroid matrix: one (label, dim) mean agg, broadcast self-join over the bounded centroid table"),
    ("q143_corpus_diversity", "distinct-n diversity: two-level count-distinct (gram agg → per-source agg), window-free"),
    ("q144_cluster_representatives", "best-copy keeper: corpus quality projection once, cluster-bounded max-then-min-id argmax joins"),
    ("q145_cluster_aware_split", "leakage-free split: bounded label table joined once, narrow hash map, 3-key agg"),
    ("q146_weighted_sample", "A-ES weighted sample: salted partial top-K + merge, no per-stratum window"),
    ("q147_boilerplate_grams", "boilerplate grams: one (source, gram) DF agg, broadcast coverage semi-join"),
    ("q148_image_phash_dups", "perceptual image dedup: one Arrow decode+hash pass, JVM hash-group join"),
    ("q149_bigram_lm_export", "LM export: two map-side-combined model aggs, TakeOrdered top-K over the vocab table"),
    ("q150_padding_audit", "pack-vs-pad audit: one narrow map, one |sources|-key agg"),
    ("q151_bot_signals", "bot signals: user-partitioned lag window, two hash aggs, TakeOrdered top-K"),
    ("q152_simhash_hamming_join", "simhash radius join: banded candidates via posexplode self-join, bit_count verify"),
    ("q155_boilerplate_clean", "boilerplate strip: broadcast bp-gram flagging, per-doc covered-position array, higher-order filter rewrite"),
    ("q157_dedup_span_strip", "span strip: dup-subset owner agg (AQE-broadcastable) probe, first-occurrence-wins rewrite"),
    ("q161_matryoshka_audit", "matryoshka audit: broadcast probes, 4 prefix cosines in one pass, checkpointed candidates, bounded per-query windows"),
    ("q163_incremental_clusters", "incremental clusters: new-keyed signature probe, contracted-graph CC, label relabel joins"),
    ("q153_image_thumbnails", "thumbnails: one Arrow decode+resize pass, narrow md5 projection"),
    ("q154_audio_features", "audio screen: one Arrow decode+featurize pass, no shuffle"),
    ("q164_bm25_retrieval", "BM25 retrieval: df-capped query terms broadcast onto bigram posting lists, WindowGroupLimit top-k"),
    ("q165_minhash_calibration", "minhash calibration: per-doc minima frame joined twice to the candidate-bounded pair list"),
    ("q166_event_drift", "drift monitor: one (day, type) hash agg, days×types KL arithmetic, broadcast totals"),
    ("q167_pii_density", "PII density: one guarded multi-regex scan, per-doc re-agg, |sources|-key report join"),
    ("q168_ivf_probe_sweep", "probe sweep: one centroid agg + bounded broadcast-probe scan, sweep exploded over |queries|×|labels| rows"),
    ("q169_dataset_card", "dataset card: three |sources|-row aggregates (percentiles, two-level distinct, lang argmax) joined"),
    ("q170_detector_agreement", "detector agreement: union of both candidate sets, one jaccard verify, signature-frame hamming joins"),
    ("q172_retrieval_decon", "retrieval decon: bench query terms broadcast onto train postings, |sources|-key exposure agg"),
    ("q174_context_length_sweep", "context sweep: corpus collapses to its token-length histogram, sweep explodes over the histogram"),
    ("q175_dedup_threshold_sweep", "threshold sweep: one exact-Jaccard verify, thresholds exploded over the candidate-bounded pair list"),
    ("q178_hybrid_rrf", "hybrid RRF: dense broadcast-probe arm + lexical posting-join arm, corpus-independent full-outer fusion of two ranked lists"),
    ("q179_quality_training_set", "classifier export: ONE narrow corpus scan, both label filters pushed, no join/window; export bounded at ~2x the curated feed"),
    ("q180_memorization_risk", "memorization sweep: positional gram explode, two-level distinct to per-gram doc counts, k-sweep over the bounded (source, ndocs) histogram"),
    ("q181_doremi_mixture", "DoReMi-lite: broadcast bigram-LM tables, one |sources|-row agg, two 1-row broadcast scalars — reweighting is corpus-independent"),
    ("q182_audio_afp_dups", "audio fingerprint dedup: one Arrow decode+fft pass, JVM-side 16-char hash group — q148's exact-dedup shuffle class"),
    ("q183_incremental_shards", "incremental shard append: two range-bucketed cumsums, 1-row base scalar broadcast — old shards never re-packed"),
    ("q184_containment_pairs", "containment pairs: df-capped posting join (no prefix slice), exact array_intersect verify over candidate docs only"),
    ("q185_transition_matrix", "transition matrix: per-user bounded lag window, |types|^2-key count, |types|-key normalization join"),
    ("q186_source_keyness", "source keyness: one (source, token) hash agg, vocab-bounded marginals + broadcast joins, top-K window over the scored vocab frame"),
    ("q187_hourly_anomalies", "hourly anomalies: one map-side-combined hours×types agg, two median passes on the tiny frame, broadcast baseline joins"),
    ("q188_snapshot_diff", "snapshot diff: two narrow md5 manifests, one doc_id-keyed full-outer join, |sources|-key agg — text never crosses the shuffle"),
    ("q189_incremental_ivf", "incremental IVF: checkpointed (label, dim) centroid agg, batch-side broadcast assignment, one (list, dim) member-mean agg for drift"),
    ("q190_calibrated_quality", "calibrated quality: per-doc score scan, |sources|+1 exact-percentile aggs broadcast back, one conditional agg"),
    ("q191_label_noise", "label noise: band-bucket candidate join (never all-pairs), per-vector top-K window over candidates, |labels|-key agg"),
    ("q192_stage_overlap", "stage overlap: memoized funnel drop list left-joined onto one quality-flag projection, |sources|-key Venn agg"),
    ("q193_cohort_retention", "cohort retention: distinct (user, day) + user-keyed min, user-keyed join back, |days|²-bounded matrix agg"),
    ("q194_usage_concentration", "usage concentration: (type, user) hash agg, |types|-key percentile agg broadcast back, window-free"),
    ("q195_cluster_chaining", "cluster chaining: memoized funnel edges + labels, label-keyed edge count, |sizes|-key density agg"),
    ("q196_constraint_audit", "constraint audit: 8 scan aggs / key-only anti-joins unioned — not-null, uniqueness, range, referential integrity in one report"),
    ("q197_join_skew_audit", "join-skew audit: per key one map-side count, 1-row percentile agg over the |keys|-sized frame — the pre-flight before picking a join strategy"),
    ("q198_embedding_dispersion", "embedding dispersion: exact mean pairwise distance² from two aggregates (sum-of-squares identity) — zero pair joins"),
    ("q199_decayed_activity", "decayed activity: 1-row reference broadcast, one user-keyed agg, TakeOrdered top-k — freshness weighting without a window"),
    ("q200_quantile_sketch", "quantile sketch: one log-bucket hash agg (range-bounded, mergeable), sketch-guided exact arm sorts ONLY the picked buckets"),
    ("q201_percentile_accuracy", "percentile accuracy audit: two single-pass aggs (exact+GK sketches, then 18 rank predicates vs collected scalars), 9-row literal result"),
    ("q202_release_accounting", "release accounting: memoized LP funnel anti-join + one quality-flag scan, three 1-row aggs crossJoined — RELEASE.json's math as a gated row"),
    ("q203_delta_release_classes", "delta-release classes: memoized pairs filtered to the old slice + batch contraction merge, ONE distinct-gram explode reused for both decades' counts/bench sets/affected flags, broadcast flip joins — update_release's funnel as a gated row"),
    ("q204_weighted_length_quantiles", "weighted quantiles: one log-bucket sum(w) agg (range-bounded, mergeable), weighted-cumsum exact arm over the picked buckets only — token-budget cutoffs for packing/curricula"),
    ("q205_edit_relabel_scope", "edit-path relabel scope: memoized prev-corpus sig/label state, delta-bounded broadcast dirty/survivor sets, ONE batch-vs-carried contraction — update_release's component-local edit path; oracle replays both decades' LP chains"),
    ("q206_zipf_fit", "Zipf fit: one (source, token) hash agg; tie-class cumulative prefilter windows only DISTINCT count values, row_number only the ≤K head — the vocabulary never passes through a window"),
    ("q207_vocab_growth", "Heaps growth: two-phase ntile (no single-partition window), trigram explode→min(first_doc) agg, cumsum+regression over exactly HEAPS_TILES rows"),
    ("q208_session_assoc", "session association rules: q32's per-user session window, distinct (session,type) self-join CO-PARTITIONED on (user,session), alphabet-bounded output, broadcast marginals"),
    ("q209_span_lm_anomaly", "span LM anomaly: one positional bigram explode, vocab-bounded model broadcasts, per-doc sliding window (doc-sized partitions), two small aggs"),
    ("q210_pmi_collocations", "PMI collocations: two explode→hash aggs touch the corpus, floored candidate join on vocab-sized tables (AQE strategy — c1 never broadcast), scalar totals as 1-row broadcasts, ranked_topk on the ROUNDED pmi"),
    ("q211_transition_entropy", "transition entropy: q185's user-partitioned lag window → alphabet²-bounded count frame → H = ln N − Σ n·ln n / N on that sliver; output alphabet-bounded"),
]


def main() -> None:
    from synthetic_data_pipeline_spark.queries import all_queries
    from synthetic_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="dump-plans", master="local[8]", shuffle_partitions=8)
    registry = all_queries()
    out = [
        "# PLANS — formatted physical plans of representative queries",
        "",
        "Generated by `python scripts/dump_plans.py` at sf0.001 (plan shape",
        "is scale-independent; AQE numbers are pre-execution).",
        "",
    ]
    for name, why in SHOWCASE:
        df = registry[name](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        lines = plan.strip().splitlines()
        if len(lines) > 220:
            # The funnel queries read session-persisted frames whose
            # formatted explain repeats the full cached build subtree
            # per consumer — thousands of lines of duplicate detail.
            # Keep the operator tree + leading node details; the build
            # pipeline's own plan appears once in the q46 section.
            kept = lines[:180]
            kept.append(
                f"... [{len(lines) - 180} lines of cached-subtree node "
                "detail elided — rerun scripts/dump_plans.py for the "
                "full text]"
            )
            lines = kept
        out.append(f"## {name} — {why}\n\n```\n" + "\n".join(lines) + "\n```\n")
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
