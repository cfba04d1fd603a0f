"""End-to-end RELEASE pipeline: the one-call materialization a user of
this engine runs to turn a raw corpus into a publishable training-data
release. Chains the repo's individually-verified stages — nothing here
re-implements logic; it is pure composition of the same functions the
oracle-checked queries use, so every stage's correctness is already
pinned elsewhere:

  1. exact+near dedup  — q95's retention list (persisted, the
     cross-job form), anti-joined (q101's action)
  2. quality filter    — q97's drop flag (shared quality_drop_expr)
  3. benchmark holdout — the held-out benchmark source (q105/q160's
     DECON_BENCH_SOURCE) is EXCLUDED from the release: a training
     corpus never ships the eval suite itself
  4. boilerplate strip — q155's first-occurrence-wins rewrite; the
     boilerplate gram SET is computed from the FULL RAW corpus so the
     definition agrees with q155's corpus-wide one even though only
     the surviving subset is rewritten (ADVICE r11)
  5. decontamination   — q160's strip against the PERSISTED benchmark
     gram index ({out}/bench_grams — the same artifact the streaming
     twin uses), applied to the post-boilerplate text: every train
     position covered by a benchmark 4-gram is removed, so the q105
     detector finds ZERO contamination in what ships (pinned by test)
  6. PII redaction     — q93's catalog-order scrub applied to the
     near-final text (LAST rewrite, so nothing that ships escapes it);
     zero real SIT matches survive (pinned by test)
  7. staging           — the curated corpus lands as an sf_dir-shaped
     directory ({out}/corpus/documents.parquet), so EVERY downstream
     action (shards, cards, splits) runs against it unchanged
  8. cluster-aware split — q145's assignment: the split key is the
     doc's near-dup CLUSTER label (persisted at {out}/labels), hashed
     with q96's counter-mode mechanism, so near-duplicates can never
     straddle a split boundary. Post-retention each cluster keeps one
     member, so this usually coincides with q96's doc-hash split —
     but keying on the cluster label keeps the guarantee even if the
     retention policy changes (e.g. q144's quality-upgraded keepers,
     where the kept doc is NOT the cluster's min id)
  9. token-packed shards — assembly.write_training_shards over the
     staged corpus (hive-partitioned, checksummed manifest)
 10. release manifest  — textops.write_snapshot_manifest (the
     fingerprint table q188 diffs the NEXT release against)
 11. dataset cards     — textops.write_dataset_cards (one .md per
     surviving source)

Returns (and writes as {out}/RELEASE.json) the per-stage accounting.
Scale shape: every stage is the already-audited plan of its query —
the composition adds one corpus write (the staged parquet) and
driver-side work bounded by |sources| + |stages| rows. The two text
rewrites (4, 5) and the redaction chain (6) are narrow maps over the
curated subset; the gram flag joins broadcast boilerplate-/benchmark-
sized tables, never the corpus.

Reference parity note: this is the Spark-first analog of the
reference's end-to-end main() (generate -> postprocess -> validate ->
files on disk) applied to CURATION: one entrypoint, a directory of
artifacts, a summary report.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


def _curation_stages(
    spark: SparkSession,
    sf_dir: str,
    retention_path: str,
    bench_gram_path: str,
) -> dict[str, DataFrame]:
    """Stages 1-6 as named frames so build_release can account each
    strip off the SAME lineage it ships: dedup anti-join, quality
    filter, benchmark holdout, boilerplate strip (gram set from the
    FULL raw corpus), decontamination strip (persisted benchmark gram
    index), PII redaction. Touched docs are rewritten, others pass
    verbatim through each strip; the redaction chain sees every
    shipped byte.

    Deliberately LAZY (A/B'd, round 12): eagerly localCheckpoint-ing
    the two touched frames — so the accounting aggs, the next stage
    and the staged write share one materialization — measured 90-124 s
    vs 48 s lazy on the e2e test. Column pruning is why: the
    accounting aggs never construct clean_text at all (only
    tokens_removed survives pruning), so the "shared" materialization
    pays the full rewrite THEN stores it, while the lazy plan's
    recomputation is two cheap pruned passes. Revisit only if a
    profile shows the positional-gram explode (not the rewrite)
    dominating at the target scale."""
    from ..operators.sitscan import redacted_frame
    from ..operators.textops import (
        DECON_BENCH_SOURCE,
        boilerplate_clean,
        decon_strip_batch,
        quality_drop_expr,
    )

    docs = load_table(spark, sf_dir, "documents")
    kept = docs.join(
        spark.read.parquet(retention_path).select("doc_id"), "doc_id", "anti"
    )
    flags = quality_drop_expr(kept).filter(~F.col("qdrop")).select("doc_id")
    kept = kept.join(flags, "doc_id").filter(
        F.col("source") != DECON_BENCH_SOURCE
    )
    # stage 4: boilerplate strip — gram DEFINITION from the raw corpus
    bp_touched = boilerplate_clean(kept, gram_docs=docs)
    bp = kept.join(
        bp_touched.select("doc_id", F.col("clean_text").alias("bp_text")),
        "doc_id",
        "left",
    ).select(
        "doc_id",
        F.coalesce("bp_text", "text").alias("text"),
        "lang",
        "source",
    )
    # stage 5: decontamination strip against the persisted bench index
    dc_touched = decon_strip_batch(spark, bench_gram_path, bp)
    dc = bp.join(
        dc_touched.select("doc_id", F.col("clean_text").alias("dc_text")),
        "doc_id",
        "left",
    ).select(
        "doc_id",
        F.coalesce("dc_text", "text").alias("text"),
        "lang",
        "source",
    )
    # stage 6: PII redaction — the LAST rewrite before staging
    final = redacted_frame(dc).select(
        "doc_id",
        F.col("_red").alias("text"),
        "lang",
        "source",
        F.length("_red").alias("n_chars"),
    )
    return {"bp_touched": bp_touched, "dc_touched": dc_touched, "final": final}


def curated_corpus(
    spark: SparkSession,
    sf_dir: str,
    retention_path: str,
    bench_gram_path: str,
) -> DataFrame:
    """Stages 1-6 as one DataFrame (see :func:`_curation_stages`)."""
    return _curation_stages(
        spark, sf_dir, retention_path, bench_gram_path
    )["final"]


def build_release(spark: SparkSession, sf_dir: str, out_dir: str) -> dict:
    from ..operators.assembly import write_training_shards
    from ..operators.sketches import (
        cluster_split_assignments,
        write_label_index,
        write_retention,
    )
    from ..operators.textops import (
        DECON_BENCH_SOURCE,
        quality_drop_expr,
        write_bench_gram_index,
        write_dataset_cards,
        write_snapshot_manifest,
    )

    os.makedirs(out_dir, exist_ok=True)
    docs = load_table(spark, sf_dir, "documents")
    n_raw = docs.count()

    # 1. dedup retention (persisted — the cross-job artifact)
    retention_path = f"{out_dir}/retention"
    write_retention(spark, sf_dir, retention_path)
    n_dedup_dropped = spark.read.parquet(retention_path).count()

    # 2-3. quality + benchmark-holdout accounting (flags recomputed on
    # the post-dedup frame so the numbers reconcile with the staged
    # corpus)
    kept1 = docs.join(
        spark.read.parquet(retention_path).select("doc_id"), "doc_id", "anti"
    )
    n_quality_dropped = (
        quality_drop_expr(kept1).filter(F.col("qdrop")).count()
    )
    kept2 = kept1.join(
        quality_drop_expr(kept1).filter(~F.col("qdrop")).select("doc_id"),
        "doc_id",
    )
    n_benchmark_held_out = kept2.filter(
        F.col("source") == DECON_BENCH_SOURCE
    ).count()

    # persisted curation state: the benchmark gram index (stage 5's
    # flag table — the same artifact q160's streaming twin strips
    # against) and the near-dup cluster labels (stage 8's split key)
    bench_gram_path = f"{out_dir}/bench_grams"
    write_bench_gram_index(spark, sf_dir, bench_gram_path)
    label_path = f"{out_dir}/labels"
    write_label_index(spark, sf_dir, label_path)

    stages = _curation_stages(spark, sf_dir, retention_path, bench_gram_path)
    curated = stages["final"]
    bp_acct = stages["bp_touched"].agg(
        F.count("*").alias("n"), F.sum("tokens_removed").alias("tok")
    ).collect()[0]
    dc_acct = stages["dc_touched"].agg(
        F.count("*").alias("n"), F.sum("tokens_removed").alias("tok")
    ).collect()[0]

    # 4-8. stage the curated corpus (sf_dir-shaped) with the
    # cluster-aware split column (q145's assignment over the persisted
    # label index — near-dups can never straddle a split boundary)
    splits = cluster_split_assignments(
        curated, spark.read.parquet(label_path)
    ).select("doc_id", "split")
    corpus_dir = f"{out_dir}/corpus"
    curated.join(splits, "doc_id").write.mode("overwrite").parquet(
        f"{corpus_dir}/documents.parquet"
    )
    staged = load_table(spark, corpus_dir, "documents")
    n_curated = staged.count()
    split_counts = {
        r.split: r.n
        for r in staged.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    # strip/redaction accounting off the staged corpus (1-row aggs)
    n_pii = staged.agg(
        F.sum(
            (
                F.length("text")
                - F.length(F.replace("text", F.lit("[SIT_"), F.lit("")))
            )
            / F.lit(5)
        )
        .cast("long")
        .alias("n")
    ).collect()[0].n

    # 9. token-packed shards over the staged corpus
    write_training_shards(spark, corpus_dir, f"{out_dir}/training")
    n_shards = (
        spark.read.parquet(f"{out_dir}/training/_manifest").count()
    )

    # 10. release fingerprint manifest (q188 diffs the next release
    # against this)
    write_snapshot_manifest(staged, f"{out_dir}/manifest")

    # 11. dataset cards per surviving source
    write_dataset_cards(spark, corpus_dir, f"{out_dir}/cards")

    summary = {
        "sf_dir": sf_dir,
        "n_raw_docs": n_raw,
        "n_dedup_dropped": n_dedup_dropped,
        "n_quality_dropped": n_quality_dropped,
        "n_benchmark_held_out": n_benchmark_held_out,
        "n_boilerplate_docs_touched": bp_acct.n,
        "n_boilerplate_tokens_removed": int(bp_acct.tok or 0),
        "n_decon_docs_touched": dc_acct.n,
        "n_decon_tokens_removed": int(dc_acct.tok or 0),
        "n_pii_redactions": int(n_pii or 0),
        "n_curated_docs": n_curated,
        "split_counts": split_counts,
        "n_shards": n_shards,
        "artifacts": sorted(
            d for d in os.listdir(out_dir)
            if os.path.isdir(os.path.join(out_dir, d))
        ),
    }
    with open(f"{out_dir}/RELEASE.json", "w") as fh:
        json.dump(summary, fh, indent=1, sort_keys=True)
    return summary


def main(argv: list[str] | None = None) -> None:
    """CLI: ``python -m synthetic_data_pipeline_spark.plans.release
    <sf_dir> <out_dir>`` — the one-command analog of the reference's
    end-to-end main() (generate → postprocess → validate → files on
    disk), applied to curation: raw parquet corpus in, publishable
    release directory + RELEASE.json accounting out."""
    import argparse

    from synthetic_data_pipeline_spark.session import get_spark

    p = argparse.ArgumentParser(
        description="Build a publishable training-data release."
    )
    p.add_argument("sf_dir", help="input corpus directory (sf_dir-shaped)")
    p.add_argument("out_dir", help="release output directory")
    p.add_argument(
        "--master", default=None,
        help="Spark master (default: session factory's choice)",
    )
    args = p.parse_args(argv)
    kwargs = {"app_name": "sdp-release"}
    if args.master:
        kwargs["master"] = args.master
    spark = get_spark(**kwargs)
    summary = build_release(spark, args.sf_dir, args.out_dir)
    print(json.dumps(summary, indent=1, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
