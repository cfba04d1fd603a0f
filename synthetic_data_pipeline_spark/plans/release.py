"""End-to-end RELEASE pipeline: the one-call materialization a user of
this engine runs to turn a raw corpus into a publishable training-data
release. Chains the repo's individually-verified stages — nothing here
re-implements logic; it is pure composition of the same functions the
oracle-checked queries use, so every stage's correctness is already
pinned elsewhere:

  1. exact+near dedup  — q95's retention list (persisted, the
     cross-job form), anti-joined (q101's action)
  2. quality filter    — q97's drop flag (shared quality_drop_expr)
  3. boilerplate strip — q155's first-occurrence-wins rewrite applied
     to the touched docs, untouched docs pass through verbatim
  4. staging           — the curated corpus lands as an sf_dir-shaped
     directory ({out}/corpus/documents.parquet), so EVERY downstream
     action (shards, cards, splits) runs against it unchanged
  5. deterministic split — q96's counter-mode hash buckets, written
     as a column on the staged corpus
  6. token-packed shards — assembly.write_training_shards over the
     staged corpus (hive-partitioned, checksummed manifest)
  7. release manifest  — textops.write_snapshot_manifest (the
     fingerprint table q188 diffs the NEXT release against)
  8. dataset cards     — textops.write_dataset_cards (one .md per
     surviving source)

Returns (and writes as {out}/RELEASE.json) the per-stage accounting.
Scale shape: every stage is the already-audited plan of its query —
the composition adds one corpus write (the staged parquet) and
driver-side work bounded by |sources| + |stages| rows.

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

from ..functions.xsql import expand_u16, hash_u16
from ..sources.tables import load_table


def _split_col() -> str:
    bucket = expand_u16(hash_u16("CAST(doc_id AS STRING)", "split"), "spark")
    return (
        f"(CASE WHEN {bucket} % 10 < 8 THEN 'train' "
        f"WHEN {bucket} % 10 = 8 THEN 'val' ELSE 'test' END)"
    )


def curated_corpus(spark: SparkSession, sf_dir: str, retention_path: str) -> DataFrame:
    """Stages 1-3 as one DataFrame: dedup anti-join, quality filter,
    boilerplate strip (touched docs rewritten, others verbatim)."""
    from ..operators.textops import boilerplate_clean, quality_drop_expr

    docs = load_table(spark, sf_dir, "documents")
    kept = docs.join(
        spark.read.parquet(retention_path).select("doc_id"), "doc_id", "anti"
    )
    flags = quality_drop_expr(kept).filter(~F.col("qdrop")).select("doc_id")
    kept = kept.join(flags, "doc_id")
    cleaned = boilerplate_clean(kept).select("doc_id", "clean_text")
    return (
        kept.join(cleaned, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", "text").alias("text"),
            "lang",
            "source",
            F.length(F.coalesce("clean_text", "text")).alias("n_chars"),
        )
    )


def build_release(spark: SparkSession, sf_dir: str, out_dir: str) -> dict:
    from ..operators.assembly import write_training_shards
    from ..operators.sketches import write_retention
    from ..operators.textops import (
        quality_drop_expr,
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

    # 2-3. quality + strip accounting (flags recomputed on the
    # post-dedup frame so the numbers reconcile with the staged corpus)
    kept1 = docs.join(
        spark.read.parquet(retention_path).select("doc_id"), "doc_id", "anti"
    )
    n_quality_dropped = (
        quality_drop_expr(kept1).filter(F.col("qdrop")).count()
    )

    curated = curated_corpus(spark, sf_dir, retention_path)

    # 4-5. stage the curated corpus (sf_dir-shaped) with the split col
    corpus_dir = f"{out_dir}/corpus"
    curated.selectExpr("*", f"{_split_col()} AS split").write.mode(
        "overwrite"
    ).parquet(f"{corpus_dir}/documents.parquet")
    staged = load_table(spark, corpus_dir, "documents")
    n_curated = staged.count()
    split_counts = {
        r.split: r.n
        for r in staged.groupBy("split").agg(F.count("*").alias("n")).collect()
    }

    # 6. token-packed shards over the staged corpus
    write_training_shards(spark, corpus_dir, f"{out_dir}/training")
    n_shards = (
        spark.read.parquet(f"{out_dir}/training/_manifest").count()
    )

    # 7. release fingerprint manifest (q188 diffs the next release
    # against this)
    write_snapshot_manifest(staged, f"{out_dir}/manifest")

    # 8. dataset cards per surviving source
    write_dataset_cards(spark, corpus_dir, f"{out_dir}/cards")

    summary = {
        "sf_dir": sf_dir,
        "n_raw_docs": n_raw,
        "n_dedup_dropped": n_dedup_dropped,
        "n_quality_dropped": n_quality_dropped,
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
