"""A/B probe (VERDICT r8 Next #6): q131's shuffle key as the 32-char
md5 hex STRING (current) vs the 16-byte ``unhex(md5)`` BINARY —
identical 128-bit equality semantics, half the shuffle bytes. Runs the
exact q131 plan shape at the 10x tier with only the key expression
varying, interleaved min-of-N to defeat VM-load drift, and prints a
JSON verdict for SCALING_r9 notes."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from synthetic_data_pipeline_spark.operators.dedup import _span_grams
from synthetic_data_pipeline_spark.operators.relational import eround
from synthetic_data_pipeline_spark.sources.tables import load_table


def q131_shape(spark, sf_dir: str, keyf):
    grams = _span_grams(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", keyf(F.col("g")).alias("g")
    )
    cross_doc = grams.groupBy("g").agg(
        (F.min("doc_id") != F.max("doc_id")).alias("dup")
    )
    per_doc = (
        grams.join(cross_doc, "g")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_pos"),
            F.sum(F.when(F.col("dup"), 1).otherwise(0)).alias("n_dup"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_pos").alias("n_positions"),
            F.sum("n_dup").alias("n_dup_positions"),
            eround(
                1e-9 + F.sum("n_dup") / F.sum("n_pos").cast("double"), 4
            ).alias("dup_share"),
            F.sum(F.when(F.col("n_dup") > 0, 1).otherwise(0)).alias(
                "n_docs_with_dup"
            ),
        )
        .orderBy("source")
    )


VARIANTS = {
    "md5_hex_str": lambda c: F.md5(c),
    "unhex_md5_bin": lambda c: F.unhex(F.md5(c)),
}


def main() -> None:
    from synthetic_data_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scaling/sf1x"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="span-key-ab")
    # warm footers + codegen once on the cheap variant shape
    load_table(spark, sf_dir, "documents").count()
    times = {k: [] for k in VARIANTS}
    for _ in range(runs):  # interleaved: drift hits both variants alike
        for name, keyf in VARIANTS.items():
            t0 = time.perf_counter()
            q131_shape(spark, sf_dir, keyf).write.format("noop").mode(
                "overwrite"
            ).save()
            times[name].append(round(time.perf_counter() - t0, 3))
    best = {k: min(v) for k, v in times.items()}
    print(json.dumps({
        "sf_dir": sf_dir,
        "runs": times,
        "min_sec": best,
        "binary_speedup_x": round(
            best["md5_hex_str"] / best["unhex_md5_bin"], 3
        ),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
