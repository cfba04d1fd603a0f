"""Two-point scaling probe (BASELINE.md target #3: demonstrated linear
scaling). Synthesizes a ~10x corpus from sf0.1 — facts scaled with key
remapping, dimensions left 1x exactly as a real cluster would see them —
then times a tier-spanning query subset at both scales and writes
SCALING_r{N}.json with per-row degradation ratios (t_10x / (10 * t_1x);
<= ~1.3 is the "linear enough" bar, < 1 means fixed overheads amortize).

Scaled-table construction (one scan each, crossJoin with a 10-row copy
index — no driver loop):
- orders / lineitem: orderkey += copy * stride, so the join fan-out per
  key is IDENTICAL to 1x and only the key count grows (scale-out, not
  skew-up). o_custkey is untouched: 1x customers each own 10x orders,
  the realistic "dims don't scale with facts" shape.
- events: event_id and user_id get per-copy strides — 10x users with
  the same per-user session structure, so sessionization work scales
  linearly by construction.
- documents: doc_id stride + a per-copy bijective letter substitution
  (rotations of 'etaoinshrd', 10 distinct) — WITHIN a copy every
  pairwise shingle-Jaccard is preserved (bijections rename shingles
  consistently), while ACROSS copies texts share almost no shingles, so
  the near-dup structure per row is constant and LSH candidate counts
  scale ~linearly instead of quadratically (naively unioning 10 verbatim
  copies would make every doc a 10-way near-dup cluster and measure a
  different problem).

Quadratic-by-design tiers (brute-force kNN q50, exact-pair q47) are
excluded on purpose; their scale paths (q55 IVF, q46 LSH) are included.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COPIES = 10
ALPHA = "etaoinshrd"
PROBE = [
    "q01_pricing_summary",        # scan + hash agg
    "q03_regional_revenue",       # fact-fact join + broadcast dims
    "q12_top_orders_per_customer",  # per-group window
    "q45_exact_dedup",            # hash groupBy dedup
    "q46_minhash_near_dups",      # LSH banding + candidate verify
    "q92_salted_event_stats",     # salted two-level agg
    "q93_redact_documents",       # narrow per-row regex map
    "q94_token_chunks",           # explode-shaped chunking
    "q97_quality_filter",         # per-row quality signals
    "q101_deduped_corpus",        # LP clusters + anti-join materialization
    "q102_training_prep",         # composed filter→dedup→split chain
]


def _with_copies(df: DataFrame) -> DataFrame:
    copies = F.broadcast(
        SparkSession.active().range(COPIES).withColumnRenamed("id", "copy")
    )
    return df.crossJoin(copies)


def _stride(df: DataFrame, key: str) -> int:
    return int(df.agg(F.max(key)).first()[0]) + 1


def _translate_by_copy(col, alphabet: str):
    """Per-copy bijective letter substitution: copy k maps the alphabet
    to its rotation by k (translate needs literal from/to, so a 10-arm
    CASE on the copy index)."""
    expr = col
    for k in range(1, COPIES):
        rot = alphabet[k:] + alphabet[:k]
        expr = F.when(F.col("copy") == k, F.translate(col, alphabet, rot)).otherwise(expr)
    return expr


def build_scaled(spark: SparkSession, src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    ok_stride = _stride(spark.read.parquet(f"{src}/orders.parquet"), "o_orderkey")

    orders = _with_copies(spark.read.parquet(f"{src}/orders.parquet")).select(
        (F.col("o_orderkey") + F.col("copy") * ok_stride).alias("o_orderkey"),
        *[c for c in spark.read.parquet(f"{src}/orders.parquet").columns
          if c != "o_orderkey"],
    )
    li_src = spark.read.parquet(f"{src}/lineitem.parquet")
    lineitem = _with_copies(li_src).select(
        (F.col("l_orderkey") + F.col("copy") * ok_stride).alias("l_orderkey"),
        *[c for c in li_src.columns if c != "l_orderkey"],
    )

    # events stores TIMESTAMP(NANOS) — go through load_table, which
    # reads nanos-as-long and truncates to micros; the rewritten copy
    # is plain micros, which load_table passes through unchanged.
    from synthetic_data_pipeline_spark.sources.tables import load_table

    ev_src = load_table(spark, src, "events")
    eid_stride = _stride(ev_src, "event_id")
    uid_stride = _stride(ev_src, "user_id")
    events = _with_copies(ev_src).select(
        (F.col("event_id") + F.col("copy") * eid_stride).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("copy") * uid_stride).alias("user_id"),
        "event_type", "value", "props",
    )

    doc_src = spark.read.parquet(f"{src}/documents.parquet")
    did_stride = _stride(doc_src, "doc_id")
    documents = _with_copies(doc_src).select(
        (F.col("doc_id") + F.col("copy") * did_stride).alias("doc_id"),
        _translate_by_copy(F.col("text"), ALPHA).alias("text"),
        "lang", "source", "n_chars",
    )

    for name, df in [
        ("orders", orders), ("lineitem", lineitem),
        ("events", events), ("documents", documents),
    ]:
        df.repartition(32).write.mode("overwrite").parquet(
            f"{dst}/{name}.parquet"
        )
    for name in ["region", "nation", "customer", "supplier", "part",
                 "embeddings"]:
        link = f"{dst}/{name}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{src}/{name}.parquet", link)


def time_queries(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    from synthetic_data_pipeline_spark.queries import all_queries

    registry = all_queries()
    out = {}
    for name in PROBE:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            registry[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    return out


def main() -> None:
    from synthetic_data_pipeline_spark.session import get_spark

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = os.path.join(repo, ".scaling", "sf1x")
    # No default round: a silent fallback would overwrite the pinned
    # SCALING_r{N}.json of a previous round (same overwrite-artifact
    # gotcha as driver_sim's sf argument).
    round_no = os.environ.get("SPARK_GRAFT_ROUND")
    if not round_no:
        sys.exit("set SPARK_GRAFT_ROUND=<n> (refusing to guess the "
                 "artifact name and overwrite a pinned SCALING_r*.json)")
    out_path = os.path.join(repo, f"SCALING_r{round_no}.json")

    spark = get_spark(app_name="sdp-scaling")
    t0 = time.perf_counter()
    build_scaled(spark, src, dst)
    build_sec = round(time.perf_counter() - t0, 1)
    print(f"built {COPIES}x corpus in {build_sec}s -> {dst}", file=sys.stderr)

    t_1x = time_queries(spark, src)
    t_10x = time_queries(spark, dst)
    rows = {
        name: {
            "t_1x": t_1x[name],
            "t_10x": t_10x[name],
            "per_row_ratio": round(t_10x[name] / (COPIES * t_1x[name]), 3),
        }
        for name in PROBE
    }
    result = {
        "sf_base": src,
        "copies": COPIES,
        "queries": rows,
        "max_per_row_ratio": max(r["per_row_ratio"] for r in rows.values()),
        "note": (
            "per_row_ratio = t_10x / (10 * t_1x); <=1 means per-row cost "
            "flat-or-better at 10x (fixed overheads amortize), the linear-"
            "scaling bar is ~1.3"
        ),
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
