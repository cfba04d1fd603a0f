"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop-format write (full compute,
no driver collect bottleneck).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",
    "q02_top_revenue_orders",
    "q03_regional_revenue",
    "q09_returned_revenue_top_customers",
    "q12_top_orders_per_customer",
    "q13_running_total",
    "q22_monthly_sales",
    "q27_price_bucket_range_join",
    "q30_tumbling_hourly",
    "q32_user_sessions",
    "q34_asof_click_error",
    "q42_quality_by_source",
    "q44_trigram_stats",
    "q46_minhash_near_dups",
    "q50_knn_bruteforce",
    "q90_flagship_sit_scan",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from synthetic_data_pipeline_spark.queries import all_queries
    from synthetic_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="sdp-bench")
    registry = all_queries()
    names = [n for n in HEADLINE if n in registry]

    # Warm the JVM + parquet footers once so per-query times measure the
    # query, not session startup.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    times: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = registry[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
