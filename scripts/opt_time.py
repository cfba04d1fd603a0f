"""Standalone min-of-N interleaved query timer — the r11 q152 protocol
as a reusable tool for the optimization rounds.

Usage: python scripts/opt_time.py q131_duplicated_spans q180_memorization_risk
       SPARK_GRAFT_SF_DIR overrides the default sf0.1 input.
       SPARK_GRAFT_RUNS   overrides min-of-N (default 3).

Times each named registry query with the noop sink (full compute, no
collect), interleaved round-robin so machine drift hits all queries
equally, and prints one JSON line {name: best_sec}.  A warm-up pass of
every query runs first (untimed) so whole-stage-codegen JIT is excluded
— identical methodology to bench.py, but isolated to the named queries
so a tuning loop gets a quiet signal.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synthetic_data_pipeline_spark.queries import all_queries  # noqa: E402
from synthetic_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))
    qs = all_queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark(app_name="opt-time")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    def run(name: str) -> float:
        spark.sparkContext.setJobDescription(f"opt_time: {name}")
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in names:  # untimed warm-up (JIT + memo builds)
        run(name)
    best = {n: float("inf") for n in names}
    for _ in range(runs):
        for name in names:
            best[name] = min(best[name], run(name))
    print(json.dumps({n: round(v, 3) for n, v in best.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
