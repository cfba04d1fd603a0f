"""Fresh-session release timings (VERDICT r13 #7).

``release_build_sec`` measured at BENCH-END swung 17-72 s across r13
runs at equal calibration — not the release pipeline drifting, but the
measuring session: 130 prior queries leave caches, checkpoint files and
a grown JIT/class graph behind. This script runs build_release + the
zero-delta update_release in a PRISTINE Spark session (own JVM, empty
cache state) so the two numbers are comparable round-over-round.

Prints ONE JSON line: {"release_build_sec": s, "release_update_noop_sec": s}.
bench.py invokes it as a subprocess and merges the result into extras
(falling back to an error entry if the subprocess dies). Standalone:

    python scripts/release_bench.py            # $SPARK_GRAFT_SF_DIR
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from synthetic_data_pipeline_spark.plans.release import (
        build_release,
        update_release,
    )
    from synthetic_data_pipeline_spark.session import get_spark

    from pyspark.sql import functions as F

    spark = get_spark(app_name="sdp-release-bench")
    out = tempfile.mkdtemp(prefix="sdp_release_bench_")
    try:
        t0 = time.perf_counter()
        build_release(spark, sf_dir, f"{out}/v1")
        t1 = time.perf_counter()
        update_release(spark, f"{out}/v1", sf_dir, f"{out}/v2")
        t2 = time.perf_counter()
        # the EDIT-path cost (r14: component-local relabel + exact gram
        # retraction off the prev snapshot): one doc's text edited in
        # place — the weekly metadata/correction delta's floor. The
        # edited corpus carries only documents.parquet (update_release
        # reads nothing else); corpus prep is untimed.
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        # a NON-benchmark doc (the representative weekly correction):
        # editing a benchmark-source doc legitimately changes the decon
        # gram index and pays a corpus re-scan — a different, honest
        # number, but not the steady-state floor this row tracks
        from synthetic_data_pipeline_spark.operators.textops import (
            DECON_BENCH_SOURCE,
        )

        first_id = (
            docs.filter(F.col("source") != DECON_BENCH_SOURCE)
            .select(F.min("doc_id"))
            .first()[0]
        )
        docs.withColumn(
            "text",
            F.when(
                F.col("doc_id") == first_id,
                F.concat(F.col("text"), F.lit(" benchedit tail token")),
            ).otherwise(F.col("text")),
        ).write.parquet(f"{out}/edited/documents.parquet")
        t3 = time.perf_counter()
        update_release(
            spark, f"{out}/v1", f"{out}/edited", f"{out}/v3",
            prev_sf_dir=sf_dir,
        )
        t4 = time.perf_counter()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    print(
        json.dumps(
            {
                "release_build_sec": round(t1 - t0, 3),
                "release_update_noop_sec": round(t2 - t1, 3),
                "release_update_one_edit_sec": round(t4 - t3, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
