"""Pin bench.py's error isolation: one failing query records an error
entry and never prevents the remaining queries from being timed. This
exact failure (an unguarded per-query loop) zeroed the bench artifact
for two consecutive rounds."""

from __future__ import annotations

from pyspark.sql import functions as F

import bench


def _ok_query(spark, sf_dir):
    return spark.range(10).select(F.col("id").alias("n"))


def _broken_query(spark, sf_dir):
    raise ValueError("synthetic analysis failure")


def _broken_at_action(spark, sf_dir):
    # Fails at write time (not at plan build), like a runtime codegen
    # or cast error — the other way a query can kill the loop.
    return spark.range(10).select(
        F.assert_true(F.col("id") < 5).alias("a"), "id"
    )


def test_one_failure_does_not_zero_the_bench(spark, sf_dir):
    registry = {
        "good1": _ok_query,
        "bad_plan": _broken_query,
        "bad_action": _broken_at_action,
        "good2": _ok_query,
    }
    times, errors = bench.time_queries(
        spark, registry, list(registry), sf_dir, runs=1
    )
    assert set(times) == {"good1", "good2"}
    assert all(t >= 0 for t in times.values())
    assert set(errors) == {"bad_plan", "bad_action"}
    assert "ValueError" in errors["bad_plan"]


def test_headline_names_all_registered():
    from synthetic_data_pipeline_spark.queries import all_queries

    registry = all_queries()
    missing = [n for n in bench.HEADLINE if n not in registry]
    assert not missing, f"HEADLINE references unknown queries: {missing}"
