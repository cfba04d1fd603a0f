"""Physical-plan assertions: the scale story is only real if Catalyst
actually produces the intended plans — small dims broadcast, predicates
reach the parquet scan, projections prune columns, global top-k avoids a
single-partition sort, aggregates run partial+final inside codegen.
These tests pin those properties so a refactor can't silently regress
them (SURVEY.md §4.2).
"""

from __future__ import annotations

import pytest

from synthetic_data_pipeline_spark.operators import relational
from tests.conftest import SF_DIR


def plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_small_dims_broadcast(spark):
    p = plan(relational.q03_regional_revenue(spark, SF_DIR))
    assert p.count("BroadcastHashJoin") >= 3, p
    assert "SortMergeJoin" not in p or p.count("SortMergeJoin") <= 2


def test_filters_pushed_to_scan(spark):
    p = plan(relational.q06_forecast_revenue(spark, SF_DIR))
    assert "PushedFilters:" in p
    # discount + quantity predicates must reach the parquet reader
    assert "l_discount" in p.split("PushedFilters:")[1][:400], p


def test_column_pruning(spark):
    p = plan(relational.q22_monthly_sales(spark, SF_DIR))
    read = p.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderdate" in read and "o_totalprice" in read
    assert "o_orderkey" not in read and "o_orderpriority" not in read, read


def test_semi_and_anti_joins(spark):
    assert "LeftSemi" in plan(relational.q04_priority_with_returns(spark, SF_DIR))
    assert "LeftAnti" in plan(relational.q05_customers_without_orders(spark, SF_DIR))


def test_global_topk_avoids_single_partition_sort(spark):
    p = plan(relational.q15_top_parts_by_price(spark, SF_DIR))
    assert "TakeOrderedAndProject" in p, p


def test_partial_final_aggregation(spark):
    df = relational.q01_pricing_summary(spark, SF_DIR)
    df.collect()  # finalize the AQE plan so codegen annotations appear
    p = plan(df)
    assert "partial_" in p, "expected map-side partial aggregation"
    assert "codegen id" in p, "expected whole-stage codegen spans"


def test_two_phase_global_rank_equals_single_window(spark):
    """The scalable range-bucketed rank must reproduce the naive global
    window exactly (same total order, no single-partition sort)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from synthetic_data_pipeline_spark.functions.ranking import global_rank

    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    naive = part.select(
        "p_partkey",
        F.row_number()
        .over(Window.orderBy(F.desc("p_retailprice"), F.asc("p_partkey")))
        .alias("rk"),
    )
    scalable = global_rank(
        part, "p_retailprice", "p_partkey", n_buckets=16, ascending=False
    ).select("p_partkey", F.col("global_rank").alias("rk"))
    a = {r.p_partkey: r.rk for r in naive.collect()}
    b = {r.p_partkey: r.rk for r in scalable.collect()}
    assert a == b
    # and the scalable plan has no empty-partitionBy window over the data
    p = plan(scalable)
    assert "TakeOrdered" in p or "Exchange hashpartitioning(_rb" in p or "_rb" in p
