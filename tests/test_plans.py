"""Physical-plan assertions: the scale story is only real if Catalyst
actually produces the intended plans — small dims broadcast, predicates
reach the parquet scan, projections prune columns, global top-k avoids a
single-partition sort, aggregates run partial+final inside codegen.
These tests pin those properties so a refactor can't silently regress
them (SURVEY.md §4.2).
"""

from __future__ import annotations

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


def test_global_analytics_equals_builtin_windows(spark):
    """Two-phase ntile / percent_rank / cume_dist must equal the
    built-in single-partition window functions on a unique total order."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from synthetic_data_pipeline_spark.functions.ranking import global_analytics

    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    w = Window.orderBy(F.asc("p_retailprice"), F.asc("p_partkey"))
    naive = part.select(
        "p_partkey",
        F.ntile(7).over(w).alias("t"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    scalable = global_analytics(
        part, "p_retailprice", "p_partkey", n_buckets=16, ntile_k=7
    ).select("p_partkey", "ntile", "pct_rank", "cume")
    a = {r.p_partkey: (r.t, round(r.pr, 9), round(r.cd, 9)) for r in naive.collect()}
    b = {
        r.p_partkey: (r.ntile, round(r.pct_rank, 9), round(r.cume, 9))
        for r in scalable.collect()
    }
    assert a == b


def test_global_rank_empty_frame(spark):
    """Empty input must not raise (min/max→None regression guard)."""
    from synthetic_data_pipeline_spark.functions.ranking import (
        global_analytics,
        global_rank,
    )

    empty = spark.createDataFrame([], "k double, id long")
    assert global_rank(empty, "k", "id").collect() == []
    out = global_analytics(empty, "k", "id", ntile_k=4)
    assert out.collect() == []
    assert {"pct_rank", "cume", "ntile"} <= set(out.columns)


def test_q54_no_unguarded_cartesian(spark):
    """Cosine near-dup must generate candidates from LSH band buckets,
    never an all-pairs BroadcastNestedLoopJoin over the corpus."""
    from synthetic_data_pipeline_spark.operators import similarity

    p = plan(similarity.q54_cosine_near_dups(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p


def test_q29_no_global_window(spark):
    """q29 must not plan a single-partition global WindowExec over the
    full table (the 'No Partition Defined' scale-killer)."""
    df = relational.q29_price_analytics(spark, SF_DIR)
    p = plan(df)
    import re

    # every Window node must have a non-empty partitionBy; the two-phase
    # form partitions by _rb
    for m in re.finditer(r"Window \[", p):
        seg = p[m.start(): m.start() + 400]
        assert "partitionby" not in seg.lower() or "_rb" in seg, seg
    assert "_rb" in p, p


def test_q92_salted_two_level_aggregation(spark):
    """The salted skew form must plan TWO aggregation levels: a partial
    shuffle keyed on (event_type, _salt) — hot keys fan out — then a
    final reduce on event_type alone, with the salt derived
    deterministically from row contents (xxhash64), never from a
    non-deterministic expression."""
    from synthetic_data_pipeline_spark.operators import events

    p = plan(events.q92_salted_event_stats(spark, SF_DIR))
    assert "xxhash64" in p, p
    assert "_salt" in p, p
    # partial+final pairs for both levels → at least 4 HashAggregates
    assert p.count("HashAggregate") >= 4, p
    assert "monotonically_increasing_id" not in p and "rand(" not in p, p


def test_q93_q94_stay_narrow(spark):
    """The redaction and chunking passes must stay single-scan narrow
    maps — no join, and no shuffle beyond the one range partitioning
    for the deterministic output sort."""
    from synthetic_data_pipeline_spark.operators import sitscan, textops

    for df in (
        sitscan.redact_documents(spark, SF_DIR),
        textops.q94_token_chunks(spark, SF_DIR),
    ):
        p = plan(df)
        assert "Join" not in p, p
        # only the output sort's rangepartitioning — no hash shuffle
        assert "hashpartitioning" not in p, p
        assert p.count("- Exchange") <= 1, p


def test_q134_window_is_doc_partitioned(spark):
    """q134's run-length window must partition by doc_id — a
    'No Partition Defined' global window over the duplicated positions
    would serialize the whole diagnostic through one task at scale."""
    from synthetic_data_pipeline_spark.operators import dedup

    p = plan(dedup.q134_longest_dup_span(spark, SF_DIR))
    assert "row_number" in p.lower()
    import re

    for m in re.finditer(r"\(\d+\) Window", p):
        seg = p[m.start(): m.start() + 500]
        assert "doc_id" in seg, seg


def test_q142_centroid_join_broadcasts(spark):
    """q142's label x label self-join runs over the |labels| x dim
    centroid table — it must broadcast (a shuffle join there would
    mean Catalyst sees a corpus-sized side), and the corpus-sized
    explode must be absorbed by partial+final hash aggregation."""
    from synthetic_data_pipeline_spark.operators import similarity

    p = plan(similarity.q142_centroid_similarity(spark, SF_DIR))
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
    assert p.count("HashAggregate") >= 2, p


def test_q141_q143_no_windows_no_smj(spark):
    """The fertility and diversity audits are pure hash-agg pipelines:
    no window anywhere, and the only joins are over vocab-bounded
    frames (fertility's word map; diversity joins |sources|-keyed
    aggregates) — a global window or corpus SMJ is a scale regression."""
    from synthetic_data_pipeline_spark.operators import textops

    p1 = plan(textops.q141_tokenizer_fertility(spark, SF_DIR))
    assert "Window" not in p1, p1
    p2 = plan(textops.q143_corpus_diversity(spark, SF_DIR))
    assert "Window" not in p2, p2


def test_q144_q145_no_window_no_cartesian(spark):
    """The LP-consumer newborns: no window anywhere (the q144 argmax is
    the two-pass max-then-min-id shape, the q145 split a narrow hash
    map) and no cartesian product. Joins between the cluster-bounded
    intermediates may plan as SMJ pre-execution (sizes unknown until
    the aggregates run) — AQE converts them at runtime, the same
    no-forced-hint stance q101 documents — so SMJ absence is NOT
    asserted; at least one broadcast join must still appear (the
    statistically-known label/agg side)."""
    from synthetic_data_pipeline_spark.operators import sketches

    for fn in (
        sketches.q144_cluster_representatives,
        sketches.q145_cluster_aware_split,
    ):
        p = plan(fn(spark, SF_DIR))
        assert "BroadcastHashJoin" in p, fn.__name__
        assert "Window" not in p, fn.__name__
        assert "CartesianProduct" not in p, fn.__name__
