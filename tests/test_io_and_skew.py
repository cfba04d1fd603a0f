"""CSV/JSON boundary round-trips, salted aggregation equivalence, and
the bucketed co-located join (no-shuffle) demonstration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from synthetic_data_pipeline_spark.functions.skew import salted_agg
from synthetic_data_pipeline_spark.sources.io import (
    explode_meta_sits,
    read_mapping_csv,
    read_meta_json,
    write_mapping_csv,
    write_meta_json,
)

ROWS = [
    (1, "doc_00001_email.txt", "email", 800,
     ["SIT_SSN", "SIT_CCN"], ["TP", "FP"], [3, 1], ["Medium", "Low"]),
    (2, "doc_00002_chat.txt", "chat", 1200,
     ["SIT_IBAN"], ["TP"], [7], ["High"]),
]
SCHEMA = (
    "doc_id long, filename string, format string, word_count_target int, "
    "sit_ids array<string>, labels array<string>, instances array<int>, "
    "confidences array<string>"
)


def test_mapping_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / "mapping_csv")
    write_mapping_csv(df, path)
    back = read_mapping_csv(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC interop: values survive the round trip exactly and a filter
    on the read side reaches the ORC scan as a pushed predicate (same
    pruning story as parquet, so engine queries run unchanged)."""
    from synthetic_data_pipeline_spark.sources.io import read_orc, write_orc
    from synthetic_data_pipeline_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").limit(500)
    path = str(tmp_path / "lineitem_orc")
    write_orc(li, path)
    back = read_orc(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, li.collect())
    )
    plan = (
        back.filter(F.col("l_quantity") > 25)
        .select("l_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "l_quantity" in plan


def test_orc_events_roundtrip_ts_semantics(spark, sf_dir, tmp_path):
    """ORC and parquet differ in timestamp physics (ORC stores
    TIMESTAMP as local-time seconds+nanos, parquet testdata arrives as
    NANOS-as-long or NTZ micros) — prove normalize_ts is a safe no-op
    after an ORC round trip: values identical to the parquet load, ts
    arithmetic (BIGINT cast) analyzable, and an hour-bucket agg equal
    on both paths."""
    from synthetic_data_pipeline_spark.sources.io import read_orc, write_orc
    from synthetic_data_pipeline_spark.sources.tables import (
        load_table,
        normalize_ts,
    )

    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_orc")
    write_orc(ev, path)
    back = normalize_ts(read_orc(spark, path))
    assert back.schema["ts"].dataType.typeName() == "timestamp"
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, ev.collect())
    )

    def hourly(df):
        # ts.cast(long) inside the agg: fails analysis outright if the
        # round trip degraded ts to a type without BIGINT arithmetic
        return sorted(
            map(
                tuple,
                df.groupBy(F.date_trunc("hour", "ts").alias("h"))
                .agg(
                    F.count("*").alias("n"),
                    F.sum(F.col("ts").cast("long") % 3600).alias("off_sum"),
                )
                .collect(),
            )
        )

    assert hourly(back) == hourly(ev)


def test_meta_json_roundtrip_and_explode(spark, tmp_path):
    meta = spark.createDataFrame(
        [
            (1, "f1", "email", 700,
             [("SIT_SSN", "US Social Security Number", "TP", 2, "Low")]),
            (2, "f2", "pdf", 900,
             [("SIT_CCN", "Credit Card Number", "FP", 1, "Low"),
              ("SIT_DEA", "DEA Number", "TP", 4, "Medium")]),
        ],
        "doc_id long, filename string, format string, word_count_target int, "
        "sits array<struct<sit_id:string, sit_name:string, label:string, "
        "instances:int, confidence:string>>",
    )
    path = str(tmp_path / "meta_json")
    write_meta_json(meta, path)
    back = read_meta_json(spark, path)
    assert back.count() == 2
    flat = explode_meta_sits(back)
    assert flat.count() == 3
    assert {r.sit_id for r in flat.collect()} == {"SIT_SSN", "SIT_CCN", "SIT_DEA"}


def test_salted_agg_equals_direct(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    direct = {
        tuple(r)[:1]: tuple(r)[1:]
        for r in li.groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").alias("s"),
            F.count("*").alias("c"),
            F.max("l_extendedprice").alias("m"),
        )
        .collect()
    }
    salted = {
        tuple(r)[:1]: tuple(r)[1:]
        for r in salted_agg(
            li,
            ["l_returnflag"],
            {
                "s": ("sum", "l_quantity"),
                "c": ("count", "l_orderkey"),
                "m": ("max", "l_extendedprice"),
            },
            n_salts=8,
        ).collect()
    }
    assert set(direct) == set(salted)
    for k, (s, c, m) in direct.items():
        s2, c2, m2 = salted[k]
        assert c == c2 and m == m2
        assert abs(s - s2) < 1e-6  # double sum, association differs


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Pre-bucketing both sides on the join key removes the shuffle —
    the co-located join strategy for repeated large-table joins
    (SURVEY.md §4.4). Asserts no Exchange above either scan."""
    import shutil

    sf = "/root/testdata/sf0.001"
    # tables land in ./spark-warehouse (gitignored); warehouse.dir is a
    # static conf and cannot be redirected per-test, so clean any
    # leftovers from prior (possibly aborted) runs first.
    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    orders.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).saveAsTable("orders_b")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).saveAsTable("lineitem_b")
    # at sf0.001 the build side fits the broadcast threshold and the
    # planner ignores buckets; disable broadcast to surface the
    # co-located sort-merge join a 100TB pair would use.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("orders_b").join(
            spark.table("lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_write_partitioned_parquet_layout(spark, tmp_path):
    import glob

    from synthetic_data_pipeline_spark.sources.io import write_partitioned_parquet

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    out = str(tmp_path / "li_part")
    write_partitioned_parquet(
        li,
        out,
        partition_cols=["l_returnflag"],
        range_cols=["l_shipdate"],
        max_records_per_file=1000,
        n_files=4,
    )
    # hive layout by returnflag, several bounded files per partition
    parts = glob.glob(f"{out}/l_returnflag=*")
    assert len(parts) >= 2, parts
    back = spark.read.parquet(out)
    assert back.count() == li.count()
    files = glob.glob(f"{out}/l_returnflag=*/*.parquet")
    assert len(files) >= 4


def test_partitioned_read_prunes_partitions(spark, tmp_path):
    """A filter on the hive-partition column must reach the scan as a
    PartitionFilter (directory pruning — the scan never lists the
    other partitions' files), not a post-scan Filter."""
    from synthetic_data_pipeline_spark.sources.io import write_partitioned_parquet
    from pyspark.sql import functions as F

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    out = str(tmp_path / "li_pruned")
    write_partitioned_parquet(li, out, partition_cols=["l_returnflag"])
    back = spark.read.parquet(out).filter(F.col("l_returnflag") == "R")
    plan = back._jdf.queryExecution().explainString(
        back.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PartitionFilters" in plan, plan
    assert "l_returnflag" in plan.split("PartitionFilters", 1)[1].split("\n")[0], plan
    want = li.filter(F.col("l_returnflag") == "R").count()
    assert back.count() == want
