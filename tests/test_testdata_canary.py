"""Testdata schema canary (VERDICT r4 Next #5).

The driver regenerates /root/testdata between rounds; a silent change in
how the writer stores a column (e.g. events.ts flipping from
TIMESTAMP(NANOS) to naive micros → TIMESTAMP_NTZ) broke q32 and the
streaming ingest for two rounds before any test noticed. This canary
loads every table through the engine's loaders and pins the
*engine-normalized* dtypes plus the arithmetic that actually broke — so
the next regeneration fails one obvious test instead of a driver row.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    TimestampType,
)

from synthetic_data_pipeline_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
)

# Engine-normalized dtype expectations per table: column -> type class
# (or tuple of acceptable classes). Only load-bearing columns are
# pinned; extra columns are allowed. Integer-width (int vs long) and
# date-column tz-ness are pinned exactly as the current writer produces
# them — any drift is precisely what this canary must surface.
from pyspark.sql.types import IntegerType, TimestampNTZType  # noqa: E402

ANY_TS = (TimestampType, TimestampNTZType)

EXPECTED = {
    "region": {"r_regionkey": IntegerType, "r_name": StringType},
    "nation": {
        "n_nationkey": IntegerType,
        "n_regionkey": IntegerType,
        "n_name": StringType,
    },
    "customer": {
        "c_custkey": LongType,
        "c_nationkey": IntegerType,
        "c_acctbal": DoubleType,
        "c_mktsegment": StringType,
    },
    "supplier": {"s_suppkey": LongType, "s_nationkey": IntegerType},
    "part": {"p_partkey": LongType, "p_retailprice": DoubleType},
    "orders": {
        "o_orderkey": LongType,
        "o_custkey": LongType,
        "o_totalprice": DoubleType,
        "o_orderdate": ANY_TS,
    },
    "lineitem": {
        "l_orderkey": LongType,
        "l_partkey": LongType,
        "l_quantity": DoubleType,
        "l_extendedprice": DoubleType,
        "l_discount": DoubleType,
        "l_returnflag": StringType,
        "l_shipdate": ANY_TS,
    },
    "events": {
        "event_id": LongType,
        # The round-3/4 regression: the loader MUST normalize ts to
        # TimestampType (not NTZ, not long) whatever the writer stored.
        "ts": TimestampType,
        "user_id": LongType,
        "event_type": StringType,
        "value": DoubleType,
        "props": StringType,
    },
    "documents": {"doc_id": LongType, "text": StringType},
    "embeddings": {"vec_id": LongType, "embedding": ArrayType},
}


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_table_loads_with_expected_dtypes(spark, sf_dir, name):
    df = load_table(spark, sf_dir, name)
    fields = {f.name: f.dataType for f in df.schema.fields}
    for col, want in EXPECTED[name].items():
        assert col in fields, f"{name}.{col} missing (schema drift)"
        assert isinstance(fields[col], want), (
            f"{name}.{col}: expected {want.__name__}, "
            f"got {type(fields[col]).__name__} — testdata writer changed; "
            f"extend the loader shim in sources/tables.py"
        )
    assert df.count() > 0, f"{name} is empty"


def test_events_ts_arithmetic_works(spark, sf_dir):
    """The exact operation that failed analysis on TIMESTAMP_NTZ data:
    cast(ts as long) epoch arithmetic, plus window() bucketing. If the
    testdata writer changes ts storage again, this fails at load time
    rather than in a driver correctness row."""
    events = load_table(spark, sf_dir, "events")
    row = (
        events.select(
            (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias(
                "span_sec"
            ),
            F.min("ts").alias("mn"),
            F.max("ts").alias("mx"),
        )
    ).first()
    # Sanity: the event stream spans a plausible range (hours-months),
    # not 1970-epoch garbage from a wrong unit shim.
    assert row["span_sec"] > 3600, "events.ts span too small — unit shim wrong?"
    assert row["mn"].year >= 2000, f"events.ts decoded to {row['mn']} — unit shim wrong"
    # window() must analyze and bucket on the normalized type.
    n_windows = (
        events.groupBy(F.window("ts", "1 hour")).count().count()
    )
    assert n_windows > 0


def test_events_queries_session_tz_independent(spark, sf_dir):
    """The real driver builds its OWN SparkSession; if its session tz
    weren't UTC, the NTZ→LTZ ts normalization plus date_format would
    shift every events-query output off the naive-time DuckDB oracle.
    load_table pins UTC on events loads — assert a hostile session tz
    cannot change the answer."""
    from synthetic_data_pipeline_spark.operators.events import (
        q30_tumbling_hourly,
    )

    want = sorted(map(tuple, q30_tumbling_hourly(spark, sf_dir).collect()))
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        got = sorted(map(tuple, q30_tumbling_hourly(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert got == want


def test_embeddings_vector_shape(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(F.size("embedding").alias("d")).distinct().collect()
    assert len(dims) == 1, "ragged embedding vectors"
    assert dims[0]["d"] > 0
