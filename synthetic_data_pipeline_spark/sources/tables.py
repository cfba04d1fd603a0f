"""Parquet table loaders for the driver's TPC-H-ish star schema.

Schemas documented in FIXTURES.md §B. Parquet is the engine's primary
format (SURVEY.md §2.1 S18): column pruning and predicate pushdown reach
the scan for free, unlike the reference's all-string CSV round-trips
(modules/validator.py:26-40 forces dtype=str and re-casts defensively).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimensions that should always be broadcast when joined.
BROADCAST_TABLES = {"region", "nation", "supplier"}


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the events ``ts`` column to ``TimestampType`` regardless
    of how the parquet writer stored it, so every consumer sees one type:

    - TIMESTAMP(NANOS) read as INT64 (legacy ``nanosAsLong`` conf):
      truncate to micros — what DuckDB/pandas do implicitly.
    - Naive micros → ``TIMESTAMP_NTZ``: cast to session-tz timestamp.
      The session timezone is pinned to UTC (session.py), so the cast is
      value-identical; without it, ``cast(ts as long)`` arithmetic fails
      analysis (TIMESTAMP_NTZ has no BIGINT cast).
    - Already ``TimestampType``: no-op.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampType

    t = df.schema[col].dataType
    if isinstance(t, LongType):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if not isinstance(t, TimestampType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def fan_out_scan(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Round-robin the scan out to the cluster's parallelism when the
    input arrives in fewer splits than cores — otherwise every
    downstream explode/regex/decode stage runs on the scan's task
    count (measured: q131's 20-gram explode single-task at sf0.1,
    2.41 s -> 1.05 s with the fan-out; token_state measured 11 s
    single-threaded at sf0.01 before growing its own copy of this).

    Apply it ONLY in front of heavy per-row CPU (n-gram explodes,
    hashing sweeps): the r14 A/B that placed this blanket-style inside
    load_table showed the extra exchange is pure cost for cheap
    consumers (q169 per-source agg 1.08 s -> 1.85 s, q110 dim explode
    0.76 s -> 1.34 s with an unconditional repartition) while the span
    family won 40-60%. CONDITIONAL by design: at real scale the input
    already has more splits than cores and the repartition would be a
    pure-cost corpus shuffle, so it must stay a no-op there. Keyless
    repartition is retry-safe (sort-before-repartition, SPARK-23207)
    and content-identical, so oracle parity is unaffected."""
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # The nanosAsLong conf keeps TIMESTAMP(NANOS) testdata readable
        # ([PARQUET_TYPE_ILLEGAL] otherwise); harmless for micros data.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # The NTZ→LTZ normalization and date_format render in SESSION
        # time — pin UTC so events queries agree with the naive-time
        # DuckDB oracle even under a driver session we didn't build.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return normalize_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> None:
    """Register temp views so queries can use ``spark.sql`` directly."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
