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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark's parquet
        # reader rejects ([PARQUET_TYPE_ILLEGAL]). Read the nanos as
        # INT64 via the legacy conf and truncate to micros — exactly
        # what DuckDB/pandas do implicitly, so oracles agree.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return df
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
