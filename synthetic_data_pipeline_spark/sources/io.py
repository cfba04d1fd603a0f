"""CSV / JSON readers and writers (SURVEY.md §2.1 S2-S3, S10-S11).

The reference's interchange formats degrade everything to strings
(CSV round-trips with dtype=str at validator.py:26-40) and pack arrays
as ';'-joined strings (meta_generator.py:161-166). The engine keeps
typed ArrayType columns internally; these helpers materialize the
reference-compatible encodings at the boundary and restore types on
read — schema-explicit, never inferred (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Columns of the reference's mapping_meta.csv that are ';'-packed lists
# (positionally parallel across columns).
PACKED_MAPPING_COLS = ["sit_ids", "labels", "instances", "confidences"]

MAPPING_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("filename", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("word_count_target", T.IntegerType()),
        T.StructField("sit_ids", T.ArrayType(T.StringType())),
        T.StructField("labels", T.ArrayType(T.StringType())),
        T.StructField("instances", T.ArrayType(T.IntegerType())),
        T.StructField("confidences", T.ArrayType(T.StringType())),
    ]
)


def write_mapping_csv(df: DataFrame, path: str) -> None:
    """S10: array columns → ';'-packed strings → single-header CSV."""
    out = df
    for c in PACKED_MAPPING_COLS:
        out = out.withColumn(
            c, F.array_join(F.col(c).cast("array<string>"), ";")
        )
    out.write.mode("overwrite").option("header", True).csv(path)


def read_mapping_csv(spark: SparkSession, path: str) -> DataFrame:
    """S3: all-string CSV scan + explicit re-typing (the reference's
    defensive casts, done once at the boundary instead of per stage)."""
    raw = spark.read.option("header", True).csv(path)
    return raw.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "filename",
        "format",
        F.col("word_count_target").cast("int").alias("word_count_target"),
        F.split("sit_ids", ";").alias("sit_ids"),
        F.split("labels", ";").alias("labels"),
        F.split("instances", ";").cast("array<int>").alias("instances"),
        F.split("confidences", ";").alias("confidences"),
    )


META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("filename", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("word_count_target", T.IntegerType()),
        T.StructField(
            "sits",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("sit_id", T.StringType()),
                        T.StructField("sit_name", T.StringType()),
                        T.StructField("label", T.StringType()),
                        T.StructField("instances", T.IntegerType()),
                        T.StructField("confidence", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def write_meta_json(df: DataFrame, path: str) -> None:
    """S11: nested per-doc metadata as JSON lines."""
    df.write.mode("overwrite").json(path)


def read_meta_json(spark: SparkSession, path: str) -> DataFrame:
    """S2: schema-explicit JSON scan (never inferSchema on a 100TB lake)."""
    return spark.read.schema(META_SCHEMA).json(path)


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    range_cols: list[str] | None = None,
    max_records_per_file: int = 500_000,
    n_files: int | None = None,
) -> None:
    """Scale-hygiene writer (SURVEY.md §4.4): zstd parquet with bounded
    file sizes (maxRecordsPerFile), optional hive partitioning, and
    optional range-clustering (repartitionByRange + local sort) so
    downstream range predicates prune files via min/max stats. The
    small-files failure mode of one-file-per-row sinks is the first
    thing that kills a 100TB documents table.
    """
    out = df
    if range_cols:
        cols = [out[c] for c in range_cols]
        out = (
            out.repartitionByRange(n_files, *cols)
            if n_files
            else out.repartitionByRange(*cols)
        ).sortWithinPartitions(*range_cols)
    writer = (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .option("compression", "zstd")
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def write_orc(df: DataFrame, path: str) -> None:
    """Interop sink: ORC with zstd — the other columnar lake format a
    migrating warehouse may already hold. Same pushdown/pruning story
    as parquet (Spark's native ORC reader supports predicate pushdown
    and column pruning), so engine queries run unchanged on it."""
    df.write.mode("overwrite").option("compression", "zstd").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def explode_meta_sits(meta: DataFrame) -> DataFrame:
    """Nested meta → flat (doc, sit) rows: the explode() that replaces
    the reference's per-doc dict loops (SURVEY.md §1.1)."""
    return meta.select(
        "doc_id", "format", F.inline("sits")
    )
