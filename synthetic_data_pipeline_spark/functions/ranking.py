"""Scalable global ranking: two-phase range-bucketed rank.

A bare ``row_number() OVER (ORDER BY ...)`` ships every row to one
partition. The distributed equivalent: range-partition on the order
key, rank within each bucket, then add the count of all earlier
buckets. Total order must include a unique tiebreak so the result is
well-defined. One narrow pass + one tiny (n_buckets) aggregate —
no global sort point.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_col: str,
    tiebreak_col: str,
    n_buckets: int = 64,
    rank_name: str = "global_rank",
    ascending: bool = True,
) -> DataFrame:
    """Append a dense global row_number over (order_col, tiebreak_col)
    without a single-partition window. Buckets come from ntile over a
    SAMPLE-free percentile split: we use range of the order column
    mapped through percent approximation — here simply hash-free fixed
    quantile boundaries derived from min/max (adequate for roughly
    uniform keys; a production version would sample boundaries like
    repartitionByRange does internally).
    """
    lo, hi = df.agg(
        F.min(order_col), F.max(order_col)
    ).first()
    span = (hi - lo) or 1
    direction = (F.asc if ascending else F.desc)
    bucket_raw = F.floor(
        (F.col(order_col) - F.lit(lo)) / F.lit(span) * n_buckets
    ).cast("int")
    bucket = F.least(F.lit(n_buckets - 1), F.greatest(F.lit(0), bucket_raw))
    if not ascending:
        bucket = F.lit(n_buckets - 1) - bucket
    with_bucket = df.withColumn("_rb", bucket)
    counts = (
        with_bucket.groupBy("_rb").agg(F.count("*").alias("_n"))
    )
    offsets = counts.withColumn(
        "_offset",
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy("_rb").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("_rb", "_offset")
    w = Window.partitionBy("_rb").orderBy(
        direction(order_col), F.asc(tiebreak_col)
    )
    return (
        with_bucket.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(offsets), "_rb")
        .withColumn(rank_name, (F.col("_offset") + F.col("_rn")).cast("long"))
        .drop("_rb", "_rn", "_offset")
    )
