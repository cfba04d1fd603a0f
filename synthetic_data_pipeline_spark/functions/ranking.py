"""Scalable global ranking: two-phase range-bucketed analytics.

A bare ``row_number() OVER (ORDER BY ...)`` (or ntile/percent_rank/
cume_dist) ships every row to ONE partition — the classic
"WindowExec: No Partition Defined" scale-killer. The distributed
equivalent: range-partition on the order key with SAMPLED boundaries
(the same idea ``repartitionByRange`` uses internally), rank within
each bucket, then add the count of all earlier buckets. The bucket is
a pure function of the order-key VALUE, so equal keys always land in
the same bucket and tie semantics survive the split. One narrow pass +
one tiny (n_buckets) aggregate — no global sort point.

ntile / percent_rank / cume_dist are then closed-form functions of the
global row_number and the total count N (for a total order made unique
by the tiebreak column, which matches
``Window.orderBy(order, tiebreak)`` semantics exactly):

    percent_rank = (rn - 1) / (N - 1)
    cume_dist    = rn / N
    ntile(k)     = first (N % k) tiles get ceil(N/k) rows, rest floor
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucket_expr(order_col: str, boundaries: list[float]) -> Column:
    """0-based bucket = number of sampled boundaries <= value. Depends
    only on the value, so ties share a bucket."""
    if not boundaries:
        return F.lit(0)
    b = F.array(*[F.lit(x) for x in boundaries])
    return F.size(F.filter(b, lambda x: x <= F.col(order_col)))


def _sampled_boundaries(
    df: DataFrame, order_col: str, n_buckets: int
) -> list[float]:
    """Split points via approx quantiles — skew-proof, unlike equi-width
    min/max splits which collapse all mass of a hot value range into one
    bucket. Returns [] on an empty frame."""
    if n_buckets <= 1:
        return []
    probs = [i / n_buckets for i in range(1, n_buckets)]
    qs = df.approxQuantile(order_col, probs, 0.001)
    if not qs:
        return []
    # dedupe: repeated quantiles (heavy hitters) produce empty buckets,
    # which are harmless but noisy
    out: list[float] = []
    for q in qs:
        if not out or q > out[-1]:
            out.append(q)
    return out


def global_rank(
    df: DataFrame,
    order_col: str,
    tiebreak_col: str,
    n_buckets: int = 64,
    rank_name: str = "global_rank",
    ascending: bool = True,
) -> DataFrame:
    """Append a global row_number over (order_col, tiebreak_col)
    without a single-partition window.

    ``df`` MUST be deterministic across re-evaluation: the engine runs
    three separate actions (quantile sample, bucket counts, final pass),
    so a frame derived from ``sample``/``rand`` would yield offsets that
    disagree with the final pass. Pass ``df.localCheckpoint()`` first if
    the lineage is non-deterministic."""
    return _two_phase(
        df, order_col, tiebreak_col, n_buckets, ascending,
        lambda rn, n: {rank_name: rn},
    )


def global_analytics(
    df: DataFrame,
    order_col: str,
    tiebreak_col: str,
    n_buckets: int = 64,
    ntile_k: int | None = None,
    ascending: bool = True,
    pct_rank_name: str = "pct_rank",
    cume_name: str = "cume",
    ntile_name: str = "ntile",
) -> DataFrame:
    """Append percent_rank, cume_dist and (optionally) ntile over the
    unique total order (order_col, tiebreak_col) — two-phase, no
    single-partition WindowExec.

    Like :func:`global_rank`, ``df`` must be deterministic across the
    three internal actions — ``localCheckpoint()`` non-deterministic
    lineage first."""

    def make(rn: Column, n: int) -> dict[str, Column]:
        out = {
            pct_rank_name: (
                (rn - 1).cast("double") / F.lit(max(n - 1, 1))
            ),
            cume_name: rn.cast("double") / F.lit(max(n, 1)),
        }
        if ntile_k:
            q, r = divmod(n, ntile_k)
            if q == 0:
                # fewer rows than tiles: tile == rn (Spark semantics)
                out[ntile_name] = rn.cast("int")
            else:
                big = r * (q + 1)  # rows covered by the (q+1)-sized tiles
                out[ntile_name] = (
                    F.when(
                        rn <= big, F.ceil(rn / F.lit(q + 1))
                    ).otherwise(
                        F.lit(r) + F.ceil((rn - big) / F.lit(q))
                    )
                ).cast("int")
        return out

    return _two_phase(df, order_col, tiebreak_col, n_buckets, ascending, make)


def _two_phase(
    df: DataFrame,
    order_col: str,
    tiebreak_col: str,
    n_buckets: int,
    ascending: bool,
    make_cols,
) -> DataFrame:
    """Shared engine: bucket on sampled boundaries, rank per bucket,
    offset by earlier-bucket counts (collected driver-side — ≤ n_buckets
    rows), then derive output columns from the global row_number via
    ``make_cols(rn, total_n)``."""
    boundaries = _sampled_boundaries(df, order_col, n_buckets)
    if not boundaries:
        # empty frame (or single quantile): guard the None/empty path —
        # a plain single-bucket window is correct and cheap here.
        w = Window.orderBy(
            (F.asc if ascending else F.desc)(order_col), F.asc(tiebreak_col)
        )
        n = df.count()
        rn = F.row_number().over(w)
        out = df
        for name, col in make_cols(rn, n).items():
            out = out.withColumn(name, col)
        return out

    n_eff = len(boundaries) + 1
    bucket = _bucket_expr(order_col, boundaries)
    if not ascending:
        bucket = F.lit(n_eff - 1) - bucket
    with_bucket = df.withColumn("_rb", bucket)
    counts = {
        r["_rb"]: r["_n"]
        for r in with_bucket.groupBy("_rb")
        .agg(F.count("*").alias("_n"))
        .collect()
    }
    total_n = sum(counts.values())
    offsets: dict[int, int] = {}
    acc = 0
    for b in range(n_eff):
        offsets[b] = acc
        acc += counts.get(b, 0)
    # offsets as a literal map — no join, stays a narrow stage
    offset_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    direction = F.asc if ascending else F.desc
    w = Window.partitionBy("_rb").orderBy(
        direction(order_col), F.asc(tiebreak_col)
    )
    rn = (
        F.element_at(offset_map, F.col("_rb"))
        + F.row_number().over(w)
    ).cast("long")
    out = with_bucket
    for name, col in make_cols(rn, total_n).items():
        out = out.withColumn(name, col)
    return out.drop("_rb")


def global_cumsum(
    df: DataFrame,
    value_col: str,
    order_col: str,
    tiebreak_col: str,
    n_buckets: int = 64,
    name: str = "cumsum",
) -> DataFrame:
    """Append the running total of ``value_col`` over the global order
    (order_col, tiebreak_col) — the building block for token-budget
    shard assignment (q112/q115) — without a single-partition window.

    Same two-phase shape as :func:`global_rank`: bucket on sampled
    boundaries of the order key, run the cumulative sum WITHIN each
    bucket (a partitioned window — parallel), then add the total of all
    earlier buckets (a ≤ n_buckets-row aggregate collected driver-side
    and re-attached as a literal map — no join, no global sort point).
    Values are summed as BIGINT, so offsets are exact.

    ``df`` must be deterministic across the two internal actions — the
    same contract as :func:`global_rank`.
    """
    boundaries = _sampled_boundaries(df, order_col, n_buckets)
    w_args = [F.asc(order_col), F.asc(tiebreak_col)]
    val = F.col(value_col).cast("long")
    if not boundaries:
        w = Window.orderBy(*w_args).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return df.withColumn(name, F.sum(val).over(w))
    bucket = _bucket_expr(order_col, boundaries)
    with_bucket = df.withColumn("_rb", bucket)
    sums = {
        r["_rb"]: r["_s"]
        for r in with_bucket.groupBy("_rb")
        .agg(F.sum(val).alias("_s"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for b in range(len(boundaries) + 1):
        offsets[b] = acc
        acc += sums.get(b, 0) or 0
    offset_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = (
        Window.partitionBy("_rb")
        .orderBy(*w_args)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = with_bucket.withColumn(
        name, F.element_at(offset_map, F.col("_rb")) + F.sum(val).over(w)
    )
    return out.drop("_rb")
