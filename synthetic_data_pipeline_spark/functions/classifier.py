"""Distributed logistic-regression quality classifier (round 11).

The CCNet / GPT-3-style data-quality classifier (Wenzek et al. 2020;
Brown et al. 2020, Appendix A): positives come from a curated
reference feed, negatives are a deterministic sample of the raw
corpus (q179's export builds exactly that table), a tiny linear model
is fit on cheap per-doc features, and the pipeline then scores EVERY
document and keeps/weights by predicted quality. The reference
(kkaaars/synthetic-data-pipeline) has no learned component at all —
north-star surface, like BM25.

Spark-first shape: the model is k+1 doubles, so the DATA never moves —
training is batch gradient descent where EACH ITERATION IS ONE
DISTRIBUTED AGGREGATE over the (bounded, by construction ~2x the
curated feed) labeled export. The sigmoid, per-feature gradient terms
and log-loss are column expressions with the current weights inlined
as LITERALS, so the only driver-side state is the weight vector — the
q56 k-means iterate-by-aggregate pattern, supervised. Scoring the full
corpus afterwards is a pure narrow projection (``score_expr``): no
shuffle, no UDF, fully whole-stage-codegen — the part that actually
runs at 100 TB is embarrassingly parallel.

Scale note: the training set is bounded by the curated feed's size
(positives) plus a same-order negative sample — at 100 TB you train on
the same few hundred thousand rows regardless of corpus size; only the
final scoring projection is corpus-sized. The per-iteration collect is
ONE row of k+2 doubles.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EPS = 1e-12  # log-loss clamp


def standardize_stats(df: DataFrame, feature_cols: list[str]) -> dict:
    """One aggregate: population mean/std per feature (std floored at
    1e-12 so a constant column yields z=0 instead of a divide-by-zero)."""
    aggs = []
    for c in feature_cols:
        aggs.append(F.avg(F.col(c).cast("double")).alias(f"m_{c}"))
        aggs.append(F.stddev_pop(F.col(c).cast("double")).alias(f"s_{c}"))
    row = df.agg(*aggs).collect()[0].asDict()
    return {
        c: (row[f"m_{c}"], max(row[f"s_{c}"] or 0.0, 1e-12))
        for c in feature_cols
    }


def _z(c: str, stats: dict) -> Column:
    m, s = stats[c]
    return (F.col(c).cast("double") - F.lit(m)) / F.lit(s)


def _sigmoid(margin: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))


def train_logreg(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    iters: int = 40,
    lr: float = 1.0,
) -> dict:
    """Fit logistic regression by full-batch gradient descent; one
    distributed aggregate per iteration, weights updated driver-side.

    Returns {"bias", "weights" (per ORIGINAL feature, with the
    standardization folded in), "z_weights", "stats", "history"
    (per-iteration mean log-loss — monotone decrease is pinned by
    test_quality_lr_planted_separable)}."""
    cached = df.select(label_col, *feature_cols).cache()
    try:
        stats = standardize_stats(cached, feature_cols)
        w = {c: 0.0 for c in feature_cols}
        b = 0.0
        history: list[float] = []
        y = F.col(label_col).cast("double")
        for _ in range(iters):
            margin = F.lit(b)
            for c in feature_cols:
                margin = margin + F.lit(w[c]) * _z(c, stats)
            p = _sigmoid(margin)
            loss = -(
                y * F.log(p + F.lit(_EPS))
                + (F.lit(1.0) - y) * F.log(F.lit(1.0) - p + F.lit(_EPS))
            )
            aggs = [F.avg(loss).alias("loss"), F.avg(p - y).alias("g_b")]
            aggs += [
                F.avg((p - y) * _z(c, stats)).alias(f"g_{c}")
                for c in feature_cols
            ]
            row = cached.agg(*aggs).collect()[0].asDict()
            history.append(float(row["loss"]))
            b -= lr * float(row["g_b"])
            for c in feature_cols:
                w[c] -= lr * float(row[f"g_{c}"])
    finally:
        cached.unpersist()
    # fold standardization into raw-feature weights: w·(x-m)/s + b ==
    # (w/s)·x + (b - Σ w·m/s), so scoring needs no stats at serve time.
    raw_w = {c: w[c] / stats[c][1] for c in feature_cols}
    raw_b = b - sum(w[c] * stats[c][0] / stats[c][1] for c in feature_cols)
    return {
        "bias": raw_b,
        "weights": raw_w,
        "z_weights": w,
        "z_bias": b,
        "stats": stats,
        "history": history,
    }


def score_expr(model: dict, feature_cols: list[str] | None = None) -> Column:
    """P(high quality) as a pure column expression over the RAW
    features — the corpus-sized serve path (narrow projection, no
    shuffle, no UDF)."""
    cols = feature_cols or list(model["weights"])
    margin = F.lit(float(model["bias"]))
    for c in cols:
        margin = margin + F.lit(float(model["weights"][c])) * F.col(c).cast(
            "double"
        )
    return _sigmoid(margin)


def predict_labels(
    df: DataFrame, model: dict, threshold: float = 0.5
) -> DataFrame:
    """df + (quality_prob, predicted) columns."""
    p = score_expr(model)
    return df.withColumn("quality_prob", p).withColumn(
        "predicted", (F.col("quality_prob") >= F.lit(threshold)).cast("int")
    )


def write_quality_model(
    spark, sf_dir: str, path: str, iters: int = 15, lr: float = 0.5
) -> dict:
    """Batch-side deployment step: fit on q179's bounded export and
    persist the model as JSON (k+1 doubles — the entire serving state;
    the q118/q171 persisted-index pattern, at its smallest). Returns
    the model dict."""
    import json
    import os

    from ..operators.textops import QCLF_FEATURES, q179_quality_training_set

    model = train_logreg(
        q179_quality_training_set(spark, sf_dir),
        QCLF_FEATURES,
        iters=iters,
        lr=lr,
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        json.dump(model, fh)
    return model


def load_model(path: str) -> dict:
    import json

    with open(path) as fh:
        return json.load(fh)


def reference_logreg(
    xs: list[list[float]], ys: list[int], iters: int = 40, lr: float = 1.0
) -> tuple[float, list[float], list[float]]:
    """Pure-Python twin of train_logreg (same standardization, same
    updates) for the cross-implementation parity test. Returns
    (z_bias, z_weights, history)."""
    n, k = len(xs), len(xs[0])
    means = [sum(r[j] for r in xs) / n for j in range(k)]
    stds = []
    for j in range(k):
        v = sum((r[j] - means[j]) ** 2 for r in xs) / n
        stds.append(max(math.sqrt(v), 1e-12))
    zs = [[(r[j] - means[j]) / stds[j] for j in range(k)] for r in xs]
    w = [0.0] * k
    b = 0.0
    history = []
    for _ in range(iters):
        loss = gb = 0.0
        gw = [0.0] * k
        for z, y in zip(zs, ys):
            m = b + sum(w[j] * z[j] for j in range(k))
            p = 1.0 / (1.0 + math.exp(-m))
            loss += -(
                y * math.log(p + _EPS) + (1 - y) * math.log(1 - p + _EPS)
            )
            gb += p - y
            for j in range(k):
                gw[j] += (p - y) * z[j]
        history.append(loss / n)
        b -= lr * gb / n
        for j in range(k):
            w[j] -= lr * gw[j] / n
    return b, w, history
