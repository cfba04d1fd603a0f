"""Similarity search over the ``embeddings`` table (north star).

Brute-force cosine top-k is the exact baseline: broadcast the (small)
query set against the corpus, dot products via zip_with/aggregate in
DOUBLE (floats are widened first — float math would diverge from the
oracle), rank per query partition. The scale path replaces the corpus
side with LSH buckets (random-hyperplane signs, md5-derived so they are
deterministic and oracle-reproducible).

At 100TB: the corpus scan is embarrassingly parallel; per-query state is
k rows; the only shuffle is the final per-query top-k (partitioned by
query id, never global).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import eround
from ..sources.tables import load_table

N_QUERIES = 10  # vec_id < 10 are the demo query vectors
TOP_K = 5
N_HYPERPLANES = 8
N_BANDS = 2  # shared by band_signatures AND the q54 oracle SQL below
EMB_DIM = 64  # embeddings schema, FIXTURES.md §B


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine(a, b):
    """Cosine similarity of two array<double> columns, pure expressions."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


# --- q50: exact brute-force cosine top-k for the demo query vectors.
# Norms once per vector (see cosine_near_dup_pairs): the per-pair work
# is one interpreted dot fold, not three; arithmetic unchanged.
def q50_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v")
    )
    nrm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    emb_n = emb.select("vec_id", "v", nrm.alias("nrm"))
    queries = emb_n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    dot = F.aggregate(
        F.zip_with("qv", "v", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        F.broadcast(queries)
        .join(emb_n, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            eround(dot / (F.col("qnrm") * F.col("nrm")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .orderBy("query_id", "rk")
    )


# --- q161: matryoshka / truncated-dimension audit (Kusupati et al.
# 2022, "Matryoshka Representation Learning") — the storage-vs-recall
# decision table for the embedding tier: at each prefix width k, how
# much of the full-dimension top-K neighborhood survives ranking by
# prefix-only cosine, and how far the prefix cosine drifts on the true
# neighbors. A pipeline reads this before deciding to store/serve
# truncated vectors (4x-8x cheaper ANN memory). Same bounded
# broadcast-probe scan shape as q50 (N_QUERIES anchors, corpus scanned
# once, all four prefix cosines computed in the same pass); the
# windows partition on (query_id), bounded groups.
MRL_DIMS = (8, 16, 32, EMB_DIM)


def matryoshka_audit(emb: DataFrame) -> DataFrame:
    """(prefix_dim, avg_recall, avg_cos_err): recall@TOP_K of
    prefix-cosine ranking vs full-dimension ranking, and the mean
    |cos_k - cos_full| over the TRUE top-K pairs, averaged over the
    N_QUERIES probes. ``emb``: (vec_id, v array<double>)."""
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )

    def pref_cos(k: int):
        qs = F.slice("qv", 1, k)
        es = F.slice("v", 1, k)
        dot = F.aggregate(
            F.zip_with(qs, es, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        qn = F.sqrt(
            F.aggregate(qs, F.lit(0.0), lambda acc, x: acc + x * x)
        )
        en = F.sqrt(
            F.aggregate(es, F.lit(0.0), lambda acc, x: acc + x * x)
        )
        return eround(dot / (qn * en), 6).alias(f"cos{k}")

    cand = (
        F.broadcast(queries)
        .join(emb, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            *[pref_cos(k) for k in MRL_DIMS],
        )
        .localCheckpoint(eager=False)  # probe-bounded LINEAR
        # (N_QUERIES·n rows, 4 doubles) — the checkpoint class the
        # policy says must be measured, not assumed: kept on the
        # strength of SCALING_r10 q161's 100x per-row ratio 0.046;
        # feeds 1 + 2·len(MRL_DIMS) consumers below
    )
    wfull = Window.partitionBy("query_id").orderBy(
        F.desc(f"cos{EMB_DIM}"), F.asc("neighbor_id")
    )
    # bounded (N_QUERIES·TOP_K rows): checkpoint so the full-dim window
    # over cand runs once, not once per prefix arm (r14); the per-k
    # drift means come from ONE aggregate over it instead of
    # len(MRL_DIMS) separate agg actions
    full_top = (
        cand.withColumn("rk", F.row_number().over(wfull))
        .filter(F.col("rk") <= TOP_K)
        .localCheckpoint(eager=False)
    )
    errs_all = full_top.agg(
        F.count("*").alias("n_full"),
        *[
            F.avg(
                F.abs(F.col(f"cos{k}") - F.col(f"cos{EMB_DIM}"))
            ).alias(f"err{k}")
            for k in MRL_DIMS
        ],
    )
    parts = []
    for k in MRL_DIMS:
        wk = Window.partitionBy("query_id").orderBy(
            F.desc(f"cos{k}"), F.asc("neighbor_id")
        )
        top_k = (
            cand.withColumn("rk", F.row_number().over(wk))
            .filter(F.col("rk") <= TOP_K)
            .select("query_id", "neighbor_id")
        )
        hits = top_k.join(
            full_top.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "semi",
        ).agg(F.count("*").alias("n_hit"))
        parts.append(
            hits.crossJoin(F.broadcast(errs_all)).select(
                F.lit(k).alias("prefix_dim"),
                eround(
                    F.lit(1e-9)
                    + F.col("n_hit") / F.col("n_full").cast("double"),
                    4,
                ).alias("avg_recall"),
                eround(
                    F.lit(1e-9) + F.col(f"err{k}"), 4
                ).alias("avg_cos_err"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("prefix_dim")


def q161_matryoshka_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v")
    )
    return matryoshka_audit(emb)


def _q161_oracle() -> str:
    """q161 oracle: prefix cosines over DOUBLE[] slices. Every CTE
    consumed more than once is MATERIALIZED (DuckDB inlines plain
    CTEs — the q103 recomputation gotcha)."""
    def cosk(k: int) -> str:
        return (
            f"round(list_inner_product(q.qv[1:{k}], e.ev[1:{k}]) / "
            f"(sqrt(list_inner_product(q.qv[1:{k}], q.qv[1:{k}])) * "
            f"sqrt(list_inner_product(e.ev[1:{k}], e.ev[1:{k}]))), 6) "
            f"AS cos{k}"
        )

    tops = ",\n    ".join(
        f"""top{k} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id, row_number() OVER (
          PARTITION BY query_id ORDER BY cos{k} DESC, neighbor_id ASC
        ) AS rk FROM cand
      ) WHERE rk <= {TOP_K}
    )"""
        for k in MRL_DIMS
    )
    selects = "\n    UNION ALL\n".join(
        f"""    SELECT {k} AS prefix_dim,
           round(1e-9 + (SELECT count(*) FROM top{k} t
                         JOIN full_top f ON f.query_id = t.query_id
                          AND f.neighbor_id = t.neighbor_id)
                 / CAST((SELECT count(*) FROM full_top) AS DOUBLE), 4)
             AS avg_recall,
           round(1e-9 + (SELECT avg(abs(cos{k} - cos{EMB_DIM}))
                         FROM full_top), 4) AS avg_cos_err"""
        for k in MRL_DIMS
    )
    return f"""
    WITH ev_t AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings
    ),
    probes AS (
      SELECT vec_id AS query_id, ev AS qv FROM ev_t
      WHERE vec_id < {N_QUERIES}
    ),
    cand AS MATERIALIZED (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             {", ".join(cosk(k) for k in MRL_DIMS)}
      FROM probes q JOIN ev_t e ON e.vec_id != q.query_id
    ),
    full_top AS MATERIALIZED (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cos{EMB_DIM} DESC,
          neighbor_id ASC
        ) AS rk FROM cand
      ) WHERE rk <= {TOP_K}
    ),
    {tops}
{selects}
    ORDER BY prefix_dim
"""


# --- q138: hard-negative mining for contrastive training — for each
# anchor vector, the top-k most-similar vectors with a DIFFERENT
# label (the "hard negatives" an embedding-training job pairs with
# each anchor). Same broadcast-anchor scan shape as q50: anchors are
# bounded (N_QUERIES), the corpus is scanned once, and the label
# inequality is part of the join condition so same-label rows never
# reach the ranker. For unbounded anchor sets the IVF probe path
# (q55) is the stated scale route — restrict its candidate lists by
# label before ranking.
HARD_NEG_K = 3


def hard_negative_pairs(
    emb: DataFrame, n_queries: int = N_QUERIES, k: int = HARD_NEG_K
) -> DataFrame:
    """(query_id, anchor_label, neighbor_id, neighbor_label, cosine,
    rk) for a (vec_id, label, embedding) frame."""
    base = emb.select("vec_id", "label", _as_double("embedding").alias("v"))
    nrm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    emb_n = base.select("vec_id", "label", "v", nrm.alias("nrm"))
    anchors = emb_n.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("anchor_label"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    dot = F.aggregate(
        F.zip_with("qv", "v", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        F.broadcast(anchors)
        .join(emb_n, F.col("label") != F.col("anchor_label"))
        .select(
            "query_id",
            "anchor_label",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            eround(dot / (F.col("qnrm") * F.col("nrm")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .orderBy("query_id", "rk")
    )


def q138_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hard_negative_pairs(load_table(spark, sf_dir, "embeddings"))


# --- q51: per-label centroids — element-wise mean via posexplode, the
# distributed layout for any vector aggregate (dim becomes a key, so the
# shuffle is (labels × dims) rows regardless of corpus size).
def q51_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "label", F.posexplode(_as_double("embedding")).alias("dim", "x")
        )
        .groupBy("label", "dim")
        .agg(eround(1e-9 + F.avg("x"), 4).alias("centroid_val"))
        .filter(F.col("dim") < 8)  # keep the checked slice compact
        .orderBy("label", "dim")
    )


# --- q52: norm statistics per label.
def q52_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", _as_double("embedding").alias("v")
    )
    norm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    return (
        emb.select("label", norm.alias("l2"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            eround(1e-9 + F.avg("l2"), 4).alias("avg_norm"),
            eround(F.min("l2"), 4).alias("min_norm"),
            eround(F.max("l2"), 4).alias("max_norm"),
        )
        .orderBy("label")
    )


# --- q53: LSH-bucketed ANN — random-hyperplane signature per vector.
# Hyperplane p, dim d weight = ±1 from md5 parity (deterministic, same
# family in DuckDB's SQL md5). Weights depend only on (p, d), so they
# are PRECOMPUTED driver-side into literal arrays — the per-row work is
# one zip_with multiply-fold in codegen, zero runtime hashing. The sign
# decision rounds the projection first (eround, mirrored in the oracle):
# raw `proj > 0` is a knife-edge when summation order differs by ~n ulp
# between engines. Bucket stats prove the partitioning strategy; the
# ANN/near-dup queries probe only matching buckets (q54, unit tests).
# (EMB_DIM lives with the other constants at the top of the module.)


def _plane_weights(p: int, dim: int = EMB_DIM) -> list[float]:
    """+1 if the last md5 hex digit of 'p:d' is even else -1 — the same
    value DuckDB's ascii(substr(md5(concat(p,':',d)),32,1)) % 2 picks."""
    import hashlib

    return [
        1.0 if ord(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[31]) % 2 == 0
        else -1.0
        for d in range(dim)
    ]


def _plane_proj(v_col, p: int):
    w = F.array(*[F.lit(x) for x in _plane_weights(p)])
    return F.aggregate(
        F.zip_with(v_col, w, lambda x, wt: x * wt),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def hyperplane_signature(v_col, n_planes: int = N_HYPERPLANES):
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        sig = sig + F.when(
            eround(_plane_proj(v_col, p), 6) > 0, F.lit(2 ** p)
        ).otherwise(F.lit(0))
    return sig


def band_signatures(v_col, n_planes: int = N_HYPERPLANES, n_bands: int = N_BANDS):
    """Split the planes into bands (MinHash-band analogue): a candidate
    pair only needs to agree on ONE band's full signature, trading
    precision for recall without widening any single bucket join."""
    if n_planes % n_bands:
        raise ValueError(
            f"n_planes ({n_planes}) must divide evenly into n_bands "
            f"({n_bands}); trailing planes would be silently dropped"
        )
    per = n_planes // n_bands
    out = []
    for b in range(n_bands):
        s = F.lit(0).cast("long")
        for i in range(per):
            s = s + F.when(
                eround(_plane_proj(v_col, b * per + i), 6) > 0, F.lit(2 ** i)
            ).otherwise(F.lit(0))
        out.append(s)
    return out


def q53_ann_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("v")
    )
    sig = hyperplane_signature(F.col("v"))
    return (
        emb.select(sig.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"))
        .agg(
            F.count("*").alias("n_buckets"),
            F.max("n_vecs").alias("largest_bucket"),
            F.min("n_vecs").alias("smallest_bucket"),
        )
    )


# --- q54: embedding-cosine near-duplicate pairs (north star dedup
# tier for embedded corpora), BUCKET-FIRST: candidates come from the
# q53 hyperplane-band buckets (equi-join on (band, signature) — a
# shuffle hash join), cosine is verified on candidates only. Same
# funnel as MinHash→Jaccard; never an all-pairs cross product, so the
# shape survives 100 TB. The exact brute-force tier remains available
# behind an explicit row-count guard for small inputs/tests.
COSINE_DUP_THRESHOLD = 0.4  # 17 verified pairs at sf0.01 — a real check


# In-UDF pre-filter margin for the Arrow verify tier: a pair survives
# iff eround(cos, 4) >= threshold, i.e. raw cos >= threshold - 5e-5
# (the round-half step) - 1e-6 (the eround nudge). 6e-5 covers both
# with slack; the engine-side eround filter makes the final call, so
# the margin only ever admits extra candidates, never drops one.
_COS_PREFILTER_MARGIN = 6e-5
_ARROW_CHUNK = 1024  # rows of the bucket matmul per slab (memory bound)
# applyInPandas materializes one WHOLE (band, sig) group per task, so
# the chunked slab alone can't bound a degenerate bucket (round-8
# ADVICE: many near-identical vectors land in one executor's pandas
# group). Buckets above this row count are routed to the distributed
# expression-fold pair join instead — no group materialization, the
# skewed bucket's k² pairs spread across the cluster. At the cap the
# in-kernel footprint is ~cap×d×8 bytes for the stacked matrix
# (d=128 → 32 MB) plus the adaptive slab below.
_MAX_ARROW_BUCKET = 32768
_ARROW_SLAB_ELEMS = 8 << 20  # cosine slab budget: chunk×k ≤ 8M doubles


def _bucket_cosine_pairs_fn(threshold: float):
    """pandas-side kernel for the per-bucket verify: all pairwise
    cosines of one LSH bucket via a chunked BLAS matmul. Memory is
    bounded at _ARROW_CHUNK×k doubles per slab regardless of bucket
    size; only pairs within the pre-filter margin of the threshold are
    emitted, so the output is the (tiny) near-dup set, not k²."""
    import numpy as np
    import pandas as pd

    cut = threshold - _COS_PREFILTER_MARGIN
    empty = pd.DataFrame(
        {"vec_a": pd.Series(dtype="int64"),
         "vec_b": pd.Series(dtype="int64"),
         "cos_raw": pd.Series(dtype="float64")}
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        k = len(pdf)
        if k < 2:
            return empty
        m = np.stack(pdf["v"].to_numpy())  # k × d float64
        nr = pdf["nrm"].to_numpy()
        ids = pdf["vec_id"].to_numpy()
        outs = []
        # adaptive slab: chunk×k doubles ≤ _ARROW_SLAB_ELEMS, so the
        # cosine matrix slab stays ~64 MB even near _MAX_ARROW_BUCKET
        chunk = max(64, min(_ARROW_CHUNK, _ARROW_SLAB_ELEMS // k))
        for s in range(0, k, chunk):
            e = min(s + chunk, k)
            cos = (m[s:e] @ m.T) / np.outer(nr[s:e], nr)
            ii, jj = np.nonzero(cos >= cut)
            keep = (ii + s) < jj  # vec_a < vec_b (ids ascending)
            ii, jj = ii[keep], jj[keep]
            if len(ii):
                outs.append(pd.DataFrame(
                    {"vec_a": ids[ii + s], "vec_b": ids[jj],
                     "cos_raw": cos[ii, jj]}
                ))
        return pd.concat(outs) if outs else empty

    return fn


def cosine_near_dup_pairs(
    emb: DataFrame,
    threshold: float = COSINE_DUP_THRESHOLD,
    exact_max_rows: int = 0,
    arrow: bool = True,
) -> DataFrame:
    """``emb``: (vec_id, v array<double>). Bucket-first candidate
    generation; set ``exact_max_rows`` > 0 to allow the O(n²) exact
    tier when the corpus is provably tiny (guarded — never silent).

    Verify tiers (round 7 — VERDICT r6 Next #4: q54 was the slowest
    headline query, dominated by the per-pair verify):

    * ``arrow=True`` (default): per-bucket Arrow kernel. Vectors move
      ONCE per band into their (band, sig) bucket (~2 corpus copies,
      no per-pair vector shuffle) and every bucket computes its
      pairwise cosines as a chunked float64 BLAS matmul; pairs within
      a conservative margin of the threshold come back and the final
      eround-threshold filter runs engine-side. Cross-band duplicate
      candidates collapse via max(cos_raw) — the two values differ by
      at most summation-order ulps, which the eround nudge absorbs.
      Measured at sf0.1: 4.5s → 1.3s, identical 257 pairs. This is a
      sanctioned Arrow numeric kernel (see UDF_NOTES.md): the per-pair
      dot is exactly the BLAS-shaped work Catalyst folds run
      interpreted, and the alternatives measured WORSE (unrolled
      codegen dot 9.4s, dim-exploded groupBy sum 6.7s).

    * ``arrow=False``: the round-6 expression-only path — per-vector
      L2 norms computed ONCE on the (checkpointed) corpus and carried
      through the candidate join, verify = a single interpreted dot
      fold per pair. Kept as the cross-proof tier
      (test_cosine_dup_arrow_matches_fold) and for Arrow-less
      deployments."""
    nrm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    # not checkpointed: corpus-sized with vectors (see the buckets
    # note below); the norm fold is cheap to recompute per consumer
    emb_n = emb.select("vec_id", "v", nrm.alias("nrm"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    if arrow and not exact_max_rows:
        sigs = band_signatures(F.col("v"))
        # NOT checkpointed despite multiple consumers: the frame is
        # corpus-sized AND carries the vectors, and materializing
        # corpus-sized intermediates measured several times slower at
        # the 100x tier than recomputing the projections (see
        # dsir_weights / q131) — only bounded frames earn a checkpoint
        buckets = emb_n.select(
            "vec_id", "v", "nrm",
            F.posexplode(F.array(*sigs)).alias("band", "sig"),
        )
        # oversized-bucket keys: a keys-only count (no vectors move)
        # whose >cap survivors are the RARE skewed buckets — small by
        # construction, so broadcasting them keeps the main path to a
        # single anti-join with no extra vector shuffle
        oversized = F.broadcast(
            buckets.groupBy("band", "sig")
            .agg(F.count("*").alias("_bn"))
            .filter(F.col("_bn") > _MAX_ARROW_BUCKET)
            .select("band", "sig")
        )
        raw = (
            buckets.join(oversized, ["band", "sig"], "left_anti")
            .groupBy("band", "sig")
            .applyInPandas(
                _bucket_cosine_pairs_fn(threshold),
                "vec_a long, vec_b long, cos_raw double",
            )
        )
        # oversized (skewed) buckets: distributed expression-fold pair
        # join — k² pairs spread over the cluster instead of one k×d
        # pandas group per executor (round-8 ADVICE)
        big = buckets.join(oversized, ["band", "sig"], "left_semi")
        big_raw = (
            big.select(
                "band", "sig", F.col("vec_id").alias("vec_a"),
                F.col("v").alias("va"), F.col("nrm").alias("na"),
            )
            .join(
                big.select(
                    "band", "sig", F.col("vec_id").alias("vec_b"),
                    F.col("v").alias("vb"), F.col("nrm").alias("nb"),
                ),
                ["band", "sig"],
            )
            .filter(F.col("vec_a") < F.col("vec_b"))
            .select(
                "vec_a", "vec_b",
                (dot / (F.col("na") * F.col("nb"))).alias("cos_raw"),
            )
            .filter(F.col("cos_raw") >= threshold - _COS_PREFILTER_MARGIN)
        )
        return (
            raw.unionByName(big_raw)
            .groupBy("vec_a", "vec_b")
            .agg(F.max("cos_raw").alias("cos_raw"))
            .select(
                "vec_a", "vec_b",
                eround(F.col("cos_raw"), 4).alias("cosine"),
            )
            .filter(F.col("cosine") >= threshold)
            .orderBy("vec_a", "vec_b")
        )
    if exact_max_rows and emb.count() <= exact_max_rows:
        a = emb_n.select(
            F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
            F.col("nrm").alias("na"),
        )
        b = emb_n.select(
            F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
            F.col("nrm").alias("nb"),
        )
        cand = a.join(b, F.col("vec_a") < F.col("vec_b"))
    else:
        sigs = band_signatures(F.col("v"))
        bands = emb_n.select(
            "vec_id", F.posexplode(F.array(*sigs)).alias("band", "sig")
        )
        pairs = (
            bands.select(F.col("vec_id").alias("vec_a"), "band", "sig")
            .join(
                bands.select(F.col("vec_id").alias("vec_b"), "band", "sig"),
                ["band", "sig"],
            )
            .filter(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b")
            .distinct()
        )
        cand = pairs.join(
            emb_n.select(
                F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
                F.col("nrm").alias("na"),
            ),
            "vec_a",
        ).join(
            emb_n.select(
                F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
                F.col("nrm").alias("nb"),
            ),
            "vec_b",
        )
    return (
        cand.select(
            "vec_a",
            "vec_b",
            eround(dot / (F.col("na") * F.col("nb")), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .orderBy("vec_a", "vec_b")
    )


# Verified cosine near-dup pairs per (application, sf_dir): q54
# reports them and q130 acts on them — one session builds the bucket
# funnel once (the in-session form of "at 100 TB you'd persist the
# pair table"; same memo pattern as dedup.shingle_state). Cleared by
# clear_cosine_pairs_cache (cascaded from sketches.clear_lp_cache so
# cold probes stay honest).
_COS_PAIRS_CACHE: dict[tuple[str, str], DataFrame] = {}


def clear_cosine_pairs_cache() -> None:
    from .sketches import _safe_unpersist

    for pairs in _COS_PAIRS_CACHE.values():
        _safe_unpersist(pairs)
    _COS_PAIRS_CACHE.clear()


def cosine_pairs_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _COS_PAIRS_CACHE.get(key)
    if hit is not None:
        return hit
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v")
    )
    pairs = cosine_near_dup_pairs(emb).persist(StorageLevel.MEMORY_AND_DISK)
    pairs.count()
    _COS_PAIRS_CACHE[key] = pairs
    return pairs


def q54_cosine_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_pairs_state(spark, sf_dir)


def ivf_list_assignments(emb: DataFrame, n_probe: int = 2) -> DataFrame:
    """(band=0, sig=list id, vec_id, v, nrm) — every vector assigned to
    its ``n_probe`` nearest per-label-centroid lists (q55's coarse
    quantizer). Linear in the corpus (n·|labels| centroid folds, a
    per-vec window over |labels| rows); exposed separately so the
    scaling probe can measure list OCCUPANCY — and hence the quadratic
    within-list candidate volume — without running the verify."""
    nrm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    emb_n = emb.select("vec_id", "label", "v", nrm.alias("nrm"))
    dims = emb_n.select("label", F.posexplode("v").alias("dim", "x"))
    cent = (
        dims.groupBy("label", "dim")
        .agg(F.avg("x").alias("c"))
        .groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "c"))
            ).alias("cs")
        )
        .select(
            F.col("label").alias("clabel"),
            F.transform("cs", lambda s: s["c"]).alias("cv"),
        )
    )
    cdot = F.aggregate(
        F.zip_with("v", "cv", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cnrm = F.sqrt(
        F.aggregate("cv", F.lit(0.0), lambda acc, x: acc + x * x)
    )
    assign = (
        emb_n.crossJoin(F.broadcast(cent))
        .select(
            "vec_id", "v", "nrm", "clabel",
            (cdot / (F.col("nrm") * cnrm)).alias("ccos"),
        )
    )
    wl = Window.partitionBy("vec_id").orderBy(
        F.desc("ccos"), F.asc("clabel")
    )
    return (
        assign.withColumn("pr", F.row_number().over(wl))
        .filter(F.col("pr") <= n_probe)
        .select(
            F.lit(0).alias("band"),
            F.col("clabel").cast("long").alias("sig"),
            "vec_id", "v", "nrm",
        )
    )


def cosine_near_dup_pairs_ivf(
    emb: DataFrame,
    threshold: float = COSINE_DUP_THRESHOLD,
    n_probe: int = 2,
) -> DataFrame:
    """The q130 IVF-candidate A/B arm (VERDICT r9 Next #6): SemDeDup
    candidate generation via q55's coarse quantizer — per-label
    centroid lists — instead of hyperplane-LSH bands. Every vector is
    ASSIGNED to its ``n_probe`` nearest centroid lists (multi-probe, so
    near-dups straddling a list boundary still meet); candidates are
    within-list pairs, verified by the same Arrow kernel + eround
    threshold as the banded path.

    SCALE SHAPE — and why this arm is an A/B, not the default: with a
    FIXED list count k (the label vocabulary, 10 here), per-list
    occupancy grows linearly with the corpus and the within-list
    verify grows ~n²·n_probe²/k — quadratic. The banded-LSH path has
    the same occupancy math per (band, sig) bucket but its bucket
    count is 2^(planes/bands) per band and the PLANE COUNT is the
    cheap exponent knob; a real IVF deployment scales k ~ sqrt(n)
    (retraining the quantizer), which this engine's fixed-k labels
    cannot express. Measured numbers live in SCALING_r10's
    ``q130_ivf_ab`` extra. ``emb``: (vec_id, label, v array<double>)."""
    lists = ivf_list_assignments(emb, n_probe)
    raw = lists.groupBy("band", "sig").applyInPandas(
        _bucket_cosine_pairs_fn(threshold),
        "vec_a long, vec_b long, cos_raw double",
    )
    return (
        raw.groupBy("vec_a", "vec_b")
        .agg(F.max("cos_raw").alias("cos_raw"))
        .select(
            "vec_a", "vec_b", eround(F.col("cos_raw"), 4).alias("cosine")
        )
        .filter(F.col("cosine") >= threshold)
        .orderBy("vec_a", "vec_b")
    )


# --- q55: IVF-style ANN — the scale path. Coarse quantizer = per-label
# centroids; each query probes only the N_PROBE nearest centroid lists,
# then ranks exact cosine within those lists. At 100TB the corpus is
# partitioned by list id, so a query touches n_probe/n_lists of the
# data. Centroid distances are computed via a dim-exploded join (ONE
# formulation both engines share — no array rebuild, no rounding drift
# beyond the final round).
N_PROBE = 3


def ivf_centroid_cos(emb: DataFrame) -> DataFrame:
    """(query_id, label, ccos) — every demo query's cosine to every
    label centroid: the IVF coarse quantizer, shared by q55 (keeps the
    top N_PROBE lists) and q168's probe-count sweep (ranks ALL lists).
    |queries|×|labels| rows — corpus-size-independent after the one
    centroid aggregation."""
    # dims feeds centroids, query dims, and norms — materialize once
    dims = emb.select(
        "vec_id", "label", F.posexplode("v").alias("dim", "x")
    ).localCheckpoint(eager=False)
    cent = dims.groupBy("label", "dim").agg(F.avg("x").alias("c"))
    cent_norm = cent.groupBy("label").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("cnorm")
    )
    qdims = dims.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "dim", F.col("x").alias("qx")
    )
    qnorm = qdims.groupBy("query_id").agg(
        F.sqrt(F.sum(F.col("qx") * F.col("qx"))).alias("qnorm")
    )
    return (
        qdims.join(cent, "dim")
        .groupBy("query_id", "label")
        .agg(F.sum(F.col("qx") * F.col("c")).alias("dot"))
        .join(F.broadcast(cent_norm), "label")
        .join(F.broadcast(qnorm), "query_id")
        .select(
            "query_id",
            "label",
            eround(F.col("dot") / (F.col("cnorm") * F.col("qnorm")), 6).alias(
                "ccos"
            ),
        )
    )


def ivf_knn(
    spark: SparkSession, sf_dir: str, n_probe: int = N_PROBE
) -> DataFrame:
    """IVF top-k with a caller-chosen probe count — q55's body. At
    n_probe = |labels| every list is scanned, so the result provably
    equals the brute-force ranking (q50 minus the label column) —
    the equivalence test_hybrid_rrf_ivf_full_probe_equals_exact pins,
    which is what makes 'swap the IVF arm in at 100 TB' (q178) a
    contract rather than a hope."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("v")
    )
    qc = ivf_centroid_cos(emb)
    wp = Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("label"))
    probes = qc.withColumn("pr", F.row_number().over(wp)).filter(
        F.col("pr") <= n_probe
    ).select("query_id", "label")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cands = (
        F.broadcast(probes)
        .join(emb, "label")
        .join(F.broadcast(queries), "query_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            eround(cosine(F.col("qv"), F.col("v")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        cands.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .orderBy("query_id", "rk")
    )


def q55_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ivf_knn(spark, sf_dir, N_PROBE)


# --- q168: IVF probe-count sweep (round 11) — the nprobe SERVING
# KNOB's decision table, completing the embedding-audit family (q107
# quantization grid, q161 truncated dims): per candidate-list probe
# count, average recall@TOP_K vs the exact ranking AND the average
# fraction of the corpus scanned — the recall-vs-cost curve an ANN
# deployment reads before fixing nprobe. Uses the identity that makes
# the sweep ONE pass: a true top-K neighbor appears in IVF's top-K at
# probe count p iff its label's centroid-rank for that query is <= p
# (any scanned subset containing it has < K vectors above it), so
# recall at EVERY p falls out of joining the exact top-K against the
# |queries|×|labels| probe-rank table — the rankings are never
# recomputed per p. Scale shape: one centroid agg + one bounded
# broadcast-probe scan (q50's class); everything after is
# |queries|×|labels|-sized. nprobe = |labels| is the exhaustive
# sanity row (recall 1.0 by construction).
IVF_SWEEP = (1, 2, 3, 5, 10)


def q168_ivf_probe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("v")
    )
    qc = ivf_centroid_cos(emb)
    wp = Window.partitionBy("query_id").orderBy(
        F.desc("ccos"), F.asc("label")
    )
    pr = (
        qc.withColumn("pr", F.row_number().over(wp))
        .select("query_id", "label", "pr")
        .localCheckpoint(eager=False)  # |queries|×|labels| rows,
        # feeds the recall join AND the scan-cost sweep
    )
    nrm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    emb_n = emb.select("vec_id", "label", "v", nrm.alias("nrm"))
    queries = emb_n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    dot = F.aggregate(
        F.zip_with("qv", "v", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        F.broadcast(queries)
        .join(emb_n, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "label",
            eround(dot / (F.col("qnrm") * F.col("nrm")), 4).alias("cosine"),
            F.col("vec_id").alias("neighbor_id"),
        )
    )
    wt = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    truth = (
        scored.withColumn("rk", F.row_number().over(wt))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "label")
    )
    sweep = F.explode(
        F.array(*[F.lit(k) for k in IVF_SWEEP])
    ).alias("n_probe")
    rec = (
        truth.join(pr, ["query_id", "label"])
        .select("query_id", "pr", sweep)
        .groupBy("n_probe", "query_id")
        .agg(
            (
                F.sum(
                    F.when(F.col("pr") <= F.col("n_probe"), 1).otherwise(0)
                )
                / float(TOP_K)
            ).alias("r")
        )
        .groupBy("n_probe")
        .agg(eround(F.avg("r"), 4).alias("avg_recall"))
    )
    sizes = emb.groupBy("label").agg(F.count("*").alias("lsz"))
    ntot = emb.agg(F.count("*").alias("n_all"))
    sc = (
        pr.join(F.broadcast(sizes), "label")
        .select("query_id", "pr", "lsz", sweep)
        .groupBy("n_probe", "query_id")
        .agg(
            F.sum(
                F.when(F.col("pr") <= F.col("n_probe"), F.col("lsz"))
                .otherwise(0)
            ).alias("scanned")
        )
        .crossJoin(F.broadcast(ntot))
        .groupBy("n_probe")
        .agg(
            eround(
                F.avg(F.col("scanned") / F.col("n_all")), 4
            ).alias("avg_scan_frac")
        )
    )
    return (
        rec.join(sc, "n_probe")
        .select(
            F.col("n_probe").cast("int").alias("n_probe"),
            "avg_recall",
            "avg_scan_frac",
        )
        .orderBy("n_probe")
    )


# --- q107: scalar-quantized kNN with measured recall — the memory-
# bandwidth scale path for embedding search. Each dimension is affinely
# mapped to the QUANT_LEVELS int grid using corpus min/max (the 64-row
# stats table BROADCASTS), vectors are reconstructed from the grid, and
# top-k runs on the reconstructed values; the query reports per-probe
# recall@k and cosine error vs the exact float ranking computed in the
# same lineage. At 100 TB the int8 codes are 4× smaller than float32 —
# the corpus scan that dominates brute-force/IVF search moves 4× less
# memory — and this query is the accuracy audit for that trade.
# floor(v + 0.5) instead of round(): identical half-up semantics in
# both engines on any double (round()'s half-to-even vs half-away
# difference is a knife-edge on grid-aligned inputs). Two grid sizes
# run side by side — 255 (int8) and 15 (int4) — because the int8 tier
# alone is indistinguishable from exact on this corpus (recall 1.0);
# the int4 tier is where the trade becomes visible (recall ~0.78).
# --- q191: label-noise audit via kNN disagreement (round 11,
# session 2) — the Confident-Learning/deep-kNN curation screen: a
# vector whose nearest neighbors mostly carry a DIFFERENT label is a
# suspected mislabel. Complements q110, which flags geometric outliers
# by centroid distance — a mislabeled point sitting comfortably inside
# ANOTHER label's cluster passes q110 (it's near a centroid, just the
# wrong one) and is exactly what kNN disagreement catches. Neighbor
# candidates ride q54's hyperplane-band funnel (equi-join on (band,
# sig) — never all-pairs; the per-vector top-K window runs over the
# candidate list, bounded by bucket occupancy, q54's documented
# class; IVF lists are the measured 100 TB alternative). Determinism:
# the rank key is the 6dp-rounded cosine with a neighbor-id tiebreak;
# per-vector disagreement is a ratio of small ints, and the > 0.5
# suspect cut never lands on a representability edge both engines
# could split on. NOTE the synthetic corpus's labels are nearly
# geometry-free (expected disagreement for random labels over 10
# classes is 0.9; the table reads ~0.83–0.93), so the registry output
# honestly reports "these labels are noise" — the planted test
# (interloper inside the other cluster is the ONLY suspect) pins the
# discriminating behavior this audit exists for.
#
# A/B (this round, min-of-2 per arm): the first cut computed every
# within-bucket pairwise cosine through the expression fold —
# SCALING_r11 measured per-row ratio 0.836 at 10x (23.4 s), the
# heaviest newborn. The adopted arrow tier reshapes q54's per-bucket
# BLAS kernel from threshold-filter to per-row top-k (output ~k rows
# per vector instead of k² per bucket): 1x 3.77→2.87 s (1.31x), 10x
# 26.3→2.95 s (8.9x, per-row ratio 0.836→~0.10). Exactness argument
# for the kernel's keep-margin is at _KNN_KEEP_MARGIN; the fold tier
# stays as the oversized-bucket fallback and the cross-proof
# (test_label_noise_arrow_matches_fold).
KNN_NOISE_K = 5
NOISE_DISAGREE = 0.5
# kernel keep-margin: a pair more than 2e-6 of raw cosine below the
# k-th best cannot round (6dp, +1e-6 eround nudge) to a value that
# ties or beats it — rounding contracts a gap by at most one 1e-6
# grid step — so pruning below kth-2e-6 provably never changes the
# engine-side final ranking (the q54 pre-filter-margin argument)
_KNN_KEEP_MARGIN = 2e-6


def _bucket_knn_fn(k: int):
    """pandas kernel: per (band, sig) bucket, each vector's candidate
    neighbors within the keep-margin of its k-th best raw cosine —
    chunked BLAS matmul (the q54 kernel reshaped from threshold-filter
    to per-row top-k), output ~k rows per vector instead of k² per
    bucket."""
    import numpy as np
    import pandas as pd

    empty = pd.DataFrame(
        {"va": pd.Series(dtype="int64"),
         "vb": pd.Series(dtype="int64"),
         "cos_raw": pd.Series(dtype="float64")}
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        n = len(pdf)
        if n < 2:
            return empty
        m = np.stack(pdf["v"].to_numpy())
        nr = pdf["nrm"].to_numpy()
        ids = pdf["vec_id"].to_numpy()
        outs = []
        chunk = max(64, min(_ARROW_CHUNK, _ARROW_SLAB_ELEMS // n))
        kk = min(k, n - 1)
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            cos = (m[s:e] @ m.T) / np.outer(nr[s:e], nr)
            cos[np.arange(e - s), np.arange(s, e)] = -np.inf  # self
            kth = np.partition(cos, n - kk, axis=1)[:, n - kk]
            ii, jj = np.nonzero(cos >= (kth - _KNN_KEEP_MARGIN)[:, None])
            if len(ii):
                outs.append(pd.DataFrame(
                    {"va": ids[ii + s], "vb": ids[jj],
                     "cos_raw": cos[ii, jj]}
                ))
        return pd.concat(outs) if outs else empty

    return fn


def _label_noise_pairs(emb_n: DataFrame, arrow: bool = True) -> DataFrame:
    """(va, vb, cos) candidate-neighbor pairs for the kNN-disagreement
    audit. ``arrow=True`` (default): per-bucket BLAS top-k kernel with
    the q54 oversized-bucket fallback — A/B'd at 1x/10x (see q191
    docstring); ``arrow=False``: the expression-fold tier over distinct
    bucket candidates, kept as the cross-proof
    (test_label_noise_arrow_matches_fold)."""
    buckets = emb_n.select(
        "vec_id", "v", "nrm",
        F.posexplode(F.array(*band_signatures(F.col("v")))).alias(
            "band", "sig"
        ),
    )
    dot = F.aggregate(
        F.zip_with("xa", "xb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    if arrow:
        oversized = F.broadcast(
            buckets.groupBy("band", "sig")
            .agg(F.count("*").alias("_bn"))
            .filter(F.col("_bn") > _MAX_ARROW_BUCKET)
            .select("band", "sig")
        )
        small = (
            buckets.join(oversized, ["band", "sig"], "left_anti")
            .groupBy("band", "sig")
            .applyInPandas(
                _bucket_knn_fn(KNN_NOISE_K),
                "va long, vb long, cos_raw double",
            )
        )
        big = buckets.join(oversized, ["band", "sig"], "left_semi")
        big_raw = (
            big.select(
                "band", "sig", F.col("vec_id").alias("va"),
                F.col("v").alias("xa"), F.col("nrm").alias("na"),
            )
            .join(
                big.select(
                    "band", "sig", F.col("vec_id").alias("vb"),
                    F.col("v").alias("xb"), F.col("nrm").alias("nb"),
                ),
                ["band", "sig"],
            )
            .filter(F.col("va") != F.col("vb"))
            .select(
                "va", "vb", (dot / (F.col("na") * F.col("nb"))).alias("cos_raw")
            )
        )
        raw = small.unionByName(big_raw)
    else:
        sa = buckets.select(F.col("vec_id").alias("va"), "band", "sig")
        sb = buckets.select(F.col("vec_id").alias("vb"), "band", "sig")
        cand = (
            sa.join(sb, ["band", "sig"])
            .filter(F.col("va") != F.col("vb"))
            .select("va", "vb")
            .distinct()
        )
        raw = (
            cand.join(
                emb_n.select(
                    F.col("vec_id").alias("va"),
                    F.col("v").alias("xa"), F.col("nrm").alias("na"),
                ),
                "va",
            )
            .join(
                emb_n.select(
                    F.col("vec_id").alias("vb"),
                    F.col("v").alias("xb"), F.col("nrm").alias("nb"),
                ),
                "vb",
            )
            .select(
                "va", "vb", (dot / (F.col("na") * F.col("nb"))).alias("cos_raw")
            )
        )
    # cross-band duplicates collapse on max(cos_raw) — the two copies
    # differ by at most summation-order ulps, which the eround absorbs
    return (
        raw.groupBy("va", "vb")
        .agg(F.max("cos_raw").alias("cos_raw"))
        .select("va", "vb", eround(F.col("cos_raw"), 6).alias("cos"))
    )


def q191_label_noise(
    spark: SparkSession, sf_dir: str, arrow: bool = True
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("v")
    )
    nrm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    emb_n = emb.select("vec_id", "label", "v", nrm.alias("nrm"))
    pairs = _label_noise_pairs(emb_n, arrow=arrow)
    labs = emb.select("vec_id", "label")
    scored_pairs = (
        pairs.join(
            labs.select(F.col("vec_id").alias("va"), F.col("label").alias("la")),
            "va",
        )
        .join(
            labs.select(F.col("vec_id").alias("vb"), F.col("label").alias("lb")),
            "vb",
        )
    )
    wk = Window.partitionBy("va").orderBy(F.desc("cos"), F.asc("vb"))
    per_vec = (
        scored_pairs.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= KNN_NOISE_K)
        .groupBy("va", "la")
        .agg(
            F.avg(
                F.when(F.col("la") != F.col("lb"), 1.0).otherwise(0.0)
            ).alias("disagree")
        )
    )
    lab = emb.groupBy("label").agg(F.count("*").alias("n_vecs"))
    scored = per_vec.select(
        F.col("la").alias("label"), "va", "disagree"
    )
    return (
        lab.join(scored, "label", "left")
        .groupBy("label", "n_vecs")
        .agg(
            F.count("va").alias("n_scored"),
            F.coalesce(
                F.sum(
                    F.when(F.col("disagree") > NOISE_DISAGREE, 1).otherwise(0)
                ),
                F.lit(0),
            ).alias("n_suspect"),
            F.when(F.count("va") == 0, None)
            .otherwise(
                eround(
                    1e-9
                    + F.sum(
                        F.when(
                            F.col("disagree") > NOISE_DISAGREE, 1
                        ).otherwise(0)
                    )
                    / F.count("va").cast("double"),
                    4,
                )
            )
            .alias("suspect_share"),
            F.when(F.count("va") == 0, None)
            .otherwise(eround(1e-9 + F.avg("disagree"), 4))
            .alias("avg_disagree"),
        )
        .orderBy("label")
    )


_Q191_ORACLE = f"""
    WITH weights AS (
      SELECT p.range AS p, d.range AS d,
             CASE WHEN ascii(substr(md5(concat(p.range, ':', d.range)), 32, 1)) % 2 = 0
                  THEN 1.0 ELSE -1.0 END AS w
      FROM range(0, {N_HYPERPLANES}) p, range(0, {EMB_DIM}) d
    ),
    dims AS (
      SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    proj AS (
      SELECT m.vec_id, w.p, round(sum(m.x * w.w), 6) AS proj
      FROM dims m JOIN weights w ON m.d = w.d
      GROUP BY m.vec_id, w.p
    ),
    bandsigs AS (
      SELECT vec_id, CAST(p // {N_HYPERPLANES // N_BANDS} AS INTEGER) AS band,
             CAST(sum(CASE WHEN proj > 0
                           THEN power(2, p % {N_HYPERPLANES // N_BANDS})
                           ELSE 0 END) AS BIGINT) AS sig
      FROM proj GROUP BY vec_id, band
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
      FROM bandsigs a
      JOIN bandsigs b ON a.band = b.band AND a.sig = b.sig
                     AND a.vec_id <> b.vec_id
    ),
    pairs AS (
      SELECT c.va, c.vb, a.label AS la, b.label AS lb,
             round(
               list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
               / (sqrt(list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                * sqrt(list_inner_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))),
               6) AS cos
      FROM cand c
      JOIN embeddings a ON a.vec_id = c.va
      JOIN embeddings b ON b.vec_id = c.vb
    ),
    topk AS (
      SELECT va, la, lb FROM (
        SELECT va, la, lb,
               row_number() OVER (
                 PARTITION BY va ORDER BY cos DESC, vb ASC
               ) AS rk
        FROM pairs
      ) WHERE rk <= {KNN_NOISE_K}
    ),
    per_vec AS (
      SELECT va, la,
             avg(CASE WHEN la <> lb THEN 1.0 ELSE 0.0 END) AS disagree
      FROM topk GROUP BY va, la
    ),
    lab AS (SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY label)
    SELECT l.label, l.n_vecs,
           CAST(count(p.va) AS BIGINT) AS n_scored,
           CAST(coalesce(sum(CASE WHEN p.disagree > {NOISE_DISAGREE}
                             THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_suspect,
           (CASE WHEN count(p.va) = 0 THEN NULL
                 ELSE round(1e-9 + sum(CASE WHEN p.disagree > {NOISE_DISAGREE}
                                       THEN 1 ELSE 0 END)
                            / CAST(count(p.va) AS DOUBLE), 4) END)
             AS suspect_share,
           (CASE WHEN count(p.va) = 0 THEN NULL
                 ELSE round(1e-9 + avg(p.disagree), 4) END) AS avg_disagree
    FROM lab l LEFT JOIN per_vec p ON p.la = l.label
    GROUP BY l.label, l.n_vecs
    ORDER BY l.label
"""


# --- q198: embedding dispersion per label (round 11, session 2) —
# semantic-diversity measurement for embedded corpora: the EXACT mean
# pairwise squared L2 distance within each label, computed from TWO
# aggregates and zero pair joins via the algebraic identity
#   Σ_{i,j} ||x_i − x_j||² = 2·(n·Σ||x_i||² − ||Σ x_i||²)
# (expand the square; cross terms collapse to the squared norm of the
# sum). The n²-pair statistic every diversity report wants, at O(n·d)
# aggregate cost — the cleanest instance of the repo's
# algebra-instead-of-pair-join discipline, worth a named row.
# The mean is over DISTINCT ordered pairs — divide by n·(n−1), not n²,
# so the n zero self-pairs never dilute it (ADVICE r11); a singleton
# label has no pairs and reads NULL rather than a fabricated 0.
# Complements q143 (token-level distinct-n diversity) and q52 (norm
# stats) with the geometric spread; low dispersion = semantically
# collapsed label (a SemDeDup candidate before any pair is scored).
# Determinism: Σ||x||² and the per-dim sums are engine-ordered float
# sums — the eround nudge absorbs summation-order ulps (the q121
# class).
def q198_embedding_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("v")
    )
    sq = F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x)
    # Σ||x||² and n: a narrow fold per row, |labels|-key agg — no explode
    b = (
        emb.select("label", sq.alias("sq"))
        .groupBy("label")
        .agg(F.sum("sq").alias("sum_sq"), F.count("*").alias("n"))
    )
    # ||Σx||²: one (label, dim) map-side-combined shuffle, then the
    # per-label sum of squared per-dim sums
    a = (
        emb.select("label", F.posexplode("v").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.sum("x").alias("sx"))
        .groupBy("label")
        .agg(F.sum(F.col("sx") * F.col("sx")).alias("norm_sum_sq"))
    )
    agg = b.join(F.broadcast(a), "label")
    disp = (
        2.0
        * (F.col("n") * F.col("sum_sq") - F.col("norm_sum_sq"))
        / (F.col("n").cast("double") * (F.col("n") - F.lit(1)))
    )
    return agg.select(
        "label",
        F.col("n").cast("long").alias("n_vecs"),
        eround(1e-9 + F.sqrt(F.col("sum_sq") / F.col("n")), 4).alias(
            "rms_norm"
        ),
        F.when(F.col("n") > 1, eround(1e-9 + disp, 4)).alias("dispersion"),
    ).orderBy("label")


_Q198_ORACLE = """
    WITH dims AS (
      SELECT label, vec_id,
             generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    per_vec AS (
      SELECT label, vec_id, sum(x * x) AS sq FROM dims GROUP BY label, vec_id
    ),
    sums AS (
      SELECT label, dim, sum(x) AS sx FROM dims GROUP BY label, dim
    ),
    a AS (
      SELECT label, sum(sx * sx) AS norm_sum_sq FROM sums GROUP BY label
    ),
    b AS (
      SELECT label, sum(sq) AS sum_sq, count(*) AS n
      FROM per_vec GROUP BY label
    )
    SELECT b.label,
           CAST(b.n AS BIGINT) AS n_vecs,
           round(1e-9 + sqrt(b.sum_sq / b.n), 4) AS rms_norm,
           (CASE WHEN b.n > 1
                 THEN round(1e-9 + 2.0 * (b.n * b.sum_sq - a.norm_sum_sq)
                            / (CAST(b.n AS DOUBLE) * (b.n - 1)), 4)
            END) AS dispersion
    FROM b JOIN a USING (label)
    ORDER BY b.label
"""


# --- q189: incremental IVF index maintenance (round 11, session 2) —
# the last index family without an evolving-state path (BM25 q171,
# dedup q118, spans q132, clusters q163, shards q183 — IVF closed
# here). Production story: an ANN deployment does NOT re-cluster when
# a batch of new vectors lands; it assigns them to the FROZEN coarse
# quantizer (one batch×|centroids| broadcast fold — the old corpus is
# never re-scanned for assignment) and appends to the lists, while a
# drift monitor watches each list's member-mean pull away from its
# frozen centroid and flags the recluster. The registry query
# simulates the arriving batch deterministically (u16(vec_id)%10 == 0
# — the q177/q188 stand-in pattern); `write_ivf_index` /
# `ivf_index_append` / `ivf_drift_report` is the persisted production
# path (bm25_index_update's idempotent hive-partition protocol).
# Determinism: assignment ranks the 6dp-rounded centroid cosine with
# a label tiebreak (the eround-ed-rank-key rule), and the recluster
# flag compares the 6dp-rounded drift — no float knife edge. Scale
# shape: centroids are a (label, dim) map-side-combined agg over the
# old side ONCE (|labels|×dim rows, checkpointed, broadcast
# everywhere); member means are one (list, dim) agg; everything else
# is |labels|-sized.
IVF_BATCH_MOD = 10  # u16(vec_id) % 10 == 0 → the arriving batch
IVF_DRIFT_COS = 0.96  # recluster when a list's drift cosine dips below


def _ivf_assign(batch_dims: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, list_label): each batch vector → nearest frozen
    centroid by 6dp-rounded cosine, label tiebreak. batch×|labels|
    rows, bounded by the batch."""
    cent_norm = cent.groupBy("label").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("cnrm")
    )
    bnorm = batch_dims.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("bnrm")
    )
    ccos = (
        batch_dims.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "label")
        .agg(F.sum(F.col("x") * F.col("c")).alias("dot"))
        .join(F.broadcast(cent_norm), "label")
        .join(bnorm, "vec_id")
        .select(
            "vec_id",
            "label",
            eround(F.col("dot") / (F.col("bnrm") * F.col("cnrm")), 6).alias(
                "ccos"
            ),
        )
    )
    wa = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("label"))
    return (
        ccos.withColumn("pr", F.row_number().over(wa))
        .filter(F.col("pr") == 1)
        .select("vec_id", F.col("label").alias("list_label"))
    )


def ivf_maintenance_report(old: DataFrame, batch: DataFrame) -> DataFrame:
    """Per-list occupancy growth + centroid drift after assigning
    ``batch`` to the coarse quantizer frozen from ``old``. Both inputs:
    (vec_id, label, v double array)."""
    old_dims = old.select("label", F.posexplode("v").alias("dim", "x"))
    # |labels|×dim frame consumed by assignment, the drift dot, and its
    # norm — checkpoint so the old corpus is scanned once
    cent = (
        old_dims.groupBy("label", "dim")
        .agg(F.avg("x").alias("c"))
        .localCheckpoint(eager=False)
    )
    batch_dims = batch.select("vec_id", F.posexplode("v").alias("dim", "x"))
    assigned = _ivf_assign(batch_dims, cent).localCheckpoint(eager=False)
    members = old_dims.select(
        F.col("label").alias("list_label"), "dim", "x"
    ).unionByName(
        batch_dims.join(assigned, "vec_id").select("list_label", "dim", "x")
    )
    mmean = members.groupBy("list_label", "dim").agg(F.avg("x").alias("m"))
    cent_r = cent.select(
        F.col("label").alias("clab"), F.col("dim").alias("cdim"), "c"
    )
    drift = (
        mmean.join(
            F.broadcast(cent_r),
            (F.col("list_label") == F.col("clab"))
            & (F.col("dim") == F.col("cdim")),
        )
        .groupBy("list_label")
        .agg(
            F.sum(F.col("m") * F.col("c")).alias("dot"),
            F.sqrt(F.sum(F.col("m") * F.col("m"))).alias("mnrm"),
            F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("cnrm"),
        )
        .select(
            "list_label",
            eround(F.col("dot") / (F.col("mnrm") * F.col("cnrm")), 6).alias(
                "drift_cos"
            ),
        )
    )
    n_old = old.groupBy(F.col("label").alias("list_label")).agg(
        F.count("*").alias("n_old")
    )
    n_new = assigned.groupBy("list_label").agg(F.count("*").alias("n_new"))
    rep = (
        n_old.join(n_new, "list_label", "left")
        .na.fill({"n_new": 0})
        .join(drift, "list_label")
    )
    return rep.select(
        F.col("list_label").alias("label"),
        "n_old",
        "n_new",
        F.when(F.col("n_old") == 0, None)
        .otherwise(
            eround(1e-9 + F.col("n_new") / F.col("n_old").cast("double"), 4)
        )
        .alias("growth"),
        "drift_cos",
        (F.col("drift_cos") < IVF_DRIFT_COS).alias("recluster"),
    ).orderBy("label")


def q189_incremental_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.xsql import expand_u16, hash_u16

    b = expand_u16(hash_u16("CAST(vec_id AS STRING)", "ivfbatch"), "spark")
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label", _as_double("embedding").alias("v"))
        .withColumn("_new", F.expr(f"{b} % {IVF_BATCH_MOD} = 0"))
    )
    return ivf_maintenance_report(
        emb.filter(~F.col("_new")).drop("_new"),
        emb.filter(F.col("_new")).drop("_new"),
    )


def _q189_oracle() -> str:
    from ..functions.xsql import expand_u16, hash_u16

    b = expand_u16(hash_u16("CAST(vec_id AS STRING)", "ivfbatch"), "duckdb")
    return f"""
    WITH tagged AS (
      SELECT vec_id, label, embedding,
             ({b} % {IVF_BATCH_MOD} = 0) AS is_new
      FROM embeddings
    ),
    old_dims AS (
      SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM tagged WHERE NOT is_new
    ),
    cent AS (
      SELECT label, dim, avg(x) AS c FROM old_dims GROUP BY label, dim
    ),
    cent_norm AS (
      SELECT label, sqrt(sum(c * c)) AS cnrm FROM cent GROUP BY label
    ),
    batch_dims AS (
      SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM tagged WHERE is_new
    ),
    bnorm AS (
      SELECT vec_id, sqrt(sum(x * x)) AS bnrm FROM batch_dims GROUP BY vec_id
    ),
    dotc AS (
      SELECT b.vec_id, c.label, sum(b.x * c.c) AS dot
      FROM batch_dims b JOIN cent c USING (dim)
      GROUP BY b.vec_id, c.label
    ),
    ccos AS (
      SELECT d.vec_id, d.label,
             round(d.dot / (bn.bnrm * cn.cnrm), 6) AS ccos
      FROM dotc d
      JOIN bnorm bn ON bn.vec_id = d.vec_id
      JOIN cent_norm cn ON cn.label = d.label
    ),
    assigned AS (
      SELECT vec_id, label AS list_label FROM (
        SELECT vec_id, label,
               row_number() OVER (
                 PARTITION BY vec_id ORDER BY ccos DESC, label ASC
               ) AS pr
        FROM ccos
      ) WHERE pr = 1
    ),
    members AS (
      SELECT label AS list_label, dim, x FROM old_dims
      UNION ALL
      SELECT a.list_label, b.dim, b.x
      FROM batch_dims b JOIN assigned a USING (vec_id)
    ),
    mmean AS (
      SELECT list_label, dim, avg(x) AS m FROM members GROUP BY list_label, dim
    ),
    drift AS (
      SELECT m.list_label,
             round(sum(m.m * c.c)
                   / (sqrt(sum(m.m * m.m)) * sqrt(sum(c.c * c.c))), 6)
               AS drift_cos
      FROM mmean m JOIN cent c ON c.label = m.list_label AND c.dim = m.dim
      GROUP BY m.list_label
    ),
    n_old AS (
      SELECT label AS list_label, count(*) AS n_old
      FROM tagged WHERE NOT is_new GROUP BY label
    ),
    n_new AS (
      SELECT list_label, count(*) AS n_new FROM assigned GROUP BY list_label
    )
    SELECT o.list_label AS label,
           o.n_old,
           CAST(coalesce(n.n_new, 0) AS BIGINT) AS n_new,
           (CASE WHEN o.n_old = 0 THEN NULL
                 ELSE round(1e-9 + coalesce(n.n_new, 0)
                            / CAST(o.n_old AS DOUBLE), 4) END) AS growth,
           d.drift_cos,
           (d.drift_cos < {IVF_DRIFT_COS}) AS recluster
    FROM n_old o
    LEFT JOIN n_new n USING (list_label)
    JOIN drift d USING (list_label)
    ORDER BY label
"""


def write_ivf_index(emb: DataFrame, path: str) -> None:
    """Initial IVF index build: frozen coarse-quantizer centroids +
    the base lists under a batch=-1 hive partition (bm25's layout, so
    ivf_index_append can claim idempotent partitions). List rows carry
    the vector so drift reports and serving never re-read the corpus
    table. Initial lists are the own-label assignment (q55's scan
    semantics)."""
    dims = emb.select("label", F.posexplode("v").alias("dim", "x"))
    cent = dims.groupBy("label", "dim").agg(F.avg("x").alias("c"))
    cent.write.mode("overwrite").parquet(f"{path}/centroids")
    emb.select(
        "vec_id", F.col("label").alias("list_label"), "v"
    ).write.mode("overwrite").parquet(f"{path}/lists/batch=-1")


def ivf_index_append(
    spark: SparkSession, path: str, batch: DataFrame, batch_id: int = 0
) -> None:
    """Assign a batch to the FROZEN centroids and land it as an
    idempotent overwrite of its own lists/batch={batch_id} partition
    (a replayed micro-batch rewrites the identical partition); vectors
    re-sent under a DIFFERENT batch id are dropped by an anti-join
    against the other partitions — bm25_index_update's crash-safe
    protocol. Centroids are deliberately NOT updated: the index serves
    with the quantizer it was built with until ivf_drift_report flags
    a recluster."""
    cent = spark.read.parquet(f"{path}/centroids")
    existing = (
        spark.read.parquet(f"{path}/lists")
        .filter(F.col("batch") != batch_id)
        .select("vec_id")
    )
    fresh = batch.join(existing, "vec_id", "anti")
    bdims = fresh.select("vec_id", F.posexplode("v").alias("dim", "x"))
    assigned = _ivf_assign(bdims, cent)
    fresh.join(assigned, "vec_id").select(
        "vec_id", "list_label", "v"
    ).write.mode("overwrite").parquet(f"{path}/lists/batch={batch_id}")


def ivf_drift_report(spark: SparkSession, path: str) -> DataFrame:
    """Occupancy + drift of the persisted index: per list, base (batch
    -1) vs appended counts and the member-mean-vs-frozen-centroid
    cosine — the monitor that decides when the quantizer is stale."""
    cent = spark.read.parquet(f"{path}/centroids")
    lists = spark.read.parquet(f"{path}/lists")
    mdims = lists.select(
        "list_label", "batch", F.posexplode("v").alias("dim", "x")
    )
    mmean = mdims.groupBy("list_label", "dim").agg(F.avg("x").alias("m"))
    cent_r = cent.select(
        F.col("label").alias("clab"), F.col("dim").alias("cdim"), "c"
    )
    drift = (
        mmean.join(
            F.broadcast(cent_r),
            (F.col("list_label") == F.col("clab"))
            & (F.col("dim") == F.col("cdim")),
        )
        .groupBy("list_label")
        .agg(
            F.sum(F.col("m") * F.col("c")).alias("dot"),
            F.sqrt(F.sum(F.col("m") * F.col("m"))).alias("mnrm"),
            F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("cnrm"),
        )
        .select(
            "list_label",
            eround(F.col("dot") / (F.col("mnrm") * F.col("cnrm")), 6).alias(
                "drift_cos"
            ),
        )
    )
    counts = lists.groupBy("list_label").agg(
        F.sum(F.when(F.col("batch") == -1, 1).otherwise(0)).alias("n_old"),
        F.sum(F.when(F.col("batch") != -1, 1).otherwise(0)).alias("n_new"),
    )
    return (
        counts.join(drift, "list_label")
        .select(
            F.col("list_label").alias("label"),
            "n_old",
            "n_new",
            F.when(F.col("n_old") == 0, None)
            .otherwise(
                eround(1e-9 + F.col("n_new") / F.col("n_old").cast("double"), 4)
            )
            .alias("growth"),
            "drift_cos",
            (F.col("drift_cos") < IVF_DRIFT_COS).alias("recluster"),
        )
        .orderBy("label")
    )


QUANT_LEVELS = (255, 15)


def q107_quantized_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both quantization tiers FUSED into one pass (round 8): the dim
    stats, reconstructed grids, norms, and probe dots for every level
    in QUANT_LEVELS ride the same checkpointed frames and the same
    broadcast joins/aggregations as extra columns, so the corpus-side
    work (the dim-join fan-out that dominates) happens once instead of
    once per tier. Per-level rank/report branches share the scored
    frame; each level's expressions are identical to the per-tier
    oracle's."""
    lvls = QUANT_LEVELS
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v")
    )
    dims = emb.select(
        "vec_id", F.posexplode("v").alias("dim", "x")
    ).localCheckpoint(eager=False)
    stats = dims.groupBy("dim").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )

    def _dqx(levels: int):
        code = F.floor(
            (F.col("x") - F.col("mn")) * levels
            / (F.col("mx") - F.col("mn"))
            + 0.5
        )
        return (
            F.when(
                F.col("mx") > F.col("mn"),
                F.col("mn") + code * (F.col("mx") - F.col("mn")) / levels,
            )
            .otherwise(F.col("x"))
            .alias(f"dqx{levels}")
        )

    dq = (
        dims.join(F.broadcast(stats), "dim")
        .select("vec_id", "dim", "x", *[_dqx(lv) for lv in lvls])
        .localCheckpoint(eager=False)
    )
    norms = dq.groupBy("vec_id").agg(
        *[
            F.sqrt(F.sum(F.col(f"dqx{lv}") * F.col(f"dqx{lv}"))).alias(
                f"qn{lv}"
            )
            for lv in lvls
        ],
        F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("en"),
    )
    probe = dq.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        "dim",
        *[F.col(f"dqx{lv}").alias(f"pq{lv}") for lv in lvls],
        F.col("x").alias("px"),
    )
    dots = (
        F.broadcast(probe)
        .join(dq, "dim")
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(
            *[
                F.sum(F.col(f"pq{lv}") * F.col(f"dqx{lv}")).alias(
                    f"qdot{lv}"
                )
                for lv in lvls
            ],
            F.sum(F.col("px") * F.col("x")).alias("edot"),
        )
    )
    scored = (
        dots.join(
            norms.select(
                F.col("vec_id").alias("query_id"),
                *[F.col(f"qn{lv}").alias(f"qna{lv}") for lv in lvls],
                F.col("en").alias("ena"),
            ),
            "query_id",
        )
        .join(norms, "vec_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            *[
                eround(
                    F.col(f"qdot{lv}")
                    / (F.col(f"qna{lv}") * F.col(f"qn{lv}")),
                    4,
                ).alias(f"qcos{lv}")
                for lv in lvls
            ],
            eround(F.col("edot") / (F.col("ena") * F.col("en")), 4).alias(
                "ecos"
            ),
        )
    )
    we = Window.partitionBy("query_id").orderBy(
        F.desc("ecos"), F.asc("neighbor_id")
    )
    ranked = scored.select(
        "*",
        *[
            F.row_number()
            .over(
                Window.partitionBy("query_id").orderBy(
                    F.desc(f"qcos{lv}"), F.asc("neighbor_id")
                )
            )
            .alias(f"qrk{lv}")
            for lv in lvls
        ],
        F.row_number().over(we).alias("erk"),
    ).localCheckpoint(eager=False)

    outs = []
    for lv in lvls:
        topq = ranked.filter(F.col(f"qrk{lv}") <= TOP_K).select(
            "query_id", "neighbor_id"
        )
        tope = ranked.filter(F.col("erk") <= TOP_K).select(
            "query_id",
            "neighbor_id",
            F.col(f"qcos{lv}").alias("qcos"),
            "ecos",
        )
        hits = tope.join(topq, ["query_id", "neighbor_id"], "left_semi")
        # avg over integer-exact units: |qcos-ecos| is a 4-decimal
        # value, so summing its *10000 integer form makes the mean
        # independent of float summation ORDER on both engines — a
        # plain avg() of 5 grid-valued errors lands exactly on .xxxx5
        # half-boundaries, leaving the eround nudge as the only
        # defense. Same arithmetic in the oracle's errs CTE.
        err_units = F.round(
            F.abs(F.col("qcos") - F.col("ecos")) * 10000
        ).cast("long")
        per_q = (
            tope.groupBy("query_id")
            .agg(
                eround(
                    1e-9
                    + F.sum(err_units) / (F.count("*") * F.lit(10000.0)),
                    4,
                ).alias("avg_abs_cos_err")
            )
            .join(
                hits.groupBy("query_id").agg(F.count("*").alias("n_hits")),
                "query_id",
                "left",
            )
        )
        outs.append(
            per_q.select(
                F.lit(lv).alias("levels"),
                "query_id",
                F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                eround(
                    F.coalesce("n_hits", F.lit(0)).cast("double") / TOP_K,
                    4,
                ).alias("recall"),
                "avg_abs_cos_err",
            )
        )
    out = outs[0]
    for t in outs[1:]:
        out = out.unionByName(t)
    return out.orderBy("levels", "query_id")


_Q107_ORACLE_TEMPLATE = """
    SELECT CAST({L} AS INTEGER) AS levels, query_id, n_hits, recall,
           avg_abs_cos_err
    FROM (
    WITH dims AS (
      SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    stats AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM dims GROUP BY dim),
    dq AS (
      SELECT d.vec_id, d.dim, d.x,
             CASE WHEN s.mx > s.mn
                  THEN s.mn + floor((d.x - s.mn) * {L} / (s.mx - s.mn) + 0.5)
                       * (s.mx - s.mn) / {L}
                  ELSE d.x END AS dqx
      FROM dims d JOIN stats s ON s.dim = d.dim
    ),
    norms AS (
      SELECT vec_id, sqrt(sum(dqx * dqx)) AS qn, sqrt(sum(x * x)) AS en
      FROM dq GROUP BY vec_id
    ),
    dots AS (
      SELECT p.vec_id AS query_id, c.vec_id,
             sum(p.dqx * c.dqx) AS qdot, sum(p.x * c.x) AS edot
      FROM dq p JOIN dq c ON c.dim = p.dim AND c.vec_id != p.vec_id
      WHERE p.vec_id < {NQ}
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT d.query_id, d.vec_id AS neighbor_id,
             round(d.qdot / (na.qn * nb.qn), 4) AS qcos,
             round(d.edot / (na.en * nb.en), 4) AS ecos
      FROM dots d
      JOIN norms na ON na.vec_id = d.query_id
      JOIN norms nb ON nb.vec_id = d.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, qcos, ecos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY qcos DESC, neighbor_id ASC) AS qrk,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY ecos DESC, neighbor_id ASC) AS erk
      FROM scored
    ),
    topq AS (SELECT query_id, neighbor_id FROM ranked WHERE qrk <= {K}),
    tope AS (SELECT query_id, neighbor_id, qcos, ecos FROM ranked
             WHERE erk <= {K}),
    hitc AS (
      SELECT t.query_id, count(*) AS n_hits
      FROM tope t JOIN topq q
        ON q.query_id = t.query_id AND q.neighbor_id = t.neighbor_id
      GROUP BY 1
    ),
    errs AS (
      SELECT query_id,
             round(1e-9 + sum(CAST(round(abs(qcos - ecos) * 10000)
                                   AS BIGINT)) / (count(*) * 10000.0),
                   4) AS avg_abs_cos_err
      FROM tope GROUP BY query_id
    )
    SELECT e.query_id,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / {K}, 4) AS recall,
           e.avg_abs_cos_err
    FROM errs e LEFT JOIN hitc h ON h.query_id = e.query_id
    )
"""


# --- q110: embedding outlier detection — per-label centroid distance
# z-scores, the cheap corpus-hygiene pass that catches mislabeled or
# corrupted vectors before they poison training. Two aggregations over
# the dim-exploded layout (shuffle keys (label, dim) then (vec_id,
# label) — both uniform), then a broadcast of the |labels|-row moment
# table; a vector is an outlier when its distance sits more than
# Z_OUTLIER sample standard deviations above its label's mean. The
# z comparison rounds first (same knife-edge policy as the hyperplane
# signs): both engines compute sums in different orders, and an
# unrounded z exactly at the threshold would flip between them.
Z_OUTLIER = 2.0


def q110_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("v")
    )
    dims = emb.select(
        "vec_id", "label", F.posexplode("v").alias("dim", "x")
    ).localCheckpoint(eager=False)
    cent = dims.groupBy("label", "dim").agg(F.avg("x").alias("c"))
    dist = (
        dims.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(F.sqrt(F.sum((F.col("x") - F.col("c")) ** 2)).alias("d"))
    )
    moments = dist.groupBy("label").agg(
        F.avg("d").alias("mu"), F.stddev_samp("d").alias("sd")
    )
    z = eround((F.col("d") - F.col("mu")) / F.col("sd"), 6)
    return (
        dist.join(F.broadcast(moments), "label")
        .select("label", "d", z.alias("z"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            eround(1e-9 + F.avg("d"), 4).alias("avg_dist"),
            eround(F.max("z"), 4).alias("max_z"),
            F.sum(
                F.when(F.col("z") > Z_OUTLIER, 1).otherwise(0)
            ).alias("n_outliers"),
        )
        .orderBy("label")
    )


_Q110_ORACLE = f"""
    WITH dims AS (
      SELECT vec_id, label, generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    cent AS (SELECT label, dim, avg(x) AS c FROM dims GROUP BY label, dim),
    dist AS (
      SELECT d.vec_id, d.label, sqrt(sum((d.x - c.c) * (d.x - c.c))) AS d
      FROM dims d JOIN cent c ON c.label = d.label AND c.dim = d.dim
      GROUP BY d.vec_id, d.label
    ),
    moments AS (
      SELECT label, avg(d) AS mu, stddev_samp(d) AS sd
      FROM dist GROUP BY label
    ),
    z AS (
      SELECT t.label, t.d, round((t.d - m.mu) / m.sd, 6) AS z
      FROM dist t JOIN moments m ON m.label = t.label
    )
    SELECT label, count(*) AS n_vecs,
           round(1e-9 + avg(d), 4) AS avg_dist,
           round(max(z), 4) AS max_z,
           CAST(sum(CASE WHEN z > {Z_OUTLIER} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM z GROUP BY label ORDER BY label
"""


def centroid_similarity(emb: DataFrame) -> DataFrame:
    """Label-centroid similarity matrix: cosine and L2 distance between
    the mean embedding of every label pair — the dataset-cartography
    audit that flags near-collapsed class pairs (cosine → 1) before a
    contrastive / classification run wastes compute on them.

    Shape at scale: the corpus-sized frame hits exactly ONE hash
    aggregate — (label, dim) running means with map-side combine; the
    centroid table is |labels| x dim rows, so the label x label self-
    join is a broadcast over a frame that CANNOT grow with the corpus.
    Complements q110 (within-label outliers) and q121 (token-level
    source divergence) with the between-label embedding view.
    Reference parity: none (reference has no embedding ops);
    north-star LLM-pipeline extension. ``emb``: (label, v: array<double>).
    """
    dims = emb.select("label", F.posexplode("v").alias("dim", "x"))
    cent = dims.groupBy("label", "dim").agg(F.avg("x").alias("c"))
    a = cent.select(
        F.col("label").alias("label_a"), "dim", F.col("c").alias("ca")
    )
    b = cent.select(
        F.col("label").alias("label_b"), "dim", F.col("c").alias("cb")
    )
    dot = F.sum(F.col("ca") * F.col("cb"))
    na = F.sqrt(F.sum(F.col("ca") * F.col("ca")))
    nb = F.sqrt(F.sum(F.col("cb") * F.col("cb")))
    return (
        a.join(F.broadcast(b), "dim")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            eround(F.lit(1e-9) + dot / (na * nb), 4).alias("cosine"),
            eround(
                F.lit(1e-9)
                + F.sqrt(F.sum((F.col("ca") - F.col("cb")) ** 2)),
                4,
            ).alias("l2_dist"),
        )
        .orderBy("label_a", "label_b")
    )


def q142_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", _as_double("embedding").alias("v")
    )
    return centroid_similarity(emb)


_Q142_ORACLE = """
    WITH dims AS (
      SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    cent AS (SELECT label, dim, avg(x) AS c FROM dims GROUP BY label, dim)
    SELECT a.label AS label_a, b.label AS label_b,
           round(1e-9 + sum(a.c * b.c)
                 / (sqrt(sum(a.c * a.c)) * sqrt(sum(b.c * b.c))), 4)
             AS cosine,
           round(1e-9 + sqrt(sum((a.c - b.c) * (a.c - b.c))), 4) AS l2_dist
    FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
    GROUP BY 1, 2 ORDER BY 1, 2
"""


# --- q56: iterative k-means (3 fixed iterations, deterministic init).
# The FIXED iteration count makes it SQL-expressible after all: the
# oracle below unrolls the three assign→recompute rounds as CTE stages
# (same round-6 tie-break on squared distance, same cid ordering), so
# the driver gets a full hash check instead of rows-only. Each
# iteration: broadcast k centroids, assign by min squared distance,
# recompute means via dim-exploded agg.
K_CLUSTERS = 8
KMEANS_ITERS = 3


def q56_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v")
    )
    dims = emb.select("vec_id", F.posexplode("v").alias("dim", "x")).cache()
    # deterministic init: centroids = vectors 0..k-1
    cent = dims.filter(F.col("vec_id") < K_CLUSTERS).select(
        F.col("vec_id").cast("int").alias("cid"), "dim", F.col("x").alias("c")
    )
    for _ in range(KMEANS_ITERS):
        d2 = (
            dims.join(F.broadcast(cent), "dim")
            .groupBy("vec_id", "cid")
            .agg(F.sum((F.col("x") - F.col("c")) ** 2).alias("d2"))
        )
        wa = Window.partitionBy("vec_id").orderBy(
            eround("d2", 6).asc(), F.asc("cid")
        )
        assign = (
            d2.withColumn("rn", F.row_number().over(wa))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cid")
        )
        cent = (
            dims.join(assign, "vec_id")
            .groupBy("cid", "dim")
            .agg(F.avg("x").alias("c"))
        )
    final = (
        dims.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "cid")
        .agg(F.sum((F.col("x") - F.col("c")) ** 2).alias("d2"))
    )
    wa = Window.partitionBy("vec_id").orderBy(eround("d2", 6).asc(), F.asc("cid"))
    assign = (
        final.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") == 1)
    )
    return (
        assign.groupBy("cid")
        .agg(
            F.count("*").alias("n_vecs"),
            eround(F.sum("d2"), 2).alias("inertia"),
        )
        .orderBy("cid")
    )


def _kmeans_oracle_sql(k: int = K_CLUSTERS, iters: int = KMEANS_ITERS) -> str:
    """Unroll the fixed-iteration k-means as CTE stages — one
    assign→recompute pair per iteration, built from the SAME constants
    the Spark builder uses so the two can never drift. Tie-breaks mirror
    the Spark side exactly: round-6 squared distance, then cid."""
    ctes = [
        f"""dims AS (
          SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
                 CAST(unnest(embedding) AS DOUBLE) AS x
          FROM embeddings
        )""",
        f"""cent0 AS (
          SELECT CAST(vec_id AS INTEGER) AS cid, dim, x AS c
          FROM dims WHERE vec_id < {k}
        )""",
    ]
    for i in range(1, iters + 1):
        ctes.append(f"""d2_{i} AS (
          SELECT m.vec_id, c.cid, sum((m.x - c.c) * (m.x - c.c)) AS d2
          FROM dims m JOIN cent{i - 1} c ON m.dim = c.dim
          GROUP BY m.vec_id, c.cid
        )""")
        ctes.append(f"""a{i} AS (
          SELECT vec_id, cid FROM (
            SELECT vec_id, cid, row_number() OVER (
              PARTITION BY vec_id ORDER BY round(d2, 6) ASC, cid ASC
            ) AS rn FROM d2_{i}
          ) WHERE rn = 1
        )""")
        ctes.append(f"""cent{i} AS (
          SELECT a.cid, m.dim, avg(m.x) AS c
          FROM dims m JOIN a{i} a ON m.vec_id = a.vec_id
          GROUP BY a.cid, m.dim
        )""")
    ctes.append(f"""finald2 AS (
          SELECT m.vec_id, c.cid, sum((m.x - c.c) * (m.x - c.c)) AS d2
          FROM dims m JOIN cent{iters} c ON m.dim = c.dim
          GROUP BY m.vec_id, c.cid
        )""")
    ctes.append("""finala AS (
          SELECT vec_id, cid, d2 FROM (
            SELECT vec_id, cid, d2, row_number() OVER (
              PARTITION BY vec_id ORDER BY round(d2, 6) ASC, cid ASC
            ) AS rn FROM finald2
          ) WHERE rn = 1
        )""")
    return (
        "WITH " + ",\n".join(ctes) + """
        SELECT cid, CAST(count(*) AS BIGINT) AS n_vecs,
               round(sum(d2), 2) AS inertia
        FROM finala GROUP BY cid ORDER BY cid
    """
    )


# --- q130: SemDeDup-style semantic pruning — the ACTION on q54's
# verified embedding near-dup pairs (the embedding analogue of
# q101-over-q46): any vector with a SMALLER-id verified near-dup is
# dropped (deterministic local-minimum keeper rule, same first-wins
# shape as q35/q101), and the report aggregates kept/dropped per
# label. At 100 TB the pair set is the bucket-bounded q54 output and
# the report is one |labels|-key aggregate — nothing new shuffles.
def q130_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("v")
    )
    pairs = cosine_pairs_state(spark, sf_dir)
    dropped = (
        pairs.select(F.col("vec_b").alias("vec_id"))
        .distinct()
        .withColumn("_d", F.lit(True))
    )
    n_dropped = F.sum(F.when(F.col("_d"), 1).otherwise(0))
    return (
        emb.join(dropped, "vec_id", "left")
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            n_dropped.alias("n_dropped"),
            F.sum(F.when(F.col("_d").isNull(), 1).otherwise(0)).alias(
                "n_kept"
            ),
            eround(
                1e-9 + n_dropped / F.count("*").cast("double"), 4
            ).alias("drop_pct"),
        )
        .orderBy("label")
    )


QUERIES = {
    "q50_knn_bruteforce": q50_knn_bruteforce,
    "q130_semantic_prune": q130_semantic_prune,
    "q161_matryoshka_audit": q161_matryoshka_audit,
    "q54_cosine_near_dups": q54_cosine_near_dups,
    "q55_ivf_ann": q55_ivf_ann,
    "q168_ivf_probe_sweep": q168_ivf_probe_sweep,
    "q189_incremental_ivf": q189_incremental_ivf,
    "q191_label_noise": q191_label_noise,
    "q198_embedding_dispersion": q198_embedding_dispersion,
    "q56_kmeans": q56_kmeans,
    "q51_label_centroids": q51_label_centroids,
    "q52_norm_stats": q52_norm_stats,
    "q53_ann_bucket_stats": q53_ann_bucket_stats,
    "q107_quantized_knn": q107_quantized_knn,
    "q110_embedding_outliers": q110_embedding_outliers,
    "q142_centroid_similarity": q142_centroid_similarity,
    "q138_hard_negatives": q138_hard_negatives,
}

_COSINE_SQL = """
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         round(
           list_inner_product(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
           / (sqrt(list_inner_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
            * sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))),
           4) AS cosine
  FROM (SELECT * FROM embeddings WHERE vec_id < {nq}) q
  JOIN embeddings e ON e.vec_id != q.vec_id
"""

# Candidate-generation + verified-pair CTE chain shared by the q54 and
# q130 oracles (identical hyperplane family, banding, and eround'd
# cosine verify as the Spark builders).
_Q54_PAIRS_CTES = f"""
        WITH weights AS (
          SELECT p.range AS p, d.range AS d,
                 CASE WHEN ascii(substr(md5(concat(p.range, ':', d.range)), 32, 1)) % 2 = 0
                      THEN 1.0 ELSE -1.0 END AS w
          FROM range(0, {N_HYPERPLANES}) p, range(0, {EMB_DIM}) d
        ),
        dims AS (
          SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
                 CAST(unnest(embedding) AS DOUBLE) AS x
          FROM embeddings
        ),
        proj AS (
          SELECT m.vec_id, w.p, round(sum(m.x * w.w), 6) AS proj
          FROM dims m JOIN weights w ON m.d = w.d
          GROUP BY m.vec_id, w.p
        ),
        bandsigs AS (
          SELECT vec_id, CAST(p // {N_HYPERPLANES // N_BANDS} AS INTEGER) AS band,
                 CAST(sum(CASE WHEN proj > 0
                               THEN power(2, p % {N_HYPERPLANES // N_BANDS})
                               ELSE 0 END) AS BIGINT) AS sig
          FROM proj GROUP BY vec_id, band
        ),
        cand AS (
          SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
          FROM bandsigs a
          JOIN bandsigs b ON a.band = b.band AND a.sig = b.sig
                         AND a.vec_id < b.vec_id
        ),
        dup_pairs AS (
        SELECT c.vec_a, c.vec_b,
               round(
                 list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
                 / (sqrt(list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                  * sqrt(list_inner_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))),
                 4) AS cosine
        FROM cand c
        JOIN embeddings a ON a.vec_id = c.vec_a
        JOIN embeddings b ON b.vec_id = c.vec_b
        WHERE round(
                 list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
                 / (sqrt(list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                  * sqrt(list_inner_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))),
                 4) >= {COSINE_DUP_THRESHOLD}
        )
"""


ORACLES = {
    "q161_matryoshka_audit": _q161_oracle(),
    "q56_kmeans": _kmeans_oracle_sql(),
    "q110_embedding_outliers": _Q110_ORACLE,
    "q142_centroid_similarity": _Q142_ORACLE,
    "q107_quantized_knn": " UNION ALL ".join(
        _Q107_ORACLE_TEMPLATE.format(L=lv, NQ=N_QUERIES, K=TOP_K)
        for lv in QUANT_LEVELS
    ) + " ORDER BY levels, query_id",
    "q50_knn_bruteforce": f"""
        WITH scored AS ({_COSINE_SQL.format(nq=N_QUERIES)}),
        ranked AS (
          SELECT query_id, neighbor_id, cosine,
                 CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
                 ) AS INTEGER) AS rk
          FROM scored
        )
        SELECT query_id, neighbor_id, cosine, rk
        FROM ranked WHERE rk <= {TOP_K}
        ORDER BY query_id, rk
    """,
    "q138_hard_negatives": f"""
        WITH scored AS (
          SELECT q.vec_id AS query_id, q.label AS anchor_label,
                 e.vec_id AS neighbor_id, e.label AS neighbor_label,
                 round(
                   list_inner_product(CAST(q.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[]))
                   / (sqrt(list_inner_product(CAST(q.embedding AS DOUBLE[]),
                                              CAST(q.embedding AS DOUBLE[])))
                    * sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))),
                   4) AS cosine
          FROM (SELECT * FROM embeddings WHERE vec_id < {N_QUERIES}) q
          JOIN embeddings e ON e.label != q.label
        ),
        ranked AS (
          SELECT query_id, anchor_label, neighbor_id, neighbor_label, cosine,
                 CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
                 ) AS INTEGER) AS rk
          FROM scored
        )
        SELECT query_id, anchor_label, neighbor_id, neighbor_label, cosine, rk
        FROM ranked WHERE rk <= {HARD_NEG_K}
        ORDER BY query_id, rk
    """,
    "q189_incremental_ivf": _q189_oracle(),
    "q191_label_noise": _Q191_ORACLE,
    "q198_embedding_dispersion": _Q198_ORACLE,
    "q168_ivf_probe_sweep": f"""
        WITH dims AS MATERIALIZED (
          SELECT vec_id, label,
                 generate_subscripts(embedding, 1) - 1 AS dim,
                 CAST(unnest(embedding) AS DOUBLE) AS x
          FROM embeddings
        ),
        cent AS (SELECT label, dim, avg(x) AS c FROM dims GROUP BY label, dim),
        cent_norm AS (SELECT label, sqrt(sum(c * c)) AS cnorm FROM cent GROUP BY label),
        qdims AS (SELECT vec_id AS query_id, dim, x AS qx FROM dims WHERE vec_id < {N_QUERIES}),
        qnorm AS (SELECT query_id, sqrt(sum(qx * qx)) AS qnorm FROM qdims GROUP BY query_id),
        dotqc AS (
          SELECT q.query_id, c.label, sum(q.qx * c.c) AS dot
          FROM qdims q JOIN cent c ON q.dim = c.dim
          GROUP BY q.query_id, c.label
        ),
        qc AS (
          SELECT d.query_id, d.label,
                 round(d.dot / (cn.cnorm * qn.qnorm), 6) AS ccos
          FROM dotqc d
          JOIN cent_norm cn ON cn.label = d.label
          JOIN qnorm qn ON qn.query_id = d.query_id
        ),
        prq AS MATERIALIZED (
          SELECT query_id, label,
                 row_number() OVER (
                   PARTITION BY query_id ORDER BY ccos DESC, label ASC
                 ) AS pr
          FROM qc
        ),
        scored AS ({_COSINE_SQL.format(nq=N_QUERIES)}),
        truth AS (
          SELECT query_id, label FROM (
            SELECT s.query_id, e.label,
                   row_number() OVER (
                     PARTITION BY s.query_id
                     ORDER BY s.cosine DESC, s.neighbor_id ASC
                   ) AS rk
            FROM scored s JOIN embeddings e ON e.vec_id = s.neighbor_id
          ) WHERE rk <= {TOP_K}
        ),
        sweep AS (SELECT * FROM (VALUES (1), (2), (3), (5), (10)) t(n_probe)),
        rec AS (
          SELECT n_probe, query_id,
                 sum(CASE WHEN p.pr <= n_probe THEN 1 ELSE 0 END)
                   / CAST({TOP_K} AS DOUBLE) AS r
          FROM truth t
          JOIN prq p USING (query_id, label)
          CROSS JOIN sweep
          GROUP BY n_probe, query_id
        ),
        recall AS (
          SELECT n_probe, round(avg(r), 4) AS avg_recall
          FROM rec GROUP BY n_probe
        ),
        sizes AS (SELECT label, count(*) AS lsz FROM embeddings GROUP BY label),
        ntot AS (SELECT count(*) AS n_all FROM embeddings),
        scq AS (
          SELECT n_probe, query_id,
                 sum(CASE WHEN p.pr <= n_probe THEN lsz ELSE 0 END) AS scanned
          FROM prq p JOIN sizes USING (label) CROSS JOIN sweep
          GROUP BY n_probe, query_id
        ),
        scan AS (
          SELECT n_probe,
                 round(avg(scanned / CAST(n.n_all AS DOUBLE)), 4)
                   AS avg_scan_frac
          FROM scq CROSS JOIN ntot n GROUP BY n_probe
        )
        SELECT CAST(r.n_probe AS INTEGER) AS n_probe, avg_recall,
               avg_scan_frac
        FROM recall r JOIN scan USING (n_probe) ORDER BY n_probe
    """,
    "q55_ivf_ann": f"""
        WITH dims AS (
          SELECT vec_id, label,
                 generate_subscripts(embedding, 1) - 1 AS dim,
                 CAST(unnest(embedding) AS DOUBLE) AS x
          FROM embeddings
        ),
        cent AS (SELECT label, dim, avg(x) AS c FROM dims GROUP BY label, dim),
        cent_norm AS (SELECT label, sqrt(sum(c * c)) AS cnorm FROM cent GROUP BY label),
        qdims AS (SELECT vec_id AS query_id, dim, x AS qx FROM dims WHERE vec_id < {N_QUERIES}),
        qnorm AS (SELECT query_id, sqrt(sum(qx * qx)) AS qnorm FROM qdims GROUP BY query_id),
        dotqc AS (
          SELECT q.query_id, c.label, sum(q.qx * c.c) AS dot
          FROM qdims q JOIN cent c ON q.dim = c.dim
          GROUP BY q.query_id, c.label
        ),
        qc AS (
          SELECT d.query_id, d.label,
                 round(d.dot / (cn.cnorm * qn.qnorm), 6) AS ccos
          FROM dotqc d
          JOIN cent_norm cn ON cn.label = d.label
          JOIN qnorm qn ON qn.query_id = d.query_id
        ),
        probes AS (
          SELECT query_id, label FROM (
            SELECT query_id, label,
                   row_number() OVER (PARTITION BY query_id ORDER BY ccos DESC, label ASC) AS pr
            FROM qc
          ) WHERE pr <= {N_PROBE}
        ),
        cands AS (
          SELECT p.query_id, e.vec_id AS neighbor_id,
                 round(
                   list_inner_product(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
                   / (sqrt(list_inner_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                    * sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))),
                   4) AS cosine
          FROM probes p
          JOIN embeddings e ON e.label = p.label AND e.vec_id != p.query_id
          JOIN embeddings q ON q.vec_id = p.query_id
        )
        SELECT query_id, neighbor_id, cosine, rk FROM (
          SELECT query_id, neighbor_id, cosine,
                 CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
                 ) AS INTEGER) AS rk
          FROM cands
        ) WHERE rk <= {TOP_K}
        ORDER BY query_id, rk
    """,
    # q54 mirrors the Spark funnel exactly: band signatures from the
    # same md5-parity weights, candidates = pairs sharing a band
    # signature, cosine verified on candidates only.
    "q54_cosine_near_dups": f"""
        {_Q54_PAIRS_CTES}
        SELECT vec_a, vec_b, cosine FROM dup_pairs
        ORDER BY vec_a, vec_b
    """,
    "q130_semantic_prune": f"""
        {_Q54_PAIRS_CTES},
        dropped AS (SELECT DISTINCT vec_b AS vec_id FROM dup_pairs)
        SELECT e.label,
               count(*) AS n_vecs,
               CAST(sum(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dropped,
               CAST(sum(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept,
               round(1e-9
                     + sum(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                       / CAST(count(*) AS DOUBLE), 4) AS drop_pct
        FROM embeddings e LEFT JOIN dropped d ON d.vec_id = e.vec_id
        GROUP BY e.label ORDER BY e.label
    """,

    # q53: weights table = planes × dims with md5-parity signs — the
    # same ±1 family the Spark fold derives per element. 64 dims fixed
    # by the embeddings schema (FIXTURES.md §B).
    "q53_ann_bucket_stats": f"""
        WITH weights AS (
          SELECT p.range AS p, d.range AS d,
                 CASE WHEN ascii(substr(md5(concat(p.range, ':', d.range)), 32, 1)) % 2 = 0
                      THEN 1.0 ELSE -1.0 END AS w
          FROM range(0, {N_HYPERPLANES}) p, range(0, 64) d
        ),
        dims AS (
          SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
                 CAST(unnest(embedding) AS DOUBLE) AS x
          FROM embeddings
        ),
        proj AS (
          SELECT m.vec_id, w.p, round(sum(m.x * w.w), 6) AS proj
          FROM dims m JOIN weights w ON m.d = w.d
          GROUP BY m.vec_id, w.p
        ),
        sigs AS (
          SELECT vec_id,
                 CAST(sum(CASE WHEN proj > 0 THEN power(2, p) ELSE 0 END) AS BIGINT) AS bucket
          FROM proj GROUP BY vec_id
        ),
        buckets AS (SELECT bucket, count(*) AS n_vecs FROM sigs GROUP BY bucket)
        SELECT count(*) AS n_buckets,
               max(n_vecs) AS largest_bucket,
               min(n_vecs) AS smallest_bucket
        FROM buckets
    """,
    "q51_label_centroids": """
        WITH x AS (
          SELECT label,
                 generate_subscripts(embedding, 1) - 1 AS dim,
                 CAST(unnest(embedding) AS DOUBLE) AS v
          FROM embeddings
        )
        SELECT label, dim, round(1e-9 + avg(v), 4) AS centroid_val
        FROM x WHERE dim < 8
        GROUP BY label, dim ORDER BY label, dim
    """,
    "q52_norm_stats": """
        WITH n AS (
          SELECT label,
                 sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[]))) AS l2
          FROM embeddings
        )
        SELECT label, count(*) AS n_vecs,
               round(1e-9 + avg(l2), 4) AS avg_norm,
               round(min(l2), 4) AS min_norm,
               round(max(l2), 4) AS max_norm
        FROM n GROUP BY label ORDER BY label
    """,
    # q53's signature IS oracle-expressible (md5 parity weights), but the
    # unnest-reaggregation SQL is enormous; covered instead by unit tests
    # asserting determinism + bucket recall vs the exact baseline.
}
