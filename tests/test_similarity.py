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


def test_cosine_dup_arrow_matches_fold(spark, sf_dir):
    """The Arrow per-bucket matmul verify (default tier) must produce
    exactly the pairs + rounded cosines of the expression-only fold
    tier — the recall-safety proof for the in-UDF pre-filter margin
    (a dropped knife-edge pair would show up here as a set diff)."""
    from synthetic_data_pipeline_spark.operators.similarity import (
        _as_double,
        cosine_near_dup_pairs,
    )
    from synthetic_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v")
    )
    fast = set(map(tuple, cosine_near_dup_pairs(emb, arrow=True).collect()))
    fold = set(map(tuple, cosine_near_dup_pairs(emb, arrow=False).collect()))
    assert fast == fold
    assert len(fast) > 0  # a vacuous empty-vs-empty pass proves nothing


def test_cosine_dup_prefilter_margin_is_conservative():
    """The Arrow kernel's pre-filter must keep every pair whose raw
    cosine rounds UP to the threshold at scale 4 (threshold - 4e-5
    does) and may drop pairs that round below (threshold - 2e-4 does)
    — the margin guarantee, tested on the kernel directly so LSH
    bucket recall can't mask a dropped knife-edge pair."""
    import math

    import numpy as np
    import pandas as pd

    from synthetic_data_pipeline_spark.operators.similarity import (
        COSINE_DUP_THRESHOLD as T,
        _bucket_cosine_pairs_fn,
    )

    def vec_at_cos(c):  # unit vector at angle acos(c) from e0
        return np.array([c, math.sqrt(1.0 - c * c)] + [0.0] * 62)

    vecs = [
        np.array([1.0] + [0.0] * 63),
        vec_at_cos(T - 4e-5),   # rounds UP to T -> must survive
        vec_at_cos(T - 2e-4),   # rounds below T -> outside the margin
        vec_at_cos(T + 1e-3),   # comfortably above -> must survive
    ]
    pdf = pd.DataFrame(
        {"vec_id": [0, 1, 2, 3], "v": vecs,
         "nrm": [float(np.linalg.norm(v)) for v in vecs]}
    )
    got = {
        (int(r.vec_a), int(r.vec_b))
        for r in _bucket_cosine_pairs_fn(T)(pdf).itertuples()
    }
    assert (0, 1) in got, got
    assert (0, 3) in got, got
    assert (0, 2) not in got, got


def test_cosine_dup_half_boundary_pair_agrees_across_paths(spark):
    """Engineered x.xxxx5 pairs THROUGH both full verify tiers
    (VERDICT r9 Next #5c): raw cosines sitting exactly on the 4-decimal
    rounding half-boundary are where the Arrow BLAS matmul and the
    interpreted expression fold could disagree by summation-order ulps
    and round opposite ways. The eround nudge (+1e-6) must push both
    paths off the knife-edge in the SAME direction — pinned here
    end-to-end (LSH bucketing included), not just on the kernel.

    The planted vectors live in two dimensions chosen so one full band
    of hyperplanes weights them identically — guaranteeing every vector
    shares that band's bucket and the pairs actually reach the verify
    stage in both tiers."""
    import math

    from synthetic_data_pipeline_spark.operators.similarity import (
        COSINE_DUP_THRESHOLD as T,
    )
    from synthetic_data_pipeline_spark.operators.similarity import (
        EMB_DIM,
        N_BANDS,
        N_HYPERPLANES,
        _plane_weights,
        cosine_near_dup_pairs,
    )

    per = N_HYPERPLANES // N_BANDS
    W = [_plane_weights(p) for p in range(N_HYPERPLANES)]
    dims = None
    for j in range(1, EMB_DIM):
        for b in range(N_BANDS):
            if all(W[b * per + p][0] == W[b * per + p][j] for p in range(per)):
                dims = (0, j)
                break
        if dims:
            break
    assert dims, "no co-signed dim pair under any band (plane hash changed?)"
    i, j = dims

    def vec(c):  # unit vector at angle acos(c) from e_i, in span(e_i, e_j)
        v = [0.0] * EMB_DIM
        v[i] = c
        v[j] = math.sqrt(1.0 - c * c)
        return v

    base = [0.0] * EMB_DIM
    base[i] = 1.0
    rows = [
        (1, base),
        (2, vec(T + 5e-5)),   # 0.40005: half-boundary ABOVE T
        (3, vec(T - 5e-5)),   # 0.39995: half-boundary that rounds UP to T
        (4, vec(T - 15e-5)),  # 0.39985: half-boundary that stays below T
    ]
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")
    fast = {
        (r.vec_a, r.vec_b): r.cosine
        for r in cosine_near_dup_pairs(emb, arrow=True).collect()
    }
    fold = {
        (r.vec_a, r.vec_b): r.cosine
        for r in cosine_near_dup_pairs(emb, arrow=False).collect()
    }
    assert fast == fold  # pairs AND rounded values, not just membership
    assert fast[(1, 2)] == 0.4001  # nudge pushes the half-sitter up
    assert fast[(1, 3)] == 0.4     # rounds up INTO the threshold — kept
    assert (1, 4) not in fast      # rounds to 0.3999 — dropped by both


def test_cosine_dup_big_bucket_fallback_matches(spark, sf_dir, monkeypatch):
    """With the oversized-bucket cap forced to 1, EVERY bucket routes
    through the distributed pair-join fallback; the result set must be
    identical to the Arrow-kernel path (round-8 ADVICE: skewed LSH
    buckets must not OOM one executor's pandas group, and the fallback
    must not change answers)."""
    import synthetic_data_pipeline_spark.operators.similarity as sim
    from synthetic_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", sim._as_double("embedding").alias("v")
    )
    normal = set(
        map(tuple, sim.cosine_near_dup_pairs(emb, arrow=True).collect())
    )
    monkeypatch.setattr(sim, "_MAX_ARROW_BUCKET", 1)
    routed = set(
        map(tuple, sim.cosine_near_dup_pairs(emb, arrow=True).collect())
    )
    assert routed == normal
    assert len(normal) > 0


def test_semantic_prune_conserves_and_keeps_minima(spark, sf_dir):
    """q130: per-label kept+dropped == corpus; the dropped set is
    exactly the vectors appearing as the LARGER id of some verified
    near-dup pair (local-minimum keeper rule), so a vector with no
    smaller-id near-dup is always kept."""
    from synthetic_data_pipeline_spark.operators.similarity import (
        _as_double,
        cosine_near_dup_pairs,
        q130_semantic_prune,
    )
    from synthetic_data_pipeline_spark.sources.tables import load_table

    rows = q130_semantic_prune(spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v")
    )
    n_vecs = emb.count()
    assert sum(r.n_vecs for r in rows) == n_vecs
    assert all(r.n_kept + r.n_dropped == r.n_vecs for r in rows)
    pairs = cosine_near_dup_pairs(emb).collect()
    want_dropped = {p.vec_b for p in pairs}
    assert sum(r.n_dropped for r in rows) == len(want_dropped)
    assert len(want_dropped) > 0  # vacuous pruning proves nothing


def test_cosine_boundary_pair_same_on_both_verify_paths(spark, monkeypatch):
    """Round-8 ADVICE lock-down: the Arrow kernel (numpy float64
    matmul) and the oversized-bucket expression-fold fallback differ
    by summation-order ulps, so a pair whose TRUE cosine sits exactly
    on a 4th-decimal .5 rounding boundary is the worst case for
    _MAX_ARROW_BUCKET-dependence. Vectors are engineered from
    orthogonal Hadamard rows so cos(u, v1) = 0.99995 and
    cos(x, y) = 0.87505 EXACTLY (cross-cluster cosines exactly 0);
    the eround nudge (+1e-6, ~1e8 ulps wide) must absorb the ulp-level
    path difference and both routings must return the identical row
    set with identical rounded cosines."""
    import math

    import synthetic_data_pipeline_spark.operators.similarity as sim

    d = 64
    u = [1 / 8.0] * d
    w1 = [(1 if i % 2 == 0 else -1) / 8.0 for i in range(d)]
    w2 = [(1 if (i // 2) % 2 == 0 else -1) / 8.0 for i in range(d)]
    w3 = [(1 if (i // 4) % 2 == 0 else -1) / 8.0 for i in range(d)]

    def mix(a, base, orth):
        b = math.sqrt(1.0 - a * a)
        return [a * p + b * q for p, q in zip(base, orth)]

    rows = [
        (0, u),
        (1, mix(0.99995, u, w1)),   # cos(0,1) = 0.99995 exactly
        (2, w2),
        (3, mix(0.87505, w2, w3)),  # cos(2,3) = 0.87505 exactly
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "v"])

    arrow_rows = sorted(
        map(tuple, sim.cosine_near_dup_pairs(emb, arrow=True).collect())
    )
    monkeypatch.setattr(sim, "_MAX_ARROW_BUCKET", 1)
    fold_rows = sorted(
        map(tuple, sim.cosine_near_dup_pairs(emb, arrow=True).collect())
    )
    assert arrow_rows == fold_rows
    # the knife-edge pair is found and rounds UP (eround pushes true
    # x.xxxx5 boundary-sitters up on every engine and path)
    got = dict(((a, b), c) for a, b, c in arrow_rows)
    assert got.get((0, 1)) == 1.0
    # cross-cluster cosines are exactly 0 — nothing else may appear
    assert set(got) <= {(0, 1), (2, 3)}
    if (2, 3) in got:  # found iff its bucket collides at cos 0.875
        assert got[(2, 3)] == 0.8751


def test_hard_negatives_exclude_same_label(spark):
    """Planted 2-D corpus: anchor (1,0) label A has a SAME-label
    vector at cosine .995 and cross-label vectors at .9139 and 0.
    Hard-negative mining must skip the same-label near-twin and rank
    the cross-label vectors by cosine."""
    from synthetic_data_pipeline_spark.operators.similarity import (
        hard_negative_pairs,
    )

    rows = [
        (0, "A", [1.0, 0.0]),     # anchor
        (1, "A", [0.995, 0.1]),   # same-label near-twin — excluded
        (2, "B", [0.9, 0.4]),     # hard negative, cos ≈ 0.9138
        (3, "B", [0.0, 1.0]),     # easy negative, cos 0
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<float>"
    )
    got = [
        (r.query_id, r.anchor_label, r.neighbor_id, r.neighbor_label,
         r.cosine, r.rk)
        for r in hard_negative_pairs(emb, n_queries=1, k=2).collect()
    ]
    assert got == [
        (0, "A", 2, "B", 0.9138, 1),
        (0, "A", 3, "B", 0.0, 2),
    ]


def test_ivf_probe_sweep_invariants(spark, sf_dir):
    """q168 contract on real data: recall and scan fraction are
    monotone nondecreasing in n_probe, and the exhaustive row
    (n_probe = |labels| = 10) is exact by construction."""
    from synthetic_data_pipeline_spark.operators.similarity import (
        q168_ivf_probe_sweep,
    )

    rows = sorted(
        q168_ivf_probe_sweep(spark, sf_dir).collect(),
        key=lambda r: r.n_probe,
    )
    assert [r.n_probe for r in rows] == [1, 2, 3, 5, 10]
    for a, b in zip(rows, rows[1:]):
        assert a.avg_recall <= b.avg_recall + 1e-9
        assert a.avg_scan_frac <= b.avg_scan_frac + 1e-9
    last = rows[-1]
    assert last.avg_recall == 1.0 and abs(last.avg_scan_frac - 1.0) < 1e-6


def test_ivf_probe_sweep_clustered_corpus(spark, tmp_path):
    """On a corpus with REAL cluster structure (tight, well-separated
    label clusters) one probe must already be near-perfect — the
    signal the sweep exists to surface (the driver corpus's random
    embeddings sit on the recall≈scan diagonal instead)."""
    from synthetic_data_pipeline_spark.operators.similarity import (
        q168_ivf_probe_sweep,
    )

    rows = []
    for vid in range(60):
        lab = vid % 3
        base = [0.0] * 6
        base[lab * 2] = 10.0
        base[lab * 2 + 1] = 5.0
        jitter = [((vid * 7 + d) % 5) * 0.01 for d in range(6)]
        rows.append((vid, lab, [b + j for b, j in zip(base, jitter)]))
    sf_dir = str(tmp_path / "corpus")
    spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    ).write.parquet(f"{sf_dir}/embeddings.parquet")

    got = {r.n_probe: r for r in q168_ivf_probe_sweep(spark, sf_dir).collect()}
    assert got[1].avg_recall == 1.0  # one list already holds every true neighbor
    assert got[1].avg_scan_frac < 0.5


def test_ivf_maintenance_planted_assignment_and_drift(spark):
    """Two well-separated old clusters; a batch vector lands in its
    nearest frozen list, growth counts are exact, the pulled list
    drifts below the recluster threshold while the untouched list
    stays at drift_cos 1.0 / no flag."""
    from synthetic_data_pipeline_spark.operators.similarity import (
        ivf_maintenance_report,
    )

    def vec(x, y):
        return [float(x), float(y)] + [0.0] * 62

    old = spark.createDataFrame(
        [
            (10, 0, vec(1.0, 0.0)),
            (11, 0, vec(1.0, 0.1)),
            (20, 1, vec(0.0, 1.0)),
            (21, 1, vec(0.1, 1.0)),
        ],
        "vec_id long, label int, v array<double>",
    )
    # near cluster 0 in angle but pulls the member mean hard sideways
    batch = spark.createDataFrame(
        [(30, 9, vec(5.0, 3.0))], "vec_id long, label int, v array<double>"
    )
    got = {r.label: r for r in ivf_maintenance_report(old, batch).collect()}
    assert set(got) == {0, 1}
    assert (got[0].n_old, got[0].n_new) == (2, 1)
    assert (got[1].n_old, got[1].n_new) == (2, 0)
    assert abs(got[0].growth - 0.5) < 1e-9 and abs(got[1].growth) < 1e-9
    # eround's boundary nudge (+1e-6) makes an exact 1.0 read 1.000001
    assert abs(got[1].drift_cos - 1.0) < 1e-5 and not got[1].recluster
    assert got[0].drift_cos < 0.96 and got[0].recluster


def test_ivf_index_append_idempotent_and_matches_report(spark, tmp_path):
    """The persisted path: append == the in-memory report; a replayed
    batch_id rewrites its partition (no duplicates); the same vectors
    re-sent under a NEW batch id are anti-joined away."""
    from synthetic_data_pipeline_spark.operators.similarity import (
        ivf_drift_report,
        ivf_index_append,
        ivf_maintenance_report,
        write_ivf_index,
    )

    def vec(x, y):
        return [float(x), float(y)] + [0.0] * 62

    old = spark.createDataFrame(
        [
            (10, 0, vec(1.0, 0.0)),
            (11, 0, vec(1.0, 0.1)),
            (20, 1, vec(0.0, 1.0)),
            (21, 1, vec(0.1, 1.0)),
        ],
        "vec_id long, label int, v array<double>",
    )
    batch = spark.createDataFrame(
        [(30, 9, vec(5.0, 3.0)), (31, 9, vec(0.0, 0.9))],
        "vec_id long, label int, v array<double>",
    )
    path = str(tmp_path / "ivf_index")
    write_ivf_index(old, path)
    ivf_index_append(spark, path, batch, batch_id=0)
    want = sorted(
        map(tuple, ivf_maintenance_report(old, batch).collect())
    )
    got = sorted(map(tuple, ivf_drift_report(spark, path).collect()))
    assert got == want

    # replay: identical partition rewrite, report unchanged
    ivf_index_append(spark, path, batch, batch_id=0)
    assert sorted(map(tuple, ivf_drift_report(spark, path).collect())) == want
    # resend under a new id: anti-join drops the already-indexed vecs
    ivf_index_append(spark, path, batch, batch_id=1)
    assert sorted(map(tuple, ivf_drift_report(spark, path).collect())) == want


def test_label_noise_planted_interloper(spark, monkeypatch):
    """Two tight opposite clusters, correctly labeled — plus one vector
    labeled A sitting INSIDE cluster B: it must be the only suspect
    (all its neighbors disagree), B's members stay clean (one
    disagreeing neighbor out of five), and no cross-cluster candidate
    pollutes the buckets (opposite vectors land in complementary band
    signatures)."""
    from synthetic_data_pipeline_spark.operators import similarity as sim
    from synthetic_data_pipeline_spark.sources import tables

    def vec(sign, eps):
        v = [0.0] * 64
        v[0] = float(sign)
        v[1] = eps
        return v

    rows = []
    for i in range(6):  # cluster A, label 0
        rows.append((10 + i, vec(1.0, 0.01 * (i + 1)), 0))
    for i in range(6):  # cluster B, label 1
        rows.append((20 + i, vec(-1.0, 0.01 * (i + 1)), 1))
    rows.append((99, vec(-1.0, 0.005), 0))  # mislabeled: A inside B
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.createOrReplaceTempView("_noise_emb")
    monkeypatch.setattr(
        sim, "load_table",
        lambda sp, sf, name: sp.table("_noise_emb") if name == "embeddings"
        else tables.load_table(sp, sf, name),
    )
    got = {r.label: r for r in sim.q191_label_noise(spark, "x").collect()}
    # label 0 holds the interloper: exactly one suspect out of 7
    assert got[0].n_vecs == 7 and got[0].n_suspect == 1
    # B's members see at most 1/5 disagreement -> no suspects
    assert got[1].n_vecs == 6 and got[1].n_suspect == 0
    assert got[1].avg_disagree < 0.3


def test_label_noise_arrow_matches_fold(spark, sf_dir):
    """The adopted per-bucket BLAS top-k kernel must reproduce the
    expression-fold tier's q191 table exactly — the keep-margin
    exactness proof exercised end-to-end (LSH bucketing included)."""
    from synthetic_data_pipeline_spark.operators.similarity import (
        q191_label_noise,
    )

    a = sorted(map(tuple, q191_label_noise(spark, sf_dir, arrow=True).collect()))
    b = sorted(map(tuple, q191_label_noise(spark, sf_dir, arrow=False).collect()))
    assert a == b and len(a) > 0


def test_embedding_dispersion_identity_vs_bruteforce(spark, monkeypatch):
    """The two-aggregate identity must equal the brute-force mean
    pairwise squared distance, and a tight cluster must read far
    smaller dispersion than a spread one."""
    import itertools

    from synthetic_data_pipeline_spark.operators import similarity as sim
    from synthetic_data_pipeline_spark.sources import tables

    def vec(x, y):
        return [float(x), float(y)] + [0.0] * 62

    tight = [vec(1.0, 0.001 * i) for i in range(5)]          # label 0
    spread = [vec(i, 5.0 - i) for i in range(5)]             # label 1
    rows = [(i, v, 0) for i, v in enumerate(tight)]
    rows += [(10 + i, v, 1) for i, v in enumerate(spread)]
    rows += [(20, vec(3.0, 4.0), 2)]  # singleton label: no pairs
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.createOrReplaceTempView("_disp_emb")
    monkeypatch.setattr(
        sim, "load_table",
        lambda sp, sf, name: sp.table("_disp_emb") if name == "embeddings"
        else tables.load_table(sp, sf, name),
    )
    got = {r.label: r for r in
           sim.q198_embedding_dispersion(spark, "x").collect()}

    def brute(vs):
        # distinct ordered pairs — self-pairs excluded (they're zero
        # anyway; the denominator n*(n-1) is what excludes them)
        n = len(vs)
        tot = sum(
            sum((a - b) ** 2 for a, b in zip(u, w))
            for u, w in itertools.product(vs, vs)
        )
        return tot / (n * (n - 1))

    assert abs(got[0].dispersion - round(1e-9 + brute(tight), 4)) < 1e-3
    assert abs(got[1].dispersion - round(1e-9 + brute(spread), 4)) < 1e-3
    assert got[0].dispersion < got[1].dispersion / 100
    assert got[2].dispersion is None and got[2].n_vecs == 1
