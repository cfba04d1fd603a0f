"""Dataset-assembly operators (operators/assembly.py): token-budget
sequence packing, domain-mixture balancing, distributed stratified
top-K — behavioral properties + the scale-shape plan guards the oracle
can't see."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from synthetic_data_pipeline_spark.functions.ranking import global_cumsum
from synthetic_data_pipeline_spark.functions.xsql import expand_u16, hash_u16
from synthetic_data_pipeline_spark.operators import assembly
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_global_cumsum_matches_single_window(spark):
    rows = [(i, (i * 37) % 11 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long")
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    naive = {r.id: r.c for r in df.withColumn("c", F.sum("v").over(w)).collect()}
    fast = {
        r.id: r.c
        for r in global_cumsum(df, "v", "id", "id", n_buckets=8, name="c").collect()
    }
    assert naive == fast


def test_shard_layout_invariants(spark):
    """Shards are contiguous doc_id ranges, every shard except possibly
    the last holds ≥ SHARD_TOKENS·? — precisely: a shard's token total
    never exceeds cap + (largest straddling doc), shard ids are dense
    from 0, and doc ranges never overlap."""
    stats = assembly.q112_sequence_packing(spark, SF_DIR).collect()
    assert stats, "no shards produced"
    max_doc_tokens = (
        assembly._doc_tokens(spark, SF_DIR)
        .agg(F.max("n_tokens"))
        .collect()[0][0]
    )
    ids = [r.shard_id for r in stats]
    assert ids == list(range(len(ids)))
    prev_last = -1
    for r in stats:
        assert r.first_doc > prev_last
        prev_last = r.last_doc
        assert r.shard_tokens <= assembly.SHARD_TOKENS + max_doc_tokens
    # total layout covers the whole corpus exactly once
    n_docs = assembly._doc_tokens(spark, SF_DIR).count()
    assert sum(r.n_docs for r in stats) == n_docs


def test_packed_shards_agree_with_plan(spark):
    """q115 packs exactly the documents q112 assigned (same shard ids,
    same doc counts, same token totals)."""
    plan_rows = {
        r.shard_id: (r.n_docs, r.shard_tokens)
        for r in assembly.q112_sequence_packing(spark, SF_DIR).collect()
    }
    pack_rows = {
        r.shard_id: (r.n_docs, r.shard_tokens)
        for r in assembly.q115_packed_shards(spark, SF_DIR).collect()
    }
    assert plan_rows == pack_rows


def test_mixture_balances_to_min_source(spark):
    rows = assembly.q113_domain_mixture(spark, SF_DIR).collect()
    assert rows
    mn = min(r.n_before for r in rows)
    for r in rows:
        assert 0 <= r.n_kept <= r.n_before
        if r.n_before == mn:
            # the smallest source is kept whole (rate == 1)
            assert r.n_kept == mn
        else:
            # binomial(n_before, mn/n_before): allow 6 sigma
            import math

            p = mn / r.n_before
            sigma = math.sqrt(r.n_before * p * (1 - p))
            assert abs(r.n_kept - mn) <= 6 * sigma + 1, (r, mn)


def test_stratified_topk_is_exact(spark):
    """The salted two-stage top-K equals the plain stratum-window
    answer (which is only safe at test scale)."""
    u16 = F.expr(expand_u16(hash_u16("CAST(doc_id AS STRING)", "strat"), "spark"))
    from synthetic_data_pipeline_spark.sources.tables import load_table

    base = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "lang", u16.alias("h")
    )
    w = Window.partitionBy("source", "lang").orderBy("h", "doc_id")
    naive = {
        (r.source, r.lang, r.rk): r.doc_id
        for r in base.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= assembly.STRATA_K)
        .collect()
    }
    fast = {
        (r.source, r.lang, r.rk): r.doc_id
        for r in assembly.q114_stratified_sample(spark, SF_DIR).collect()
    }
    assert naive == fast


def test_q112_no_global_window(spark):
    """The packing cumsum must be the two-phase bucketed form — every
    WindowExec partitioned (by _rb), never a global sort point.

    ADVICE r6: the plan text never contains 'partitionby', so the old
    guard was vacuous. A global window manifests as an
    'Exchange SinglePartition' feeding the WindowExec — assert that
    shape is absent outright (q112 has no other legitimate
    single-partition exchange), and that every window spec carries the
    _rb bucket in its partition list (the spec prints as
    'Window [funcs], [partition exprs], [order exprs]' — a global one
    has only the order list)."""
    p = _plan(assembly.q112_sequence_packing(spark, SF_DIR))
    import re

    assert "Exchange SinglePartition" not in p, p
    n_windows = 0
    for line in p.split("\n"):
        if not re.search(r"\bWindow \[", line):
            continue
        n_windows += 1
        # every windowspecdefinition's partition list leads with _rb:
        # spec prints as windowspecdefinition(<partition...>, <order
        # ASC/DESC...>, specifiedwindowframe(...)) — a global window
        # has no partition expr before the first ordered column
        for spec in re.findall(r"windowspecdefinition\(([^)]*)", line):
            assert spec.lstrip().startswith("_rb"), (
                f"window not partitioned by _rb: {line[:400]}"
            )
    assert n_windows >= 1, p


def test_q114_no_stratum_window(spark):
    """The stratified sample must NOT plan a window over the raw
    strata — the whole point is bounded salt-partial aggregation."""
    p = _plan(assembly.q114_stratified_sample(spark, SF_DIR))
    assert "Window" not in p, p
    assert p.count("HashAggregate") >= 2 or "ObjectHashAggregate" in p, p


def test_q113_mixture_broadcasts_rate_table(spark):
    """The per-source rate table joins broadcast-side; the corpus side
    must never shuffle for the accept filter."""
    p = _plan(assembly.q113_domain_mixture(spark, SF_DIR))
    assert "BroadcastHashJoin" in p, p


def test_curriculum_phases_cover_corpus(spark):
    """Phases are dense 1..K, docs split near-evenly, and phase token
    ranges are non-overlapping ascending (short → long)."""
    rows = assembly.q116_length_curriculum(spark, SF_DIR).collect()
    k = assembly.CURRICULUM_PHASES
    assert [r.phase for r in rows] == list(range(1, k + 1))
    n = sum(r.n_docs for r in rows)
    assert max(r.n_docs for r in rows) - min(r.n_docs for r in rows) <= 1
    assert n == assembly._doc_tokens(spark, SF_DIR).count()
    for a, b in zip(rows, rows[1:]):
        assert a.max_tokens <= b.min_tokens


def test_dds_hist_mergeable(spark):
    """The q200 sketch partial is ADDITIVE: the sketch of the whole
    equals the bucket-wise sum of the halves' sketches — the property
    that makes it mergeable across partitions, batches and streams."""
    from synthetic_data_pipeline_spark.operators import sketches
    from synthetic_data_pipeline_spark.sources.tables import load_table

    orders = load_table(spark, SF_DIR, "orders")
    whole = {
        r.bucket: r.n for r in sketches.dds_hist(orders).collect()
    }
    h1 = sketches.dds_hist(orders.filter("o_orderkey % 2 = 0"))
    h2 = sketches.dds_hist(orders.filter("o_orderkey % 2 = 1"))
    merged: dict = {}
    for r in h1.collect() + h2.collect():
        merged[r.bucket] = merged.get(r.bucket, 0) + r.n
    assert merged == whole and len(whole) > 10


def test_dds_quantile_guarantee_on_planted_data(spark):
    """q200's α relative-error bound vs numpy ground truth on a skewed
    planted distribution (lognormal-ish via squared uniforms), and the
    bucket count stays within the ln(max/min)/α bound."""
    import math

    from synthetic_data_pipeline_spark.operators import sketches

    vals = [((i * 2654435761) % 99991 + 1) ** 2 / 1000.0 for i in range(5000)]
    df = spark.createDataFrame(
        [(v,) for v in vals], "o_totalprice double"
    )
    hist = sorted(
        (r.bucket, r.n) for r in sketches.dds_hist(df).collect()
    )
    g = sketches._DDS_GAMMA
    assert len(hist) <= math.log(max(vals) / min(vals)) / sketches.DDS_ALPHA + 2
    n = len(vals)
    svals = sorted(vals)
    for _, num, den in ((None, 1, 2), (None, 9, 10), (None, 99, 100)):
        k = (n * num + den - 1) // den
        cum = 0
        for b, c in hist:
            if cum + c >= k:
                est = 2 * g**b / (g + 1)
                break
            cum += c
        exact = svals[k - 1]
        assert abs(est / exact - 1) <= sketches.DDS_ALPHA + 1e-9


def test_dds_order_statistics_exact(spark):
    """dds_order_statistics returns the SAME values as a plain sort at
    every requested rank — including duplicate-heavy data, first/last
    rank, and two ranks landing in one bucket — while ranking only the
    picked buckets (q201's exact arm rides this, VERDICT r12 #5)."""
    import pytest

    from pyspark.sql import functions as F
    from synthetic_data_pipeline_spark.operators import sketches

    vals = [1.0, 1.0, 1.0, 2.5, 2.5, 3.0, 40.0, 41.0, 500.0, 500.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    ranks = [1, 2, 3, 5, 6, 9, 10]
    got = sketches.dds_order_statistics(df, "x", ranks)
    want = {k: sorted(vals)[k - 1] for k in ranks}
    assert got == want
    with pytest.raises(ValueError):
        sketches.dds_order_statistics(df, "x", [11])
    # and on a real column: rank k == the k-th smallest via sort
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        F.col("o_totalprice").alias("x")
    )
    n = orders.count()
    ks = [1, n // 2, n]
    got = sketches.dds_order_statistics(orders, "x", ks)
    srt = orders.orderBy("x").collect()
    assert got == {k: srt[k - 1].x for k in ks}


def test_percentile_accuracy_audit_bounds(spark):
    """q201: every (accuracy × quantile) cell must read within_bound
    (the GK rank guarantee), the exact column must equal numpy's
    linear-interpolation percentile, and coarser accuracy must never
    produce MORE cells."""
    import numpy as np

    from synthetic_data_pipeline_spark.operators import relational
    from synthetic_data_pipeline_spark.sources.tables import load_table

    rows = relational.q201_percentile_accuracy(spark, SF_DIR).collect()
    assert len(rows) == len(relational._PCTL_ACCS) * len(relational._PCTL_QS)
    x = np.array(
        [
            r.x
            for r in load_table(spark, SF_DIR, "lineitem")
            .selectExpr("l_extendedprice AS x")
            .collect()
        ]
    )
    want = {
        L: round(1e-9 + float(np.percentile(x, q * 100)), 4)
        for L, q in relational._PCTL_QS
    }
    for r in rows:
        assert r.within_bound, r
        assert abs(r.exact - want[r.quantile]) < 1e-6, (r, want[r.quantile])


def test_cms_estimates_never_undercount(spark):
    """CMS property: min-over-rows estimate ≥ exact count, and the
    top-K set equals the exact top-K by (count desc, token)."""
    from synthetic_data_pipeline_spark.operators import sketches

    rows = sketches.q117_cms_heavy_hitters(spark, SF_DIR).collect()
    assert len(rows) == sketches.CMS_TOPK
    for r in rows:
        assert r.cms_est >= r.exact_n
        assert r.overcount == r.cms_est - r.exact_n
    # descending exact order with token tiebreak
    key = [(-r.exact_n, r.token) for r in rows]
    assert key == sorted(key)


def test_cms_sketch_width_is_fixed(spark):
    """The sketch aggregation must never exceed CMS_ROWS × CMS_WIDTH
    cells — the fixed-memory contract that makes it a sketch."""
    from synthetic_data_pipeline_spark.operators import sketches
    from synthetic_data_pipeline_spark.functions.xsql import expand_u16, hash_u16
    from synthetic_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("token")
    )
    n_cells = (
        toks.select(
            *[
                F.expr(
                    expand_u16(hash_u16("token", f"cms{i}"), "spark")
                ).alias(f"h{i}")
                for i in range(sketches.CMS_ROWS)
            ]
        )
        .selectExpr(
            *[f"h{i} % {sketches.CMS_WIDTH} AS b{i}" for i in range(sketches.CMS_ROWS)]
        )
        .agg(
            *[
                F.countDistinct(f"b{i}").alias(f"d{i}")
                for i in range(sketches.CMS_ROWS)
            ]
        )
        .collect()[0]
    )
    for i in range(sketches.CMS_ROWS):
        assert n_cells[f"d{i}"] <= sketches.CMS_WIDTH


def test_token_shards_exact_cap(spark):
    """q119: every shard except the last holds EXACTLY SHARD_TOKENS
    tokens, ids are dense from 0, and the total equals the corpus
    token count."""
    rows = assembly.q119_token_shards(spark, SF_DIR).collect()
    assert [r.shard_id for r in rows] == list(range(len(rows)))
    for r in rows[:-1]:
        assert r.shard_tokens == assembly.SHARD_TOKENS, r
    assert 0 < rows[-1].shard_tokens <= assembly.SHARD_TOKENS
    total = (
        assembly._doc_tokens(spark, SF_DIR).agg(F.sum("n_tokens")).collect()[0][0]
    )
    assert sum(r.shard_tokens for r in rows) == total
    # a whole doc never counts as split: segments = whole + split parts,
    # and split parts come in ≥2 pieces across adjacent shards
    n_docs = assembly._doc_tokens(spark, SF_DIR).count()
    n_segments = sum(r.n_segments for r in rows)
    n_whole = sum(r.n_whole_docs for r in rows)
    assert n_segments >= n_docs
    assert n_whole <= n_docs
    assert n_segments - n_whole >= 2 * (n_docs - n_whole) / 2


def test_temperature_mixture_softens_skew(spark):
    """τ=0.5 keeps MORE of a majority source than full balancing
    (q113) but still downsamples it: n_kept ≈ sqrt(n_min · n_before),
    between n_min and n_before."""
    import math

    t_rows = {r.source: r for r in
              assembly.q120_temperature_mixture(spark, SF_DIR).collect()}
    b_rows = {r.source: r for r in
              assembly.q113_domain_mixture(spark, SF_DIR).collect()}
    mn = min(r.n_before for r in t_rows.values())
    for s, r in t_rows.items():
        expect = math.sqrt(mn * r.n_before)
        sigma = math.sqrt(r.n_before) / 2 + 1
        assert abs(r.n_kept - expect) <= 6 * sigma, (r, expect)
        if r.n_before > mn * 1.5:
            # strictly between hard balance and no-op (binomial margins)
            assert r.n_kept >= b_rows[s].n_kept
            assert r.n_kept < r.n_before


def test_source_divergence_nonnegative(spark):
    """KL ≥ 0 with equality only if a source matches the corpus
    distribution exactly (Gibbs); values are finite for every source."""
    from synthetic_data_pipeline_spark.operators import textops

    rows = textops.q121_source_divergence(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.kl_vs_corpus is not None
        assert r.kl_vs_corpus >= -1e-6, r
        assert r.n_tokens >= r.distinct_tokens > 0


def test_pipeline_funnel_monotone(spark):
    """q122: stage counts only ever shrink, split counts partition the
    mixture survivors exactly, and token sums follow the same order."""
    rows = {r.stage: r for r in
            assembly.q122_pipeline_funnel(spark, SF_DIR).collect()}
    order = ["a_raw", "b_quality", "c_exact_dedup", "d_near_dedup",
             "e_decontaminated", "f_mixture"]
    for a, b in zip(order, order[1:]):
        assert rows[a].n_docs >= rows[b].n_docs, (a, b)
        assert rows[a].n_tokens >= rows[b].n_tokens, (a, b)
    splits = [rows[f"g_{s}"] for s in ("test", "train", "val") if f"g_{s}" in rows]
    assert sum(s.n_docs for s in splits) == rows["f_mixture"].n_docs
    assert sum(s.n_tokens for s in splits) == rows["f_mixture"].n_tokens
    assert rows["f_mixture"].n_docs > 0


def test_dense_hourly_spine_complete(spark):
    """q123: the hourly spine is gap-free (consecutive hours), counts
    sum to the raw event count, and LOCF never leaves a null after the
    first observed hour."""
    from synthetic_data_pipeline_spark.operators.events import q123_dense_hourly
    from synthetic_data_pipeline_spark.sources.tables import load_table
    import datetime as dt

    rows = q123_dense_hourly(spark, SF_DIR).collect()
    hours = [dt.datetime.strptime(r.hour, "%Y-%m-%d %H:%M:%S") for r in rows]
    for a, b in zip(hours, hours[1:]):
        assert b - a == dt.timedelta(hours=1), (a, b)
    total = load_table(spark, SF_DIR, "events").count()
    assert sum(r.n_events for r in rows) == total
    seen = False
    for r in rows:
        if r.av_locf is not None:
            seen = True
        if seen:
            assert r.av_locf is not None


def test_session_sequences_consistency(spark):
    """q124: sequence counts conserve sessions (sum over ALL sequences
    equals q32's total session count) and the top-K ranking is
    deterministic (count desc, seq asc)."""
    from synthetic_data_pipeline_spark.operators.events import (
        q124_session_sequences,
        q32_user_sessions,
    )

    rows = q124_session_sequences(spark, SF_DIR).collect()
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    key = [(-r.n_sessions, r.seq) for r in rows]
    assert key == sorted(key)
    total_sessions = sum(
        r.n_sessions for r in q32_user_sessions(spark, SF_DIR).collect()
    )
    # top-K covers at most all sessions; every listed sequence nonempty
    assert sum(r.n_sessions for r in rows) <= total_sessions
    for r in rows:
        assert r.seq and r.n_sessions > 0


def test_funnel_apply_batch_admits_new_docs(spark, tmp_path):
    """A genuinely new document (hash absent from the persisted
    keepers) must be admitted as its own keeper — and new in-batch
    duplicates must still dedupe to the min doc_id — instead of being
    silently dropped by a NULL keep_id comparison (round-8 ADVICE)."""
    from pyspark.sql import functions as F

    from synthetic_data_pipeline_spark.operators.assembly import (
        funnel_apply_batch,
        write_funnel_state,
    )
    from synthetic_data_pipeline_spark.sources.tables import load_table

    state = str(tmp_path / "state")
    write_funnel_state(spark, SF_DIR, state)
    rates = spark.read.parquet(f"{state}/rates").collect()
    # a doc from the min-rate source ALWAYS passes the s5 mixture test
    # (u16^2 * mn < 65536^2 * mn for every 16-bit u16), so admission
    # is deterministic regardless of the doc_id hash
    mn_source = min(rates, key=lambda r: r.n_s).source
    words = [f"zq{i}xv" for i in range(40)]  # 40 distinct nonsense toks
    fresh = " ".join(words)
    dup = " ".join(reversed(words))
    docs = load_table(spark, SF_DIR, "documents")
    max_id = docs.agg(F.max("doc_id")).first()[0]
    new_rows = [
        (max_id + 1, fresh, "en", mn_source, len(fresh)),
        (max_id + 2, dup, "en", mn_source, len(dup)),
        (max_id + 3, dup, "en", mn_source, len(dup)),
    ]
    batch = docs.limit(20).unionByName(
        spark.createDataFrame(new_rows, schema=docs.schema)
    )
    out = funnel_apply_batch(spark, state, batch)
    got_new = {
        r.doc_id for r in out.filter(F.col("doc_id") > max_id).collect()
    }
    assert max_id + 1 in got_new          # unique new doc admitted
    assert max_id + 2 in got_new          # first of the new dups kept
    assert max_id + 3 not in got_new      # second new dup deduped away
    # round-9 (round-8 ADVICE): the elected keepers are written back,
    # so the SAME novel content arriving in a LATER micro-batch must
    # dedupe against batch 1's keeper instead of being admitted twice
    batch2 = spark.createDataFrame(
        [
            (max_id + 4, fresh, "en", mn_source, len(fresh)),
            (max_id + 5, dup, "en", mn_source, len(dup)),
        ],
        schema=docs.schema,
    )
    out2 = funnel_apply_batch(spark, state, batch2)
    assert out2.filter(F.col("doc_id") > max_id + 3).count() == 0


def test_funnel_apply_batch_retry_idempotent(spark, tmp_path):
    """The keeper write-back must be retry-safe (foreachBatch replays a
    batch after a crash): applying the SAME batch twice yields the
    identical admitted set — the replay's left_anti finds its own
    hashes already indexed, elects nothing new, and reads back the
    first attempt's keeper rows instead of double-admitting."""
    from pyspark.sql import functions as F

    from synthetic_data_pipeline_spark.operators.assembly import (
        funnel_apply_batch,
        write_funnel_state,
    )
    from synthetic_data_pipeline_spark.sources.tables import load_table

    state = str(tmp_path / "state")
    write_funnel_state(spark, SF_DIR, state)
    docs = load_table(spark, SF_DIR, "documents")
    max_id = docs.agg(F.max("doc_id")).first()[0]
    novel = " ".join(f"rq{i}zz" for i in range(40))
    batch = docs.limit(10).unionByName(
        spark.createDataFrame(
            [(max_id + 1, novel, "en", "web", len(novel))],
            schema=docs.schema,
        )
    )
    first = sorted(map(tuple, funnel_apply_batch(spark, state, batch).collect()))
    replay = sorted(map(tuple, funnel_apply_batch(spark, state, batch).collect()))
    assert replay == first


def test_funnel_apply_batch_single_writer_lock(spark, tmp_path):
    """Two appliers on one state_dir could both elect keepers for the
    same novel hash and double-admit (ADVICE r9) — a held lock file
    must make the second applier fail loudly, and a completed apply
    must release the lock and leave no pending scratch dir behind."""
    import os

    import pytest

    from synthetic_data_pipeline_spark.operators.assembly import (
        funnel_apply_batch,
        write_funnel_state,
    )
    from synthetic_data_pipeline_spark.sources.tables import load_table

    state = str(tmp_path / "state")
    write_funnel_state(spark, SF_DIR, state)
    batch = load_table(spark, SF_DIR, "documents").limit(5)

    lock = os.path.join(state, "_keepers.lock")
    open(lock, "w").close()  # another applier holds the dir
    with pytest.raises(RuntimeError, match="another applier"):
        funnel_apply_batch(spark, state, batch)
    os.unlink(lock)

    funnel_apply_batch(spark, state, batch).count()
    assert not os.path.exists(lock)  # released on completion
    assert not os.path.exists(os.path.join(state, "_keepers_pending"))


def test_waterfill_planted_level(spark):
    """Hand-computable waterfill: counts 10/20/100/100, budget
    ⌊0.5·230⌋ = 115 → 10 and 20 saturate (10+20+2·100 > 115 only
    for the two big sources), level L = (115−30)/2 = 42.5 → the two
    unsaturated sources each get ⌊L⌋ = 42."""
    from synthetic_data_pipeline_spark.operators.assembly import (
        token_budget_waterfill,
    )

    c = spark.createDataFrame(
        [("a", 10), ("b", 20), ("c", 100), ("d", 100)],
        "source string, n long",
    )
    got = {
        r.source: (r.n_tokens, r.allocated_tokens, r.saturated)
        for r in token_budget_waterfill(c).collect()
    }
    assert got == {
        "a": (10, 10, 1),
        "b": (20, 20, 1),
        "c": (100, 42, 0),
        "d": (100, 42, 0),
    }


def test_waterfill_properties_sf(spark, sf_dir):
    """Invariants on real data: saturated sources are taken whole,
    all unsaturated sources share one level allocation strictly below
    their own size, and the total lands within |sources| tokens of
    the budget (floor slack), never above it."""
    from synthetic_data_pipeline_spark.operators.assembly import (
        WF_BUDGET_FRAC,
        q140_token_budget_waterfill,
    )

    rows = q140_token_budget_waterfill(spark, sf_dir).collect()
    total = sum(r.n_tokens for r in rows)
    budget = int(total * WF_BUDGET_FRAC)
    allocated = sum(r.allocated_tokens for r in rows)
    assert allocated <= budget
    assert allocated > budget - len(rows) - 1
    unsat_allocs = set()
    for r in rows:
        if r.saturated:
            assert r.allocated_tokens == r.n_tokens
        else:
            assert r.allocated_tokens < r.n_tokens
            unsat_allocs.add(r.allocated_tokens)
    assert len(unsat_allocs) <= 1


def test_padding_audit_hand_computed(spark, monkeypatch):
    """q150 on a crafted corpus: one source with a 600-token doc (88
    tokens truncated at L=512) and one with four 10-token docs (4x
    packing speedup) — every output column is hand-computable."""
    from synthetic_data_pipeline_spark.operators import assembly
    from synthetic_data_pipeline_spark.sources import tables

    rows = [
        (0, " ".join(["w"] * 600), "t"),
        (1, " ".join(["w"] * 100), "t"),
    ] + [(10 + i, " ".join(["w"] * 10), "s") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    docs.createOrReplaceTempView("_pad_docs")
    monkeypatch.setattr(
        assembly, "load_table",
        lambda sp, sf, name: sp.table("_pad_docs") if name == "documents"
        else tables.load_table(sp, sf, name),
    )
    got = {r.source: r for r in
           assembly.q150_padding_audit(spark, "unused").collect()}
    t = got["t"]
    assert (t.n_docs, t.n_tokens, t.n_truncated) == (2, 700, 1)
    assert abs(t.trunc_token_share - round(88 / 700, 4)) < 1e-3
    # kept = 512 + 100 = 612; padded batch = 2*512
    assert abs(t.pad_waste_share - round(412 / 1024, 4)) < 1e-3
    assert t.packed_seqs == 2 and abs(t.packing_speedup - 1.0) < 1e-3
    s = got["s"]
    assert (s.n_docs, s.n_truncated, s.packed_seqs) == (4, 0, 1)
    assert abs(s.packing_speedup - 4.0) < 1e-3


def test_write_training_shards(spark, sf_dir, tmp_path):
    """The last-mile shard export: the on-disk manifest must equal
    q115's accounting row for row, every written shard's recomputed
    content md5 must match its manifest row, and reading ONE shard
    must prune to that partition directory."""
    import hashlib

    from pyspark.sql import functions as F

    from synthetic_data_pipeline_spark.operators.assembly import (
        q115_packed_shards,
        write_training_shards,
    )

    out = str(tmp_path / "export")
    write_training_shards(spark, sf_dir, out)

    manifest = sorted(
        map(tuple, spark.read.parquet(f"{out}/_manifest")
            .select("shard_id", "n_docs", "shard_tokens", "pack_md5")
            .collect())
    )
    want = sorted(
        map(tuple, q115_packed_shards(spark, sf_dir)
            .select("shard_id", "n_docs", "shard_tokens", "pack_md5")
            .collect())
    )
    assert manifest == want and len(want) > 1

    shards = spark.read.parquet(f"{out}/shards")
    got_md5 = sorted(
        (r.shard_id, hashlib.md5(r.seq.encode()).hexdigest())
        for r in shards.collect()
    )
    assert got_md5 == sorted((s, m) for s, _n, _t, m in want)

    one = shards.filter(F.col("shard_id") == 0)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert one.count() == 1
    assert "PartitionFilters: [isnotnull(shard_id" in plan or \
        "shard_id#" in plan.split("PartitionFilters")[1][:200], plan


def test_incremental_shards_old_immutable(spark, sf_dir, tmp_path):
    """q183's append semantics: the old-side rows must equal q112 run
    over the old corpus ALONE (arrival never re-packs a published
    shard), new docs must start at the next empty shard index
    ceil(old_tokens/cap), and no shard may mix old and new docs."""
    import math

    from pyspark.sql import functions as F

    from synthetic_data_pipeline_spark.operators.assembly import (
        SHARD_TOKENS,
        q112_sequence_packing,
        q183_incremental_shards,
    )
    from synthetic_data_pipeline_spark.operators.dedup import INGEST_MOD
    from synthetic_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    old_dir = str(tmp_path / "old_corpus")
    docs.filter(F.col("doc_id") % INGEST_MOD != 0).write.parquet(
        f"{old_dir}/documents.parquet"
    )

    got = q183_incremental_shards(spark, sf_dir).collect()
    old_rows = sorted(
        (r.shard_id, r.n_docs, r.shard_tokens, r.first_doc, r.last_doc)
        for r in got if r.is_new == 0
    )
    want = sorted(
        (r.shard_id, r.n_docs, r.shard_tokens, r.first_doc, r.last_doc)
        for r in q112_sequence_packing(spark, old_dir).collect()
    )
    assert old_rows == want and len(want) > 0

    old_tokens = sum(r.shard_tokens for r in got if r.is_new == 0)
    base = math.ceil(old_tokens / SHARD_TOKENS)
    new_ids = sorted(r.shard_id for r in got if r.is_new == 1)
    assert new_ids and new_ids[0] == base
    assert max(r.shard_id for r in got if r.is_new == 0) < base


def test_transition_matrix_planted(spark, tmp_path):
    """q185 semantics on crafted events: user 1 emits A->B->B inside
    the gap (transitions A->B and B->B), user 2's A->B pair straddles
    a 31-minute silence and must NOT count, and each from_type's
    probabilities sum to 1."""
    from datetime import datetime, timedelta

    from synthetic_data_pipeline_spark.operators.events import (
        q185_transition_matrix,
    )

    t0 = datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 1, "A", 0.0, "{}"),
        (2, t0 + timedelta(minutes=5), 1, "B", 0.0, "{}"),
        (3, t0 + timedelta(minutes=10), 1, "B", 0.0, "{}"),
        (4, t0, 2, "A", 0.0, "{}"),
        (5, t0 + timedelta(minutes=31), 2, "B", 0.0, "{}"),
    ]
    sf_dir = str(tmp_path / "corpus")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{sf_dir}/events.parquet")

    got = {(r.from_type, r.to_type): r
           for r in q185_transition_matrix(spark, sf_dir).collect()}
    assert set(got) == {("A", "B"), ("B", "B")}
    assert got[("A", "B")].n_transitions == 1  # user 2's pair excluded
    assert got[("B", "B")].n_transitions == 1
    assert abs(got[("A", "B")].p - 1.0) < 1e-9
    assert abs(got[("B", "B")].p - 1.0) < 1e-9


def test_weighted_quantiles_on_planted_corpus(spark):
    """q204's weighted semantics pinned against a brute-force weighted
    order statistic: on a corpus where one LONG doc carries most of the
    token mass, the token-weighted median must land in the long doc's
    length bucket while the doc-count median would not — the exact
    column is the true weighted crossing, and the α bound holds."""
    from synthetic_data_pipeline_spark.operators import sketches

    # 50 short docs (10 tokens) + 1 long doc (2000 tokens): the
    # doc-count median length is 10, but >79% of TOKENS live in the
    # long doc, so every token-weighted quantile >= p50 must be 2000
    rows = [(i, " ".join(f"w{i}x{j}" for j in range(10)), "en", "s")
            for i in range(50)]
    rows.append((99, " ".join(f"long{j}" for j in range(2000)), "en", "s"))
    df = spark.createDataFrame(
        [(i, t, la, so, len(t)) for i, t, la, so in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile

    src = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(f"{src}/documents.parquet")
    out = {
        r.quantile: r
        for r in sketches.q204_weighted_length_quantiles(spark, src).collect()
    }
    assert out["p50"].total_tokens == 50 * 10 + 2000
    for q in ("p50", "p90", "p99"):
        assert out[q].exact == 2000, out[q]
        assert out[q].within_bound
    # brute-force weighted check at p50 on the raw numbers
    masses = sorted([(10, 10)] * 50 + [(2000, 2000)])
    total = sum(w for _, w in masses)
    k = (total + 1) // 2
    cum = 0
    for x, w in masses:
        cum += w
        if cum >= k:
            assert x == out["p50"].exact
            break


def test_weighted_quantiles_random_corpus_vs_bruteforce(spark, tmp_path):
    """q204's exact arm against a pure-Python weighted order statistic
    on a seeded random corpus (120 docs, skewed lengths with heavy
    ties) — guards the whole crossing-logic class, not just the
    ADVICE-r13 same-bucket instance: for every quantile the exact
    value must be the first x whose cumulative token mass reaches
    ceil(q·W) in ascending-length order."""
    import random

    from synthetic_data_pipeline_spark.operators import sketches

    rng = random.Random(20260816)
    lengths = [
        rng.choice([7, 7, 7, 12, 12, 40, 41, 120, 350, 351])
        for _ in range(120)
    ]
    rows = [
        (i, " ".join(f"d{i}w{j}" for j in range(n)), "en", "s")
        for i, n in enumerate(lengths)
    ]
    src = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, t, la, so, len(t)) for i, t, la, so in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{src}/documents.parquet")

    out = {
        r.quantile: r
        for r in sketches.q204_weighted_length_quantiles(spark, src).collect()
    }
    total = sum(lengths)
    assert out["p50"].total_tokens == total
    masses = sorted(lengths)
    for label, num, den in (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)):
        k = (total * num + den - 1) // den
        cum = 0
        for x in masses:
            cum += x
            if cum >= k:
                assert out[label].exact == x, (label, k, x, out[label])
                break
        assert out[label].within_bound


def test_weighted_quantiles_same_bucket_distinct_ranks(spark, tmp_path):
    """ADVICE r13 regression: 100 docs of 100 tokens + 2 of 101 put
    p50/p90/p99 all in log-bucket 231 with DIFFERENT local weighted
    ranks (W=10202 → k=5101/9182/10100; the x=100 cumsum tops out at
    10000, so p50/p90 cross at x=100 and only p99 at x=101). A
    bucket-keyed exact arm kept just the last crossing and reported
    101 for all three; the (bucket, local_k)-keyed arm must not. Also
    pinned 1:1 against the DuckDB oracle, which always joined
    crossings per quantile."""
    import duckdb

    from synthetic_data_pipeline_spark.operators import sketches

    rows = [
        (i, " ".join(f"w{i}t{j}" for j in range(100)), "en", "s")
        for i in range(100)
    ] + [
        (200 + i, " ".join(f"v{i}t{j}" for j in range(101)), "en", "s")
        for i in range(2)
    ]
    src = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, t, la, so, len(t)) for i, t, la, so in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{src}/documents.parquet")

    out = {
        r.quantile: r
        for r in sketches.q204_weighted_length_quantiles(spark, src).collect()
    }
    assert out["p50"].total_tokens == 100 * 100 + 2 * 101
    assert len({out[q].bucket for q in ("p50", "p90", "p99")}) == 1
    assert out["p50"].exact == 100
    assert out["p90"].exact == 100
    assert out["p99"].exact == 101

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{src}/documents.parquet/*.parquet'"
    )
    from synthetic_data_pipeline_spark.operators.sketches import _q204_oracle

    odf = con.execute(_q204_oracle()).df()
    ora = {r["quantile"]: r for _, r in odf.iterrows()}
    for q in ("p50", "p90", "p99"):
        assert int(ora[q]["exact"]) == out[q].exact
        assert abs(float(ora[q]["est"]) - out[q].est) < 1e-9
