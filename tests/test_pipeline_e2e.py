"""The full reference pipeline end-to-end through the engine:
generate corpus → render binary formats → write partitioned parquet →
binaryFile-style read-back → extract text → regex validation — the
loop modules/meta_generator → content_generator → postprocessor →
validator perform via files on disk (SURVEY.md §1.3), here as Spark
stages. Asserts the validation golden SURVIVES the binary round trip:
every TP satisfied, no FP flagged, on text recovered from the
renditions rather than the original strings.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from synthetic_data_pipeline_spark.functions.xsql import expand_u16
from synthetic_data_pipeline_spark.operators.generation import (
    _DIALECTS,
    _gen_ctes,
    _rendered_cte,
)
from synthetic_data_pipeline_spark.plans.catalog import SIT_CATALOG
from synthetic_data_pipeline_spark.plans.generate import GenConfig
from synthetic_data_pipeline_spark.sources.io import write_partitioned_parquet
from synthetic_data_pipeline_spark.sources.renditions import (
    add_renditions,
    extract_docx_text,
    extract_eml_text,
    extract_pdf_text,
)


def test_generate_render_extract_validate_loop(spark, tmp_path):
    cfg = GenConfig(per_sit_count=10)  # 40 docs — small but full-shape
    d = _DIALECTS["spark"]
    rendered = spark.sql(
        expand_u16(
            f"WITH {_gen_ctes(cfg, d)}, {_rendered_cte(d)} "
            "SELECT doc_id, format, text FROM rendered",
            "spark",
        )
    )
    with_bins = add_renditions(rendered)
    out = str(tmp_path / "corpus")
    write_partitioned_parquet(
        with_bins, out, partition_cols=["format"], max_records_per_file=50
    )

    back = spark.read.parquet(out)
    assert back.count() == cfg.n_docs

    # recover text from the best-available rendition (the validator's
    # fallback chain, P6): eml → docx → pdf → original text
    rows = back.collect()
    recovered = {}
    for r in rows:
        if r.eml is not None:
            recovered[r.doc_id] = extract_eml_text(bytes(r.eml))
        elif r.docx is not None:
            recovered[r.doc_id] = extract_docx_text(bytes(r.docx))
        elif r.pdf is not None:
            recovered[r.doc_id] = extract_pdf_text(bytes(r.pdf))
        else:
            recovered[r.doc_id] = r.text

    # per (doc, sit) expectations from the generation metadata
    vals = spark.sql(
        expand_u16(
            f"WITH {_gen_ctes(cfg, d)} "
            "SELECT doc_id, sit_id, label, instances FROM vals",
            "spark",
        )
    ).collect()
    # TC SITs carry an empty regex — generated but never scanned, the
    # validator's skip of uncompilable patterns.
    patterns = {sid: re.compile(rx) for sid, _n, rx, _t in SIT_CATALOG if rx}

    def is_ph(v: str) -> bool:
        s = v.strip().lower()
        alnum = re.sub(r"[^a-z0-9]", "", s)
        digits = re.sub(r"[^0-9]", "", s)
        return (
            any(m in s for m in ("xxx", "redacted", "placeholder", "example", "sample"))
            or bool(re.fullmatch(r"[x*\-_]{3,}", s))
            or len(s) <= 2
            or (len(alnum) > 0 and alnum == alnum[0] * len(alnum))
            or (len(digits) > 0 and set(digits) == {"0"})
            or len(alnum) < len(s) * 0.4
        )

    n_tp = n_fp = 0
    for v in vals:
        if v.sit_id not in patterns:
            continue
        text = recovered[v.doc_id]
        real = [m for m in patterns[v.sit_id].findall(text) if not is_ph(m)]
        if v.label == "TP":
            n_tp += 1
            assert len(real) >= v.instances, (
                f"doc {v.doc_id} {v.sit_id}: {len(real)} < {v.instances} "
                "after binary round trip"
            )
        else:
            n_fp += 1
            assert not real, f"doc {v.doc_id} {v.sit_id}: FP flagged after round trip"
    assert n_tp > 30 and n_fp > 30


def test_build_release_end_to_end(spark, sf_dir, tmp_path):
    """The one-call release pipeline: every stage's accounting must
    reconcile with the individually-verified queries it composes, and
    every artifact must land."""
    import json
    import os

    from synthetic_data_pipeline_spark.operators.sketches import (
        q95_dedup_retention,
    )
    from synthetic_data_pipeline_spark.operators.textops import (
        quality_drop_expr,
    )
    from synthetic_data_pipeline_spark.plans.release import build_release
    from synthetic_data_pipeline_spark.sources.tables import load_table

    out = str(tmp_path / "release")
    s = build_release(spark, sf_dir, out)

    docs = load_table(spark, sf_dir, "documents")
    assert s["n_raw_docs"] == docs.count()
    # stage 1 reconciles with q95's retention list
    dropped = {r.doc_id for r in q95_dedup_retention(spark, sf_dir).collect()}
    assert s["n_dedup_dropped"] == len(dropped)
    # stage 2 reconciles with q97's drop flag on the post-dedup frame
    from pyspark.sql import functions as F

    kept1 = docs.filter(~F.col("doc_id").isin(dropped)) if dropped else docs
    n_q = quality_drop_expr(kept1).filter(F.col("qdrop")).count()
    assert s["n_quality_dropped"] == n_q
    # stage 3 holds out the entire benchmark source from the release
    assert s["n_benchmark_held_out"] > 0
    assert (
        s["n_curated_docs"]
        == s["n_raw_docs"] - s["n_dedup_dropped"] - s["n_quality_dropped"]
        - s["n_benchmark_held_out"]
    )
    assert sum(s["split_counts"].values()) == s["n_curated_docs"]
    assert s["n_shards"] >= 1

    # artifacts on disk
    for d in (
        "retention", "bench_grams", "labels", "corpus", "training",
        "manifest", "cards",
    ):
        assert os.path.isdir(os.path.join(out, d)), d
    assert json.load(open(f"{out}/RELEASE.json")) == s
    # the staged corpus is sf_dir-shaped: load_table reads it back
    staged = load_table(spark, out + "/corpus", "documents")
    assert staged.count() == s["n_curated_docs"]
    # manifest rows == curated docs (the q188 diff base)
    assert (
        spark.read.parquet(f"{out}/manifest").count() == s["n_curated_docs"]
    )
    # one card per surviving source
    srcs = {r.source for r in staged.select("source").distinct().collect()}
    assert sorted(os.listdir(f"{out}/cards")) == sorted(
        f"{x}.md" for x in srcs
    )
    # the benchmark source never ships
    from synthetic_data_pipeline_spark.operators.textops import (
        DECON_BENCH_SOURCE,
        distinct_ngrams,
    )

    assert DECON_BENCH_SOURCE not in srcs

    # PUBLISHABILITY GATES (VERDICT r11 #2):
    # (a) zero q105-detectable contamination: no staged doc shares a
    #     word 4-gram with the persisted benchmark gram index
    bench = spark.read.parquet(f"{out}/bench_grams")
    n_contam = (
        distinct_ngrams(staged).join(bench.select("g"), "g").count()
    )
    assert n_contam == 0
    # (b) zero real SIT matches survive: the q93 scrub is idempotent
    #     on the staged text — a second pass changes nothing
    from synthetic_data_pipeline_spark.operators.sitscan import (
        redacted_frame,
    )

    assert (
        redacted_frame(staged).filter(F.col("_red") != F.col("text")).count()
        == 0
    )
    assert s["n_pii_redactions"] >= 0
    # (c) cluster-aware split: no near-dup cluster straddles a split
    #     boundary (vacuously safe post-retention — one member per
    #     cluster survives — but the gkey mechanism keeps it true
    #     under ANY retention policy; mechanism pinned non-vacuously
    #     by test_cluster_aware_split_no_straddling on the full corpus)
    labels = spark.read.parquet(f"{out}/labels")
    straddle = (
        staged.join(labels.withColumnRenamed("node", "doc_id"), "doc_id")
        .groupBy("label")
        .agg(F.count_distinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert straddle == 0
    # boilerplate/decon accounting: a touched doc loses at least one
    # full 4-gram span's worth of tokens
    assert s["n_boilerplate_tokens_removed"] >= 4 * s["n_boilerplate_docs_touched"]
    assert s["n_decon_tokens_removed"] >= 4 * s["n_decon_docs_touched"]
    # q202 is the same funnel as a driver-gated registry row: its
    # single row must equal what build_release just reported
    from synthetic_data_pipeline_spark.operators.sketches import (
        q202_release_accounting,
    )

    acct = q202_release_accounting(spark, sf_dir).collect()[0]
    for k in (
        "n_raw_docs", "n_dedup_dropped", "n_quality_dropped",
        "n_benchmark_held_out", "n_curated_docs",
    ):
        assert getattr(acct, k) == s[k], (k, getattr(acct, k), s[k])


def test_release_reproducible_and_diffable(spark, sf_dir, tmp_path):
    """The versioned-release user story: building the SAME corpus twice
    yields byte-identical accounting, and diffing release N+1's staged
    corpus against release N's persisted manifest (the q188 production
    path) reads all-unchanged. A nondeterminism regression anywhere in
    the pipeline (a rand() slipping into a stage, an unstable keeper
    rule) breaks release reproducibility and fails here."""
    from synthetic_data_pipeline_spark.operators.textops import (
        diff_vs_manifest,
    )
    from synthetic_data_pipeline_spark.plans.release import build_release
    from synthetic_data_pipeline_spark.sources.tables import load_table

    s1 = build_release(spark, sf_dir, str(tmp_path / "v1"))
    s2 = build_release(spark, sf_dir, str(tmp_path / "v2"))
    assert s1 == s2
    staged2 = load_table(spark, str(tmp_path / "v2" / "corpus"), "documents")
    rows = diff_vs_manifest(
        spark, staged2, str(tmp_path / "v1" / "manifest")
    ).collect()
    assert rows and all(
        (r.n_added, r.n_removed, r.n_changed) == (0, 0, 0)
        and r.n_unchanged > 0
        for r in rows
    )


def test_release_gates_on_planted_adversarial_corpus(spark, tmp_path):
    """The publishability gates exercised NON-vacuously: a corpus
    planted with a near-dup pair, a quality failure, live PII and a
    benchmark-contaminated doc must come out of build_release with the
    dup dropped, the junk dropped, the PII redacted to [SIT_*] tokens
    and the contaminated 4-gram stripped — with exact accounting.
    (On the generated testdata the PII gate is vacuous — documents.text
    carries no real SIT matches — so this is the test that would catch
    a broken redaction stage.)"""
    import json

    from synthetic_data_pipeline_spark.plans.release import build_release
    from synthetic_data_pipeline_spark.sources.tables import load_table

    def words(seed: str, n: int) -> str:
        return " ".join(f"{seed}{i}tok" for i in range(n))

    gram = "zebra quantum lattice harbor"
    rows = [
        # benchmark source (src0): held out, defines the decon grams
        (0, f"{words('bench', 26)} {gram}", "en", "src0"),
        (1, words("suite", 30), "en", "src0"),
        # near-dup pair ACROSS sources (within-source would also trip
        # the boilerplate df>=2 threshold — deliberately avoided here)
        (2, words("story", 30) + " ending one", "en", "src1"),
        (3, words("story", 30) + " ending two", "en", "src2"),
        # quality failure: 30 tokens, 1 distinct -> low_diversity
        (4, " ".join(["aa"] * 30), "en", "src1"),
        # live PII that must not ship
        (5, f"{words('memo', 26)} ssn 523-45-6789 mail bob.kay@nordwind-mail.net", "en", "src2"),
        # benchmark-contaminated train doc
        (6, f"{words('news', 26)} {gram} {words('tail', 3)}", "en", "src1"),
        # clean background
        (7, words("alpha", 30), "en", "src1"),
        (8, words("beta", 30), "en", "src2"),
    ]
    df = spark.createDataFrame(
        [(i, t, la, so, len(t)) for i, t, la, so in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    src = str(tmp_path / "corpus_in")
    df.repartition(2).write.parquet(f"{src}/documents.parquet")

    out = str(tmp_path / "release")
    s = build_release(spark, src, out)

    assert s["n_raw_docs"] == 9
    assert s["n_dedup_dropped"] == 1       # doc 3 (keeper = min id 2)
    assert s["n_quality_dropped"] == 1     # doc 4
    assert s["n_benchmark_held_out"] == 2  # docs 0-1
    assert s["n_curated_docs"] == 5        # docs 2, 5, 6, 7, 8
    assert s["n_decon_docs_touched"] >= 1
    assert s["n_pii_redactions"] >= 2      # the SSN + the email

    staged = {
        r.doc_id: r.text
        for r in load_table(spark, out + "/corpus", "documents").collect()
    }
    assert set(staged) == {2, 5, 6, 7, 8}
    # PII redacted to catalog tokens, raw values gone
    assert "[SIT_SSN]" in staged[5] and "[SIT_EMAIL]" in staged[5]
    assert "523-45-6789" not in staged[5]
    assert "nordwind-mail.net" not in staged[5]
    # the contaminated 4-gram is stripped from the shipped text
    assert gram not in staged[6] and "news0tok" in staged[6]
    # accounting on disk matches the return value
    assert json.load(open(f"{out}/RELEASE.json")) == s
