"""Text-analysis operators over the ``documents`` table (north-star
extensions: BASELINE.json's LLM-data-pipeline requirements).

All operators are pure column expressions (no Python UDFs — SURVEY.md
§2.9 policy): tokenization via regexp split, counts via higher-order
array functions, n-grams via window ``lead`` over exploded tokens.
Everything stays inside whole-stage codegen; the only shuffles are the
final small-key aggregations (and posexplode fan-out for n-grams, which
is a narrow op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import eround
from ..sources.tables import load_table

# Marker stopwords per language for the heuristic language-ID operator.
# Deterministic n-gram/stopword heuristic (north star "language-ID");
# ties broken by fixed language order.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of"],
    "es": ["el", "la", "los"],
    "de": ["der", "die", "das"],
    "fr": ["le", "la", "les"],
    "zh": ["的", "了", "是"],
}


def _tokens(col):
    """Whitespace tokens of a trimmed, lowercased text column."""
    return F.split(F.lower(F.trim(col)), r"\s+")


def _bigram_array(arr_col: str = "arr"):
    """Positional (non-distinct) word bigrams of a token-array column —
    shared by the repetition signals (q106) and the LM perplexity proxy
    (q109); mirrors DuckDB's list_transform(range(1, len(arr)), ...)."""
    return F.when(
        F.size(arr_col) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(arr_col) - 1),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col(arr_col), i.cast("int")),
                F.element_at(F.col(arr_col), (i + 1).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


# --- q40: token counting (north star "token counting").
def q40_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    return (
        docs.select("lang", F.size(toks).alias("n_tokens"), "n_chars")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            eround(1e-9 + F.avg("n_tokens"), 4).alias("avg_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            eround(1e-9 + F.avg(F.col("n_chars") / F.col("n_tokens")), 4).alias(
                "avg_chars_per_token"
            ),
        )
        .orderBy("lang")
    )


# --- q41: heuristic language ID via marker-word occurrence counts.
# Occurrences counted with the replace-length trick — identical
# semantics in Spark and DuckDB (both replace all occurrences).
def _marker_hits(lang: str):
    s = F.concat(F.lit(" "), F.lower(F.trim(F.col("text"))), F.lit(" "))
    total = F.lit(0)
    for m in _LANG_MARKERS[lang]:
        needle = f" {m} "
        cnt = (F.length(s) - F.length(F.replace(s, F.lit(needle), F.lit("")))) / len(
            needle
        )
        total = total + cnt
    return total.cast("long")


def q41_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        *[_marker_hits(lg).alias(f"hits_{lg}") for lg in _LANG_MARKERS],
    )
    # argmax with deterministic tie-break = fixed language order
    pred = F.lit("unknown")
    best = F.lit(-1).cast("long")
    for lg in _LANG_MARKERS:  # first language wins ties (strict >)
        hits = F.col(f"hits_{lg}")
        pred = F.when(hits > best, F.lit(lg)).otherwise(pred)
        best = F.when(hits > best, hits).otherwise(best)
    return (
        scored.withColumn("predicted", pred)
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "predicted")
    )


# --- q42: quality scoring (north star "quality scoring"): token count,
# distinct-token ratio, mean token length — aggregated per source.
def q42_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    nospace_len = F.length(F.replace(F.lower(F.trim(F.col("text"))), F.lit(" "), F.lit("")))
    per_doc = docs.select(
        "source",
        n_tokens.alias("n_tokens"),
        (n_distinct.cast("double") / n_tokens).alias("distinct_ratio"),
        (nospace_len.cast("double") / n_tokens).alias("avg_token_len"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            eround(1e-9 + F.avg("n_tokens"), 4).alias("avg_tokens"),
            eround(1e-9 + F.avg("distinct_ratio"), 4).alias("avg_distinct_ratio"),
            eround(1e-9 + F.avg("avg_token_len"), 4).alias("avg_token_len"),
        )
        .orderBy("source")
    )


# --- q43: document fingerprinting (north star): md5 over normalized
# text; dup-group stats. At 100TB this is the cheap first dedup pass —
# hash on the map side, one shuffle on the 128-bit key.
def q43_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), F.lit(r"\s+"), F.lit(" "))
    return (
        docs.select(F.md5(norm).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"))
        .agg(
            F.count("*").alias("n_distinct_fingerprints"),
            F.sum(F.when(F.col("n_docs") > 1, F.col("n_docs")).otherwise(0)).alias(
                "n_docs_in_dup_groups"
            ),
            F.max("n_docs").alias("largest_group"),
        )
    )


# --- q44: word-trigram extraction via lead() over exploded tokens —
# the UDTF-shaped "one row → many" mapping done with posexplode + window
# (SURVEY §2.9). Returns per-language distinct-trigram stats.
def q44_trigram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.posexplode(_tokens(F.col("text"))).alias("pos", "token")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    tri = toks.select(
        "doc_id",
        "lang",
        F.concat_ws(
            " ", "token", F.lead("token", 1).over(w), F.lead("token", 2).over(w)
        ).alias("trigram"),
        F.lead("token", 2).over(w).alias("t2"),
    ).filter(F.col("t2").isNotNull())
    return (
        tri.groupBy("lang")
        .agg(
            F.count("*").alias("n_trigrams"),
            F.countDistinct("trigram").alias("n_distinct_trigrams"),
        )
        .orderBy("lang")
    )


# BPE-ish tokenizer pattern (GPT-2 shape, engine-portable: no
# lookaround): contractions, space-prefixed letter runs, digit runs,
# punctuation runs. Token COUNTING only — no merges table (north star
# "token counting (whitespace + a BPE-ish regex)").
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9']+"


# --- q49: BPE-ish token counts vs whitespace counts.
def q49_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bpe = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(BPE_PATTERN), 0)
    )
    ws = F.size(_tokens(F.col("text")))
    return (
        docs.select("lang", bpe.alias("bpe_tokens"), ws.alias("ws_tokens"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("bpe_tokens").alias("total_bpe_tokens"),
            eround(1e-9 + F.avg("bpe_tokens"), 4).alias("avg_bpe_tokens"),
            eround(
                1e-9 + F.avg(F.col("bpe_tokens") / F.col("ws_tokens")), 4
            ).alias("avg_bpe_per_word"),
        )
        .orderBy("lang")
    )


# --- q66: winnowing document fingerprints (rolling-hash selection —
# the standard local-fingerprint scheme): hash every positional 3-gram,
# take the min hash of each sliding window of 4 consecutive positions,
# count the distinct selected fingerprints per doc. Window frame =
# ROWS BETWEEN CURRENT AND 3 FOLLOWING, partitioned per doc.
def q66_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.posexplode(_tokens(F.col("text"))).alias("pos", "token")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    tri = toks.select(
        "doc_id",
        "lang",
        "pos",
        F.md5(
            F.concat_ws(
                " ", "token", F.lead("token", 1).over(w), F.lead("token", 2).over(w)
            )
        ).alias("h"),
        F.lead("token", 2).over(w).alias("t2"),
    ).filter(F.col("t2").isNotNull())
    wf = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    selected = tri.select(
        "doc_id", "lang", F.min("h").over(wf).alias("fp")
    )
    per_doc = selected.groupBy("doc_id", "lang").agg(
        F.countDistinct("fp").alias("n_fps")
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_fps").alias("total_fps"),
            eround(1e-9 + F.avg("n_fps"), 4).alias("avg_fps"),
        )
        .orderBy("lang")
    )


# --- q67: TF-IDF top terms (SURVEY §7 M5 "tokenize/ngram/TF-IDF").
# tf = term count / doc length; idf = ln(N / df). Top-3 terms per doc
# for a bounded doc slice, ranked deterministically. Two shuffles:
# (doc, term) counts and the tiny df table (broadcast back).
def q67_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # corpus size as a broadcast scalar IN the DAG (one job, no separate
    # count() action — a second action re-reads the scan at 100 TB)
    n_df = docs.agg(F.count("*").cast("double").alias("_n_docs"))
    toks = docs.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("cnt"))
    doc_len = toks.groupBy("doc_id").agg(F.count("*").alias("len"))
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    scored = (
        tf.join(doc_len, "doc_id")
        .join(F.broadcast(df_), "token")
        .crossJoin(F.broadcast(n_df))
        .filter(F.col("doc_id") < 20)
        .select(
            "doc_id",
            "token",
            eround(
                (F.col("cnt") / F.col("len"))
                * F.log(F.col("_n_docs") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .orderBy("doc_id", "rk")
    )


# --- q94: sliding token-window chunking — the training-data prep step
# that turns documents into fixed-size overlapping model inputs.
_CHUNK, _STRIDE = 64, 48  # 16-token overlap


def q94_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into 64-token windows with stride 48
    (16-token overlap), emitting per-chunk size + content hash. Scale
    shape: ONE scan → narrow split → explode (~len/stride per doc) →
    no shuffle except the output sort; windows never cross documents so
    the operator is embarrassingly partition-parallel."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split("text", " ")
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(_STRIDE)
    )
    chunked = docs.select(
        "doc_id", toks.alias("toks"), F.explode(starts).alias("start")
    )
    chunk = F.slice("toks", F.col("start") + 1, _CHUNK)
    return chunked.select(
        "doc_id",
        (F.col("start") / _STRIDE).cast("long").alias("chunk_id"),
        F.size(chunk).alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk).cast("binary")).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_id")


# --- q97: quality-filter action — per-doc keep/drop decisions from the
# q42 signals, first failing rule wins (the filter pass of a
# training-data pipeline; q42 reports the signals, this APPLIES them).
# Thresholds compare per-row double divisions, which are bit-identical
# across engines (single IEEE op on the same ints — no summation-order
# knife edge).
QF_MIN_TOKENS = 25  # shared with q192's stage-overlap accounting
QF_MIN_DISTINCT = 0.32


def quality_drop_expr(docs: DataFrame) -> DataFrame:
    """(doc_id, source, qdrop) — q97's drop decision as a flag frame,
    shared by q192's stage-overlap audit so the two can't drift."""
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks)
    dr = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    return docs.select(
        "doc_id",
        "source",
        ((n_tokens < QF_MIN_TOKENS) | (dr < QF_MIN_DISTINCT)).alias("qdrop"),
    )


def q97_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks)
    dr = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    per_doc = docs.select("doc_id", n_tokens.alias("n_tokens"), dr.alias("dr"))
    reason = (
        F.when(F.col("n_tokens") < QF_MIN_TOKENS, "too_short")
        .when(F.col("dr") < QF_MIN_DISTINCT, "low_diversity")
    )
    return (
        per_doc.select("doc_id", reason.alias("reason"))
        .filter(F.col("reason").isNotNull())
        .orderBy("doc_id")
    )


_Q97_ORACLE = """
    WITH t AS (
      SELECT doc_id,
             len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tokens,
             CAST(len(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS DOUBLE)
               / len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS dr
      FROM documents
    )
    SELECT doc_id,
           (CASE WHEN n_tokens < 25 THEN 'too_short'
                 WHEN dr < 0.32 THEN 'low_diversity' END) AS reason
    FROM t
    WHERE n_tokens < 25 OR dr < 0.32
    ORDER BY doc_id
"""


# --- q96: deterministic train/val/test split — hash-of-key bucketing,
# the reproducible alternative to random sampling for dataset assembly.
def q96_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 split assigned by counter-mode md5 over doc_id — stable
    under any partitioning, re-runs, engine, or data order (a random()
    split is none of these). Emits per-(split, lang) counts so the gate
    verifies the whole assignment, not just the ratios. Scale: narrow
    map + one small-key aggregation."""
    from ..functions.xsql import expand_u16, hash_u16

    bucket = expand_u16(hash_u16("CAST(doc_id AS STRING)", "split"), "spark")
    docs = load_table(spark, sf_dir, "documents")
    split = (
        f"(CASE WHEN {bucket} % 10 < 8 THEN 'train' "
        f"WHEN {bucket} % 10 = 8 THEN 'val' ELSE 'test' END)"
    )
    return (
        docs.selectExpr(f"{split} AS split", "lang")
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("split", "lang")
    )


def _q96_oracle() -> str:
    from ..functions.xsql import expand_u16, hash_u16

    bucket = expand_u16(hash_u16("CAST(doc_id AS STRING)", "split"), "duckdb")
    return f"""
        SELECT (CASE WHEN {bucket} % 10 < 8 THEN 'train'
                     WHEN {bucket} % 10 = 8 THEN 'val' ELSE 'test' END) AS split,
               lang, count(*) AS n_docs
        FROM documents GROUP BY 1, 2 ORDER BY split, lang
    """


# --- q102: the full training-data prep chain in ONE lineage — apply
# the q97 quality rules, drop exact duplicates keeping the min doc_id
# (q45's normalization), assign the deterministic q96 split, report
# per-split stats. The composition stays two shuffles total regardless
# of corpus size (dedup window on md5(norm) + the |splits|-key agg);
# everything else is narrow maps, so it scales exactly like its parts.
def q102_training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.xsql import expand_u16, hash_u16

    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks)
    dr = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    kept = docs.select("doc_id", "lang", "n_chars", "text",
                       n_tokens.alias("n_tokens"), dr.alias("dr")).filter(
        ~((F.col("n_tokens") < 25) | (F.col("dr") < 0.32))
    )
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    w = Window.partitionBy(F.md5(norm)).orderBy("doc_id")
    uniq = (
        kept.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    bucket = expand_u16(hash_u16("CAST(doc_id AS STRING)", "split"), "spark")
    split = (
        f"(CASE WHEN {bucket} % 10 < 8 THEN 'train' "
        f"WHEN {bucket} % 10 = 8 THEN 'val' ELSE 'test' END)"
    )
    return (
        uniq.selectExpr(f"{split} AS split", "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            eround(1e-9 + F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("split")
    )


def _q102_oracle() -> str:
    from ..functions.xsql import expand_u16, hash_u16

    bucket = expand_u16(hash_u16("CAST(doc_id AS STRING)", "split"), "duckdb")
    return f"""
        WITH sig AS (
          SELECT doc_id, lang, n_chars,
                 md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS h,
                 len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tokens,
                 CAST(len(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS DOUBLE)
                   / len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS dr
          FROM documents
        ),
        kept AS (
          SELECT * FROM sig WHERE NOT (n_tokens < 25 OR dr < 0.32)
        ),
        uniq AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
            FROM kept
          ) WHERE rn = 1
        )
        SELECT (CASE WHEN {bucket} % 10 < 8 THEN 'train'
                     WHEN {bucket} % 10 = 8 THEN 'val' ELSE 'test' END) AS split,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               round(1e-9 + avg(n_chars), 4) AS avg_chars
        FROM uniq GROUP BY 1 ORDER BY split
    """


# --- q105: benchmark decontamination — the eval-set overlap check every
# training-data pipeline runs before release. One source ('src0') plays
# the held-out benchmark; a training doc is CONTAMINATED if it shares
# any word n-gram with any benchmark doc (the standard 13-gram rule,
# run here at n=4 because the synthetic docs are ~100 tokens over a
# 31-word vocabulary — at 13 the overlap signal vanishes; the constant
# is the only knob). Scale shape: the benchmark gram set is tiny
# relative to the corpus by construction, so it BROADCASTS; the train
# side is one scan → narrow distinct-gram explode → broadcast hash join
# → two small per-source aggs. No shuffle ever carries document text.
DECON_N = 4
DECON_BENCH_SOURCE = "src0"


def distinct_ngrams(docs: DataFrame, n: int = DECON_N) -> DataFrame:
    """(doc_id, source, g) — distinct word n-grams per document; the
    gram table shared by the contamination report (q105) and the
    pipeline funnel's decontamination stage (q122). Fans the scan out
    first (tables.fan_out_scan): the n-gram explode is per-row CPU
    that an under-partitioned input serializes — no-op at real scale."""
    from ..sources.tables import fan_out_scan

    docs = fan_out_scan(docs.sparkSession, docs)
    arr = _tokens(F.col("text"))
    grams_arr = F.when(
        F.size("arr") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("arr") - (n - 1)),
            lambda i: F.concat_ws(
                " ",
                *[
                    F.element_at(F.col("arr"), (i + j).cast("int"))
                    for j in range(n)
                ],
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select("doc_id", "source", arr.alias("arr")).select(
        "doc_id", "source", F.explode(F.array_distinct(grams_arr)).alias("g")
    )


def decontaminate_by_source(
    docs: DataFrame, n: int = DECON_N, bench_source: str = DECON_BENCH_SOURCE
) -> DataFrame:
    """Per-source contamination report for a (doc_id, source, text)
    frame; ``bench_source`` plays the held-out benchmark."""
    grams = distinct_ngrams(docs, n)
    bench = (
        grams.filter(F.col("source") == bench_source)
        .select("g")
        .distinct()
    )
    hits = (
        grams.filter(F.col("source") != bench_source)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id", "source")
        .agg(F.count("*").alias("n_hit_grams"))
    )
    per_src = (
        docs.filter(F.col("source") != bench_source)
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"))
    )
    cont = hits.groupBy("source").agg(
        F.count("*").alias("n_contaminated"),
        F.sum("n_hit_grams").alias("n_shared_grams"),
    )
    return (
        per_src.join(cont, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            F.coalesce("n_shared_grams", F.lit(0)).alias("n_shared_grams"),
            eround(
                F.coalesce("n_contaminated", F.lit(0)).cast("double")
                / F.col("n_docs"),
                4,
            ).alias("contamination_rate"),
        )
        .orderBy("source")
    )


def q105_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decontaminate_by_source(load_table(spark, sf_dir, "documents"))


_Q105_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, source,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
      FROM documents
    ),
    grams AS (
      SELECT doc_id, source,
             unnest(list_distinct(list_transform(
               range(1, len(arr) - {DECON_N - 2}),
               i -> concat_ws(' ', {", ".join(f"arr[i+{j}]" if j else "arr[i]" for j in range(DECON_N))})
             ))) AS g
      FROM toks WHERE len(arr) >= {DECON_N}
    ),
    bench AS (
      SELECT DISTINCT g FROM grams WHERE source = '{DECON_BENCH_SOURCE}'
    ),
    hits AS (
      SELECT gr.doc_id, gr.source, count(*) AS n_hit_grams
      FROM grams gr JOIN bench USING (g)
      WHERE gr.source != '{DECON_BENCH_SOURCE}'
      GROUP BY 1, 2
    ),
    per_src AS (
      SELECT source, count(*) AS n_docs FROM documents
      WHERE source != '{DECON_BENCH_SOURCE}' GROUP BY 1
    ),
    cont AS (
      SELECT source, count(*) AS n_contaminated,
             sum(n_hit_grams) AS n_shared
      FROM hits GROUP BY 1
    )
    SELECT p.source, p.n_docs,
           CAST(coalesce(c.n_contaminated, 0) AS BIGINT) AS n_contaminated,
           CAST(coalesce(c.n_shared, 0) AS BIGINT) AS n_shared_grams,
           round(CAST(coalesce(c.n_contaminated, 0) AS DOUBLE) / p.n_docs, 4)
             AS contamination_rate
    FROM per_src p LEFT JOIN cont c USING (source)
    ORDER BY source
"""


# --- q106: repetition signals (Gopher-style quality rules): per-doc
# type-token ratio, most-frequent-token fraction, and the token mass
# covered by the most frequent bigram — the three cheap detectors for
# degenerate/looping text. Thresholds (top-token fraction ≥ 0.15,
# TTR ≤ 0.35) sit at ~p93 of the corpus so the flag is a real split.
# Scale shape: narrow per-doc expressions + two (doc_id, gram) counting
# shuffles whose keys are uniform (doc_id ⊂ key), then a |sources|-key
# agg — no skew, no text in any shuffle except the short gram strings.
REP_TOP_TOK_FRAC = 0.15
REP_TTR_MIN = 0.35


def repetition_doc_signals(docs: DataFrame) -> DataFrame:
    """(doc_id, source, ttr, top_tok_frac, top_bigram_frac) per doc."""
    toks = _tokens(F.col("text"))
    base = docs.select(
        "doc_id",
        "source",
        toks.alias("arr"),
        F.size(toks).alias("n_tokens"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "ttr"
        ),
    )
    tokc = (
        base.select("doc_id", F.explode("arr").alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").alias("c"))
    )
    top_tok = tokc.groupBy("doc_id").agg(F.max("c").alias("top_tok"))
    bgc = (
        base.select("doc_id", F.explode(_bigram_array()).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
    )
    top_bg = bgc.groupBy("doc_id").agg(F.max("c").alias("top_bg"))
    return (
        base.select("doc_id", "source", "n_tokens", "ttr")
        .join(top_tok, "doc_id")
        .join(top_bg, "doc_id")
        .select(
            "doc_id",
            "source",
            "ttr",
            (F.col("top_tok").cast("double") / F.col("n_tokens")).alias(
                "top_tok_frac"
            ),
            (F.col("top_bg") * F.lit(2.0) / F.col("n_tokens")).alias(
                "top_bigram_frac"
            ),
        )
    )


def q106_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_doc = repetition_doc_signals(load_table(spark, sf_dir, "documents"))
    flagged = (F.col("top_tok_frac") >= REP_TOP_TOK_FRAC) | (
        F.col("ttr") <= REP_TTR_MIN
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            eround(1e-9 + F.avg("ttr"), 4).alias("avg_ttr"),
            eround(1e-9 + F.avg("top_tok_frac"), 4).alias("avg_top_tok_frac"),
            eround(1e-9 + F.avg("top_bigram_frac"), 4).alias(
                "avg_top_bigram_frac"
            ),
            F.sum(F.when(flagged, 1).otherwise(0)).alias("n_flagged"),
        )
        .orderBy("source")
    )


_Q106_ORACLE = f"""
    WITH base AS (
      SELECT doc_id, source,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
      FROM documents
    ),
    st AS (
      SELECT doc_id, source, len(arr) AS n_tokens,
             CAST(len(list_distinct(arr)) AS DOUBLE) / len(arr) AS ttr
      FROM base
    ),
    tokc AS (
      SELECT doc_id, t, count(*) AS c
      FROM (SELECT doc_id, unnest(arr) AS t FROM base) GROUP BY 1, 2
    ),
    top_tok AS (SELECT doc_id, max(c) AS top_tok FROM tokc GROUP BY 1),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(arr)),
                                   i -> concat_ws(' ', arr[i], arr[i+1]))) AS b
      FROM base WHERE len(arr) >= 2
    ),
    bgc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
    top_bg AS (SELECT doc_id, max(c) AS top_bg FROM bgc GROUP BY 1),
    per_doc AS (
      SELECT s.source, s.ttr,
             CAST(tt.top_tok AS DOUBLE) / s.n_tokens AS top_tok_frac,
             tb.top_bg * 2.0 / s.n_tokens AS top_bigram_frac
      FROM st s
      JOIN top_tok tt USING (doc_id)
      JOIN top_bg tb USING (doc_id)
    )
    SELECT source, count(*) AS n_docs,
           round(1e-9 + avg(ttr), 4) AS avg_ttr,
           round(1e-9 + avg(top_tok_frac), 4) AS avg_top_tok_frac,
           round(1e-9 + avg(top_bigram_frac), 4) AS avg_top_bigram_frac,
           CAST(sum(CASE WHEN top_tok_frac >= {REP_TOP_TOK_FRAC}
                          OR ttr <= {REP_TTR_MIN}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
    FROM per_doc GROUP BY source ORDER BY source
"""


# --- q109: n-gram language-model perplexity proxy — the statistical
# quality signal real pipelines compute with a trained LM, expressed
# with a corpus-fit add-k-smoothed bigram model so it stays a pure
# two-pass SQL relation: pass 1 fits the model (bigram counts c12,
# context counts c1, vocabulary size V — all VOCAB-BOUNDED tables that
# BROADCAST no matter how big the corpus), pass 2 scores every doc's
# bigrams with ln((c12+k)/(c1+k·V)) and reports per-source
# pseudo-perplexity exp(-avg ln p). High ppl = improbable word
# sequences (noise/garbage); low ppl = repetitive/templated text.
# Scale shape: one corpus scan per pass, narrow bigram explode,
# broadcast joins against the model, per-doc then per-source aggs.
PPL_SMOOTH_K = 0.5


def doc_perplexity(docs: DataFrame) -> DataFrame:
    """(doc_id, source, ppl) — per-doc pseudo-perplexity under the
    corpus-fit bigram model (shared by q109's report and q111's
    adaptive filter)."""
    # base and bg are each read by several consumers but stay
    # UNMATERIALIZED: both are corpus-sized, and checkpointing frames
    # of that size measured slower at the 100x tier than recomputing
    # the explode (see dsir_weights) — the model-count aggregates are
    # map-side-combined, so the re-reads are cheap scans
    base = docs.select(
        "doc_id", "source", _tokens(F.col("text")).alias("arr")
    )
    bg = base.select(
        "doc_id", "source", F.explode(_bigram_array()).alias("bg")
    )
    c12 = bg.groupBy("bg").agg(F.count("*").alias("c12"))
    c1 = (
        bg.select(F.split("bg", " ").getItem(0).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    vocab = base.select(F.explode("arr").alias("t")).agg(
        F.countDistinct("t").alias("v")
    )
    lp = F.log(
        (F.col("c12") + F.lit(PPL_SMOOTH_K))
        / (F.col("c1") + F.lit(PPL_SMOOTH_K) * F.col("v"))
    )
    return (
        bg.withColumn("w1", F.split("bg", " ").getItem(0))
        .join(F.broadcast(c12), "bg")
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id", "source")
        .agg(F.exp(-F.avg(lp)).alias("ppl"))
    )


def q109_perplexity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_doc = doc_perplexity(load_table(spark, sf_dir, "documents"))
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            eround(1e-9 + F.avg("ppl"), 4).alias("avg_ppl"),
            eround(F.min("ppl"), 4).alias("min_ppl"),
            eround(F.max("ppl"), 4).alias("max_ppl"),
        )
        .orderBy("source")
    )


_PPL_PER_DOC_SQL = f"""base AS (
      SELECT doc_id, source,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
      FROM documents
    ),
    bg AS (
      SELECT doc_id, source,
             unnest(list_transform(range(1, len(arr)),
                                   i -> concat_ws(' ', arr[i], arr[i+1]))) AS bg
      FROM base WHERE len(arr) >= 2
    ),
    c12 AS (SELECT bg, count(*) AS c12 FROM bg GROUP BY bg),
    c1 AS (
      SELECT string_split(bg, ' ')[1] AS w1, count(*) AS c1
      FROM bg GROUP BY 1
    ),
    vocab AS (
      SELECT count(DISTINCT t) AS v
      FROM (SELECT unnest(arr) AS t FROM base)
    ),
    per_doc AS (
      SELECT b.doc_id, b.source,
             exp(-avg(ln((m.c12 + {PPL_SMOOTH_K})
                         / (c.c1 + {PPL_SMOOTH_K} * vocab.v)))) AS ppl
      FROM bg b
      JOIN c12 m ON m.bg = b.bg
      JOIN c1 c ON c.w1 = string_split(b.bg, ' ')[1]
      CROSS JOIN vocab
      GROUP BY b.doc_id, b.source
    )"""

_Q109_ORACLE = f"""
    WITH {_PPL_PER_DOC_SQL}
    SELECT source, count(*) AS n_docs,
           round(1e-9 + avg(ppl), 4) AS avg_ppl,
           round(min(ppl), 4) AS min_ppl,
           round(max(ppl), 4) AS max_ppl
    FROM per_doc GROUP BY source ORDER BY source
"""


# --- q149: the bigram LM's TRAIN-side artifact — the smoothed
# probability table q109/q111 score against, exported like q136
# exports the tokenizer vocabulary. Top-K by (count desc, bigram asc)
# via ranked_topk (TakeOrderedAndProject, no single-partition window
# over the vocab-sized model table).
LM_TOP_K = 50


def bigram_lm_export(docs: DataFrame, k: int = LM_TOP_K) -> DataFrame:
    """(rk, bigram, c12, c1, p_smooth) for the corpus's top-k bigrams:
    c12 = bigram count, c1 = first-word count, p_smooth = the same
    add-k conditional probability doc_perplexity scores with — so a
    downstream job can reproduce every q109 score from this table plus
    the vocab size (exported in the v column).

    Shape at scale: the corpus explodes once into the two model
    aggregates doc_perplexity already uses (map-side combined); the
    top-k runs over the VOCAB-bounded c12 table."""
    from .relational import ranked_topk

    base = docs.select(_tokens(F.col("text")).alias("arr"))
    bg = base.select(F.explode(_bigram_array()).alias("bg"))
    c12 = bg.groupBy("bg").agg(F.count("*").alias("c12"))
    c1 = (
        bg.select(F.split("bg", " ").getItem(0).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    vocab = base.select(F.explode("arr").alias("t")).agg(
        F.countDistinct("t").alias("v")
    )
    top = ranked_topk(c12, [F.desc("c12"), F.asc("bg")], k)
    p = (F.col("c12") + F.lit(PPL_SMOOTH_K)) / (
        F.col("c1") + F.lit(PPL_SMOOTH_K) * F.col("v")
    )
    return (
        top.withColumn("w1", F.split("bg", " ").getItem(0))
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col("rk").cast("long").alias("rk"),
            F.col("bg").alias("bigram"),
            "c12",
            "c1",
            "v",
            eround(F.lit(1e-9) + p, 6).alias("p_smooth"),
        )
        .orderBy("rk")
    )


def q149_bigram_lm_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bigram_lm_export(load_table(spark, sf_dir, "documents"))


_Q149_ORACLE = f"""
    WITH base AS (
      SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
      FROM documents
    ),
    bg AS (
      SELECT unnest(list_transform(range(1, len(arr)),
                                   i -> concat_ws(' ', arr[i], arr[i+1])))
               AS bg
      FROM base WHERE len(arr) >= 2
    ),
    c12 AS (SELECT bg, count(*) AS c12 FROM bg GROUP BY bg),
    c1 AS (
      SELECT string_split(bg, ' ')[1] AS w1, count(*) AS c1
      FROM bg GROUP BY 1
    ),
    vocab AS (
      SELECT count(DISTINCT t) AS v
      FROM (SELECT unnest(arr) AS t FROM base)
    ),
    top AS (
      SELECT bg, c12,
             row_number() OVER (ORDER BY c12 DESC, bg ASC) AS rk
      FROM c12
    )
    SELECT CAST(t.rk AS BIGINT) AS rk, t.bg AS bigram, t.c12, c.c1,
           CAST(vocab.v AS BIGINT) AS v,
           round(1e-9 + (t.c12 + {PPL_SMOOTH_K})
                 / (c.c1 + {PPL_SMOOTH_K} * vocab.v), 6) AS p_smooth
    FROM top t
    JOIN c1 c ON c.w1 = string_split(t.bg, ' ')[1]
    CROSS JOIN vocab
    WHERE t.rk <= {LM_TOP_K}
    ORDER BY rk
"""


# --- q111: ADAPTIVE quality filter — the cutoff comes from the data
# (90th-percentile ppl over the corpus), not a hand-tuned constant, so
# the same job drops "the most improbable 10%" of any corpus it runs
# on. Two-pass shape: pass 1 fits the bigram model + the percentile
# (both tiny broadcast relations: the model is vocab-bounded, the
# threshold is ONE row); pass 2 flags each doc against the broadcast
# threshold. Exact `percentile` keeps the DuckDB oracle bit-matched
# (quantile_cont, same interpolation) — at 100 TB you'd swap in
# approx_percentile and keep the identical plan shape (accuracy/cost
# measured by q201 + SCALING pctl_ab rows). Both compare
# sides are rounded first: ppl and threshold differ by ~n·ulp between
# engines, and the doc sitting exactly AT the percentile is a
# knife-edge otherwise.
PPL_DROP_QUANTILE = 0.9


def q111_adaptive_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # consumed twice (threshold percentile + the flag pass) and the
    # per-doc LM scoring is the expensive part — materialize once
    per_doc = doc_perplexity(
        load_table(spark, sf_dir, "documents")
    ).localCheckpoint(eager=False)
    thr = per_doc.agg(
        F.expr(f"percentile(ppl, {PPL_DROP_QUANTILE})").alias("thr")
    )
    flagged = F.when(
        eround(F.col("ppl"), 6) > eround(F.col("thr"), 6), 1
    ).otherwise(0)
    return (
        per_doc.crossJoin(F.broadcast(thr))
        .select("source", "ppl", flagged.alias("dropped"), "thr")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("dropped").alias("n_dropped"),
            eround(
                F.sum("dropped").cast("double") / F.count("*"), 4
            ).alias("drop_rate"),
            eround(F.max("thr"), 4).alias("ppl_threshold"),
        )
        .orderBy("source")
    )


_Q111_ORACLE = f"""
    WITH {{per_doc}},
    thr AS (
      SELECT quantile_cont(ppl, {PPL_DROP_QUANTILE}) AS thr FROM per_doc
    ),
    flags AS (
      SELECT p.source, p.ppl, t.thr,
             CASE WHEN round(p.ppl, 6) > round(t.thr, 6)
                  THEN 1 ELSE 0 END AS dropped
      FROM per_doc p CROSS JOIN thr t
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(dropped) AS BIGINT) AS n_dropped,
           round(CAST(sum(dropped) AS DOUBLE) / count(*), 4) AS drop_rate,
           round(max(thr), 4) AS ppl_threshold
    FROM flags GROUP BY source ORDER BY source
"""


# --- q121: source-vs-corpus divergence — KL(unigram_s ‖ unigram_corpus)
# per source, the mixture diagnostic that tells a pipeline which domain
# is drifting from the blend it trains on. No smoothing needed: every
# source token exists in the corpus distribution, so the log ratio is
# always finite. Scale shape: one (source, token) count shuffle, one
# token-marginal aggregation joined back on token (both map-side
# partial), then a |sources|-key reduce — the same two-shuffle budget
# as q106. Rounded via the q59 convention (1e-9 nudge + round 4) to
# absorb float summation-order differences between engines.
def q121_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(_tokens(F.col("text"))).alias("token")
    )
    st = toks.groupBy("source", "token").agg(F.count("*").alias("c_st"))
    totals = st.groupBy("token").agg(F.sum("c_st").alias("c_t"))
    n = st.agg(F.sum("c_st").alias("n_corpus"))
    per_src = (
        st.join(totals, "token")
        .crossJoin(F.broadcast(n))
        .groupBy("source")
        .agg(
            F.sum("c_st").alias("n_tokens"),
            F.count("*").alias("distinct_tokens"),
            F.sum(
                F.col("c_st")
                * (
                    F.log(F.col("c_st").cast("double"))
                    + F.log(F.col("n_corpus").cast("double"))
                    - F.log(F.col("c_t").cast("double"))
                )
            ).alias("_num"),
        )
    )
    kl = (
        F.col("_num") / F.col("n_tokens")
        - F.log(F.col("n_tokens").cast("double"))
    )
    return per_src.select(
        "source",
        "n_tokens",
        "distinct_tokens",
        eround(1e-9 + kl, 4).alias("kl_vs_corpus"),
    ).orderBy("source")


_Q121_ORACLE = """
    WITH toks AS (
      SELECT source,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
      FROM documents
    ),
    st AS (
      SELECT source, token, count(*) AS c_st FROM toks GROUP BY source, token
    ),
    totals AS (SELECT token, CAST(sum(c_st) AS BIGINT) AS c_t FROM st GROUP BY token),
    n AS (SELECT CAST(sum(c_st) AS BIGINT) AS n_corpus FROM st),
    per_src AS (
      SELECT source,
             CAST(sum(c_st) AS BIGINT) AS n_tokens,
             count(*) AS distinct_tokens,
             sum(c_st * (ln(CAST(c_st AS DOUBLE)) + ln(CAST(n.n_corpus AS DOUBLE))
                         - ln(CAST(t.c_t AS DOUBLE)))) AS _num
      FROM st JOIN totals t USING (token) CROSS JOIN n
      GROUP BY source
    )
    SELECT source, n_tokens, distinct_tokens,
           round(1e-9 + (_num / n_tokens - ln(CAST(n_tokens AS DOUBLE))), 4)
             AS kl_vs_corpus
    FROM per_src ORDER BY source
"""


# --- q126: DSIR-style importance weights — data selection via
# importance resampling (Xie et al. 2023, public): score every raw doc
# by how much its hashed n-gram feature distribution looks like a
# TARGET domain (here the held-out benchmark source, reusing q105's
# convention) versus the RAW corpus. Features are word unigrams +
# bigrams hashed into DSIR_BUCKETS buckets (the md5-derived u16 both
# engines share); bucket probabilities are Laplace-smoothed; a doc's
# log-weight is the sum over its grams of ln p_target(b) - ln p_raw(b).
# Scale shape: the two bucket-count tables are <= DSIR_BUCKETS rows —
# broadcast; per-doc work is one gram explode + one broadcast join +
# one per-doc sum (map-side partial). No all-pairs anything, no
# vocabulary-sized shuffle (the hash trick caps the feature dimension
# exactly so this survives a 100 TB corpus with an unbounded
# vocabulary). Output: the DSIR_TOP_K highest-weight raw docs — the
# resample the method feeds a trainer.
DSIR_BUCKETS = 512
DSIR_TOP_K = 200


def _dsir_grams(docs: DataFrame) -> DataFrame:
    """(doc_id, source, g) — word unigrams + bigrams, NOT distinct
    (DSIR counts repeated grams; contrast distinct_ngrams). Fans the
    scan out first: the gram explode + u16 hashing runs twice per
    dsir_weights call (by measured design) and an under-partitioned
    scan serializes both passes (r14: q126 3.40 s -> 2.15 s)."""
    from ..sources.tables import fan_out_scan

    docs = fan_out_scan(docs.sparkSession, docs)
    arr = _tokens(F.col("text"))
    bi = F.when(
        F.size("arr") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("arr") - 1),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("arr"), i.cast("int")),
                F.element_at(F.col("arr"), (i + 1).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select("doc_id", "source", arr.alias("arr")).select(
        "doc_id",
        "source",
        F.explode(F.concat(F.col("arr"), bi)).alias("g"),
    )


def dsir_weights(
    docs: DataFrame,
    bench_source: str = DECON_BENCH_SOURCE,
    top_k: int = DSIR_TOP_K,
) -> DataFrame:
    """DSIR scores for a (doc_id, source, text) frame: the ``top_k``
    raw docs most target-like under the hashed-n-gram importance
    weights, with ``bench_source`` as the target domain."""
    from ..functions.xsql import expand_u16, hash_u16

    bucket = (
        F.expr(expand_u16(hash_u16("g", "dsir"), "spark")) % DSIR_BUCKETS
    ).alias("b")
    # consumed twice (bucket counts + per-doc scoring) but NOT
    # materialized: the gram table is corpus-sized, and checkpointing
    # it measured 3.6x SLOWER at the 100x tier (block-manager churn
    # dwarfs the saved re-explode) — recompute-twice is the scale-safe
    # shape for corpus-sized intermediates; only bounded frames earn a
    # checkpoint (see doc_perplexity's per-doc scores)
    grams = _dsir_grams(docs).select(
        "doc_id",
        "source",
        bucket,
        (F.col("source") == bench_source).alias("is_t"),
    )
    counts = grams.groupBy("b").agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("n_t"),
        F.sum(F.when(F.col("is_t"), 0).otherwise(1)).alias("n_r"),
    )
    tot = counts.agg(
        F.sum("n_t").alias("tot_t"), F.sum("n_r").alias("tot_r")
    )
    llr = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "b",
            (
                F.log((F.col("n_t") + 1).cast("double"))
                - F.log((F.col("tot_t") + DSIR_BUCKETS).cast("double"))
                - F.log((F.col("n_r") + 1).cast("double"))
                + F.log((F.col("tot_r") + DSIR_BUCKETS).cast("double"))
            ).alias("llr"),
        )
    )
    scored = (
        grams.filter(~F.col("is_t"))
        .join(F.broadcast(llr), "b")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_grams"),
            eround(1e-9 + F.sum("llr"), 4).alias("log_weight"),
        )
    )
    return scored.orderBy(
        F.desc("log_weight"), F.asc("doc_id")
    ).limit(top_k)


def q126_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dsir_weights(load_table(spark, sf_dir, "documents"))


_Q126_ORACLE_TEMPLATE = """
    WITH toks AS (
      SELECT doc_id, source,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
      FROM documents
    ),
    grams AS (
      SELECT doc_id, source,
             unnest(list_concat(
               arr,
               CASE WHEN len(arr) >= 2 THEN list_transform(
                 range(1, len(arr)),
                 i -> arr[i] || ' ' || arr[i + 1]
               ) ELSE [] END
             )) AS g
      FROM toks
    ),
    hashed AS (
      SELECT doc_id, source, ({U16}) % {B} AS b,
             source = '{BENCH}' AS is_t
      FROM grams
    ),
    counts AS (
      SELECT b,
             sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS n_t,
             sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS n_r
      FROM hashed GROUP BY b
    ),
    tot AS (SELECT sum(n_t) AS tot_t, sum(n_r) AS tot_r FROM counts),
    llr AS (
      SELECT b,
             ln(CAST(n_t + 1 AS DOUBLE)) - ln(CAST(tot_t + {B} AS DOUBLE))
             - ln(CAST(n_r + 1 AS DOUBLE)) + ln(CAST(tot_r + {B} AS DOUBLE))
               AS llr
      FROM counts CROSS JOIN tot
    ),
    scored AS (
      SELECT h.doc_id, h.source, count(*) AS n_grams,
             round(1e-9 + sum(l.llr), 4) AS log_weight
      FROM hashed h JOIN llr l USING (b)
      WHERE NOT h.is_t
      GROUP BY h.doc_id, h.source
    )
    SELECT doc_id, source, n_grams, log_weight
    FROM scored
    ORDER BY log_weight DESC, doc_id ASC
    LIMIT {K}
"""


# --- q128: BPE merge induction — learn the first BPE_MERGES merge
# rules over the corpus (Sennrich et al. 2016, public): words become
# space-joined character symbols; each round counts adjacent symbol
# pairs weighted by word frequency, picks the most frequent pair
# (count desc, pair asc — a total order both engines share), and
# rewrites every word with the pair merged (boundary-safe padded
# replace, leftmost-non-overlapping in both engines — greedy exactly
# like reference BPE). The rounds are UNROLLED (fixed small count, the
# q58 label-propagation pattern); word-frequency compression first
# means each round's pair count is one distinct-word-sized aggregate,
# not a corpus-sized one — at 100 TB the distinct-word table is the
# classic Zipf-bounded skeleton that BPE training actually runs on.
BPE_MERGES = 3


def _sym_pairs(ws_col):
    """Adjacent symbol pairs of a space-joined symbol string."""
    arr = F.split(ws_col, " ")
    return F.when(
        F.size(arr) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - 1),
            lambda i: F.concat_ws(
                " ",
                F.element_at(arr, i.cast("int")),
                F.element_at(arr, (i + 1).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _bpe_stages(
    docs: DataFrame, n_merges: int = BPE_MERGES
) -> tuple[list[DataFrame], list[DataFrame]]:
    """The shared BPE-training lineage: ``(words, rules)`` where
    ``words[r]`` is the distinct-word symbol table AFTER the first
    ``r`` merges (words[0] = character symbols) and ``rules[r-1]`` is
    the 1-row (merge_rank, pair, n_occurrences) frame of merge r.
    q128 consumes the rules; q129 consumes the per-stage word tables
    (the compression curve)."""
    words = (
        docs.select(F.explode(_tokens(F.col("text"))).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        # symbolize: every char becomes a space-separated symbol (a
        # space after each char, then trim — tokens are \s+-split so
        # they contain no spaces themselves; same regex in the oracle)
        .select(
            F.trim(F.regexp_replace("w", "(.)", "$1 ")).alias("ws"),
            "n",
        )
        .localCheckpoint(eager=False)
    )
    stages = [words]
    rules = []
    for rank in range(1, n_merges + 1):
        counts = (
            words.select(F.explode(_sym_pairs(F.col("ws"))).alias("p"), "n")
            .groupBy("p")
            .agg(F.sum("n").alias("cnt"))
        )
        top = (
            counts.orderBy(F.desc("cnt"), F.asc("p"))
            .limit(1)
            .select(
                F.lit(rank).alias("merge_rank"),
                F.col("p").alias("pair"),
                F.col("cnt").alias("n_occurrences"),
            )
            .localCheckpoint(eager=False)
        )
        rules.append(top)
        merged = F.replace(F.col("pair"), F.lit(" "), F.lit(""))
        # Boundary-safe replace with DOUBLED separators: " a b " as a
        # plain pattern consumes the space shared by adjacent
        # occurrences ("a b a b" would merge only the first pair).
        # Doubling every separator first gives each occurrence its own
        # boundary spaces, so plain left-to-right replace merges ALL
        # leftmost-non-overlapping occurrences — exactly reference
        # BPE's greedy rewrite ("a a a a" → "aa aa"). Runs after
        # replacement are ≤2 spaces by construction, so one
        # double→single collapse restores canonical form. Same
        # string-function sequence in the DuckDB oracle.
        padded = F.concat(
            F.lit(" "),
            F.replace(F.col("ws"), F.lit(" "), F.lit("  ")),
            F.lit(" "),
        )
        pat = F.concat(
            F.lit(" "),
            F.replace(F.col("pair"), F.lit(" "), F.lit("  ")),
            F.lit(" "),
        )
        words = (
            words.crossJoin(F.broadcast(top))
            .select(
                F.trim(
                    F.replace(
                        F.replace(
                            padded, pat, F.concat(F.lit(" "), merged, F.lit(" "))
                        ),
                        F.lit("  "),
                        F.lit(" "),
                    )
                ).alias("ws"),
                "n",
            )
            .localCheckpoint(eager=False)
        )
        stages.append(words)
    return stages, rules


# Session memo of the BPE training lineage (stages, rules) — a
# tokenizer is trained once and its vocab/merge tables are persisted
# artifacts; q128/q129/q136/q137/q141 each re-ran the merge rounds per
# call before r14 (the token_state precedent applied to the tokenizer
# tier). Distinct-word-scale frames (Zipf-bounded), so persisting them
# is cheap by construction; cleared via clear_lp_cache's cascade.
_BPE_CACHE: dict = {}
_BPE_CACHE_MAX = 3


def clear_bpe_cache() -> None:
    from .sketches import _safe_unpersist

    for stages, rules in _BPE_CACHE.values():
        for df in stages + rules:
            _safe_unpersist(df)
    _BPE_CACHE.clear()


def _bpe_state(
    spark: SparkSession, sf_dir: str, n_merges: int = BPE_MERGES
):
    """Memoized persisted (stages, rules) of the corpus tokenizer —
    see _BPE_CACHE's comment."""
    from pyspark import StorageLevel

    key = (spark.sparkContext.applicationId, sf_dir, n_merges)
    hit = _BPE_CACHE.get(key)
    if hit is not None:
        return hit
    stages, rules = _bpe_stages(
        load_table(spark, sf_dir, "documents"), n_merges
    )
    stages = [s.persist(StorageLevel.MEMORY_AND_DISK) for s in stages]
    rules = [r.persist(StorageLevel.MEMORY_AND_DISK) for r in rules]
    stages[-1].count()  # materialize the whole merge chain once
    while len(_BPE_CACHE) >= _BPE_CACHE_MAX:
        from .sketches import _safe_unpersist as _su

        old_stages, old_rules = _BPE_CACHE.pop(next(iter(_BPE_CACHE)))
        for df in old_stages + old_rules:
            _su(df)
    _BPE_CACHE[key] = (stages, rules)
    return stages, rules


def bpe_merge_rules(
    docs: DataFrame, n_merges: int = BPE_MERGES, stages_rules=None
) -> DataFrame:
    """(merge_rank, pair, n_occurrences) — the first ``n_merges``
    learned BPE merges for a (text) frame."""
    _stages, rules = (
        stages_rules if stages_rules is not None
        else _bpe_stages(docs, n_merges)
    )
    out = rules[0]
    for r in rules[1:]:
        out = out.unionByName(r)
    return out.orderBy("merge_rank")


def bpe_compression_curve(
    docs: DataFrame, n_merges: int = BPE_MERGES, stages_rules=None
) -> DataFrame:
    """(merges_applied, n_words, total_symbols, avg_symbols_per_word)
    — the corpus-wide ENCODE side of BPE training: how many symbols
    the corpus tokenizes to after each successive learned merge
    (merges_applied = 0 is the character baseline). Each stage's count
    is one aggregate over the Zipf-bounded distinct-word table —
    symbols per word = separator count + 1, weighted by word
    frequency; the corpus is never re-tokenized per stage."""
    stages, _rules = (
        stages_rules if stages_rules is not None
        else _bpe_stages(docs, n_merges)
    )
    outs = []
    for r, words in enumerate(stages):
        syms = (
            F.length("ws") - F.length(F.replace("ws", F.lit(" "), F.lit("")))
            + 1
        )
        outs.append(
            words.agg(
                F.lit(r).alias("merges_applied"),
                F.sum("n").alias("n_words"),
                F.sum(F.col("n") * syms).alias("total_symbols"),
                eround(
                    1e-9
                    + F.sum(F.col("n") * syms)
                    / F.sum("n").cast("double"),
                    4,
                ).alias("avg_symbols_per_word"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("merges_applied")


def q129_bpe_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_compression_curve(
        load_table(spark, sf_dir, "documents"),
        stages_rules=_bpe_state(spark, sf_dir),
    )


def q128_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_merge_rules(
        load_table(spark, sf_dir, "documents"),
        stages_rules=_bpe_state(spark, sf_dir),
    )


# --- q136/q137: the tokenizer APPLY side. q128 trains the merges and
# q129 reports the corpus-wide compression curve; these two produce
# the artifacts a downstream training job actually consumes — the
# vocabulary export (q136, the vocab.json equivalent) and encoded
# token-id sequences for documents (q137). Reference parity: the
# reference has no tokenizer at all (its content_generator.py works on
# whole words); this is a north-star LLM-pipeline extension.

ENC_DOC_MOD = 20  # deterministic encode sample: doc_id % 20 == 0


def _bpe_vocab_from(final_words: DataFrame) -> DataFrame:
    """(token_id, symbol, n_occurrences) from the post-merge
    distinct-word symbol table. token_id ranks by (corpus frequency
    desc, symbol asc) — GPT-style frequency-ordered ids. The global
    ``row_number`` window runs over a VOCAB-BOUNDED frame (|symbols|
    <= |charset| + n_merges, i.e. tens of rows regardless of corpus
    size), so the single-partition window the repo bans on corpus-
    sized inputs is safe by construction here."""
    vocab = (
        final_words.select(
            F.explode(F.split("ws", " ")).alias("symbol"), "n"
        )
        .groupBy("symbol")
        .agg(F.sum("n").alias("n_occurrences"))
    )
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("symbol"))
    return vocab.select(
        F.row_number().over(w).cast("long").alias("token_id"),
        "symbol",
        "n_occurrences",
    )


def bpe_vocab(
    docs: DataFrame, n_merges: int = BPE_MERGES, stages_rules=None
) -> DataFrame:
    """The trained tokenizer's vocabulary table — the artifact the
    encode side ships to a training job."""
    stages, _rules = (
        stages_rules if stages_rules is not None
        else _bpe_stages(docs, n_merges)
    )
    return _bpe_vocab_from(stages[-1]).orderBy("token_id")


def bpe_encode_docs(
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    doc_mod: int = ENC_DOC_MOD,
    stages_rules=None,
) -> DataFrame:
    """(doc_id, n_tokens, token_ids) — documents encoded with the
    learned merges, as space-joined token-id sequences (the training-
    input materialization of the q128 tokenizer).

    Shape at scale: the corpus is tokenized ONCE (posexplode of
    whitespace tokens); each word equi-joins the Zipf-bounded distinct-
    word symbol table (the original word is recoverable from the
    merged symbol string — merges only delete separators, so
    ``replace(ws, ' ', '') = w`` — no extra key column threads through
    the merge rewrites); symbols then broadcast-join the vocab for
    ids. The per-doc ``collect_list`` is bounded by document length
    (the same by-construction bound as q115's packed shards). The
    deterministic ``doc_id % doc_mod`` sample bounds output rows, not
    work shape — dropping the filter is the full-corpus encode."""
    stages, _rules = (
        stages_rules if stages_rules is not None
        else _bpe_stages(docs, n_merges)
    )
    final_words = stages[-1]
    vocab = _bpe_vocab_from(final_words)
    wordmap = final_words.select(
        F.replace(F.col("ws"), F.lit(" "), F.lit("")).alias("w"), "ws"
    )
    sample = docs.filter((F.col("doc_id") % doc_mod) == 0)
    toks = sample.select(
        "doc_id", F.posexplode(_tokens(F.col("text"))).alias("wpos", "w")
    ).filter(F.length("w") > 0)
    syms = toks.join(wordmap, "w").select(
        "doc_id",
        "wpos",
        F.posexplode(F.split("ws", " ")).alias("spos", "symbol"),
    )
    ids = syms.join(F.broadcast(vocab.select("token_id", "symbol")), "symbol")
    return (
        ids.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("wpos"),
                                F.col("spos"),
                                F.col("token_id"),
                            )
                        )
                    ),
                    lambda s: s["token_id"].cast("string"),
                ),
            ).alias("token_ids"),
        )
        .orderBy("doc_id")
    )


def q136_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_vocab(
        load_table(spark, sf_dir, "documents"),
        stages_rules=_bpe_state(spark, sf_dir),
    )


def q137_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_encode_docs(
        load_table(spark, sf_dir, "documents"),
        stages_rules=_bpe_state(spark, sf_dir),
    )


def tokenizer_fertility(
    docs: DataFrame, n_merges: int = BPE_MERGES, stages_rules=None
) -> DataFrame:
    """Tokenizer fertility by language: BPE tokens per whitespace word
    and characters per BPE token, per ``lang`` — the standard
    multilingual-tokenizer fairness audit (a high-fertility language
    pays more sequence length for the same text).

    Shape at scale: the corpus-sized token stream hits exactly ONE
    hash aggregate — (lang, word) counts with map-side combine — and
    every later frame is vocabulary-bounded: the per-word symbol
    count comes from the Zipf-bounded distinct-word table the merge
    stages already produce (q128's lineage), and the (lang, word)
    count table joins it at |langs| x |vocab| rows. No corpus-sized
    join, no window. Reference parity: none (the reference has no
    tokenizer); north-star LLM-pipeline extension alongside q136/q137.
    """
    stages, _rules = (
        stages_rules if stages_rules is not None
        else _bpe_stages(docs, n_merges)
    )
    wordmap = stages[-1].select(
        F.replace(F.col("ws"), F.lit(" "), F.lit("")).alias("w"),
        F.size(F.split("ws", " ")).alias("n_syms"),
    )
    lwc = (
        docs.select("lang", F.explode(_tokens(F.col("text"))).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("lang", "w")
        .agg(F.count("*").alias("cnt"))
    )
    toks = F.sum(F.col("cnt") * F.col("n_syms"))
    return (
        lwc.join(wordmap, "w")
        .groupBy("lang")
        .agg(
            F.sum("cnt").alias("n_words"),
            toks.alias("n_tokens"),
            eround(
                F.lit(1e-9) + toks / F.sum("cnt").cast("double"), 4
            ).alias("fertility"),
            eround(
                F.lit(1e-9)
                + F.sum(F.col("cnt") * F.length("w")) / toks.cast("double"),
                4,
            ).alias("chars_per_token"),
        )
        .orderBy("lang")
    )


def q141_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tokenizer_fertility(
        load_table(spark, sf_dir, "documents"),
        stages_rules=_bpe_state(spark, sf_dir),
    )


def _bpe_oracle_ctes() -> str:
    """The words0..wordsN + top1..topN CTE chain shared by the q128
    (rules) and q129 (compression curve) oracles."""
    body = """
    WITH words0 AS MATERIALIZED (
      SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS ws,
             count(*) AS n
      FROM (
        SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
        FROM documents
      ) WHERE len(w) > 0
      GROUP BY 1
    )"""
    for rank in range(1, BPE_MERGES + 1):
        prev = f"words{rank - 1}"
        body += f""",
    pairs{rank} AS MATERIALIZED (
      SELECT concat_ws(' ', arr[i], arr[i + 1]) AS p, sum(n) AS cnt
      FROM (
        SELECT string_split(ws, ' ') AS arr, n,
               unnest(range(1, len(string_split(ws, ' ')))) AS i
        FROM {prev}
      )
      GROUP BY 1
    ),
    top{rank} AS MATERIALIZED (
      SELECT {rank} AS merge_rank, p AS pair, cnt AS n_occurrences
      FROM pairs{rank} ORDER BY cnt DESC, p ASC LIMIT 1
    ),
    words{rank} AS MATERIALIZED (
      SELECT trim(replace(
               replace(' ' || replace(w.ws, ' ', '  ') || ' ',
                       ' ' || replace(t.pair, ' ', '  ') || ' ',
                       ' ' || replace(t.pair, ' ', '') || ' '),
               '  ', ' ')) AS ws,
             w.n
      FROM {prev} w CROSS JOIN top{rank} t
    )"""
    return body


def _q128_oracle() -> str:
    sel = [
        f"SELECT merge_rank, pair, CAST(n_occurrences AS BIGINT) "
        f"AS n_occurrences FROM top{rank}"
        for rank in range(1, BPE_MERGES + 1)
    ]
    return (
        _bpe_oracle_ctes()
        + "\n"
        + " UNION ALL ".join(sel)
        + " ORDER BY merge_rank"
    )


def _q129_oracle() -> str:
    syms = "(length(ws) - length(replace(ws, ' ', '')) + 1)"
    sel = [
        f"""SELECT {r} AS merges_applied,
               CAST(sum(n) AS BIGINT) AS n_words,
               CAST(sum(n * {syms}) AS BIGINT) AS total_symbols,
               round(1e-9 + sum(n * {syms}) / CAST(sum(n) AS DOUBLE), 4)
                 AS avg_symbols_per_word
        FROM words{r}"""
        for r in range(0, BPE_MERGES + 1)
    ]
    return (
        _bpe_oracle_ctes()
        + "\n"
        + " UNION ALL ".join(sel)
        + " ORDER BY merges_applied"
    )


_VOCAB_CTE = f""",
    vocab AS MATERIALIZED (
      SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC, symbol ASC)
                  AS BIGINT) AS token_id,
             symbol, n_occurrences
      FROM (
        SELECT s AS symbol, CAST(sum(n) AS BIGINT) AS n_occurrences
        FROM (SELECT unnest(string_split(ws, ' ')) AS s, n
              FROM words{BPE_MERGES})
        GROUP BY 1
      )
    )"""


def _q136_oracle() -> str:
    return (
        _bpe_oracle_ctes()
        + _VOCAB_CTE
        + "\n    SELECT token_id, symbol, n_occurrences FROM vocab"
        + " ORDER BY token_id"
    )


def _q137_oracle() -> str:
    return (
        _bpe_oracle_ctes()
        + _VOCAB_CTE
        + f""",
    wordmap AS (SELECT replace(ws, ' ', '') AS w, ws
                FROM words{BPE_MERGES}),
    toks AS (
      SELECT doc_id, i AS wpos, arr[i] AS w
      FROM (
        SELECT doc_id,
               regexp_split_to_array(lower(trim(text)), '\\s+') AS arr,
               unnest(range(1,
                 len(regexp_split_to_array(lower(trim(text)), '\\s+')) + 1))
                 AS i
        FROM documents WHERE doc_id % {ENC_DOC_MOD} = 0
      ) WHERE len(arr[i]) > 0
    ),
    syms AS (
      SELECT doc_id, wpos, j AS spos, sarr[j] AS symbol
      FROM (
        SELECT t.doc_id, t.wpos, string_split(m.ws, ' ') AS sarr,
               unnest(range(1, len(string_split(m.ws, ' ')) + 1)) AS j
        FROM toks t JOIN wordmap m ON t.w = m.w
      )
    )
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           string_agg(CAST(v.token_id AS VARCHAR), ' '
                      ORDER BY s.wpos, s.spos) AS token_ids
    FROM syms s JOIN vocab v ON s.symbol = v.symbol
    GROUP BY s.doc_id ORDER BY s.doc_id"""
    )


def corpus_diversity(docs: DataFrame) -> DataFrame:
    """Corpus-level lexical diversity per source: distinct/total ratios
    for unigrams AND bigrams across the whole source (the distinct-n
    diversity metric) — the cross-doc complement of q106's within-doc
    repetition signals. A source whose corpus-wide type-token ratio
    collapses is template-generated even when each individual document
    looks diverse.

    Shape at scale: two corpus-sized explodes, each absorbed by ONE
    (source, gram) hash aggregate with map-side combine, then a
    second |sources| x |vocab|-bounded aggregate — the two-level
    count-distinct pattern, never ``countDistinct`` over a skewed
    corpus column. Reference parity: none; LLM-pipeline extension."""
    base = docs.select("source", _tokens(F.col("text")).alias("arr"))
    uni = (
        base.select("source", F.explode("arr").alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("source", "w")
        .agg(F.count("*").alias("cnt"))
    )
    ustats = uni.groupBy("source").agg(
        F.count("*").alias("distinct_unigrams"),
        F.sum("cnt").alias("n_unigrams"),
    )
    bi = (
        base.select("source", F.explode(_bigram_array("arr")).alias("g"))
        .groupBy("source", "g")
        .agg(F.count("*").alias("cnt"))
    )
    bstats = bi.groupBy("source").agg(
        F.count("*").alias("distinct_bigrams"),
        F.sum("cnt").alias("n_bigrams"),
    )
    nd = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    return (
        nd.join(ustats, "source")
        .join(bstats, "source")
        .select(
            "source",
            "n_docs",
            "n_unigrams",
            "distinct_unigrams",
            eround(
                F.lit(1e-9)
                + F.col("distinct_unigrams")
                / F.col("n_unigrams").cast("double"),
                4,
            ).alias("ttr_corpus"),
            "n_bigrams",
            "distinct_bigrams",
            eround(
                F.lit(1e-9)
                + F.col("distinct_bigrams")
                / F.col("n_bigrams").cast("double"),
                4,
            ).alias("distinct2"),
        )
        .orderBy("source")
    )


def q143_corpus_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_diversity(load_table(spark, sf_dir, "documents"))


# --- q147: within-source boilerplate n-gram detection — the C4/CCNet
# pattern (navigation, footers, license blurbs repeat VERBATIM across
# a source's pages). A 4-gram is boilerplate for its source when its
# doc frequency reaches max(2, ceil(n_docs/20)) — integer arithmetic
# ((n + 19) / 20 integer-division) in BOTH engines, so the threshold
# can't knife-edge on a float ceil. DF counting reuses q105's distinct
# per-doc gram table.
def boilerplate_grams(docs: DataFrame) -> DataFrame:
    """Per-source boilerplate report: how many distinct 4-grams cross
    the within-source doc-frequency threshold and what share of the
    source's docs contain at least one of them.

    Shape at scale: the corpus-sized gram table hits one (source, g)
    hash agg with map-side combine; the boilerplate gram set is small
    by construction (threshold scales with corpus size), so the
    coverage pass is a broadcast semi-join; the distinct-doc count is
    the two-level (source, doc) -> source pattern."""
    grams = distinct_ngrams(docs)
    nd = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    bp = _boilerplate_gram_set(docs, with_df=True)
    n_bp = bp.groupBy("source").agg(
        F.count("*").alias("n_bp_grams"), F.sum("df").alias("n_bp_hits")
    )
    covered = (
        grams.join(F.broadcast(bp.select("source", "g")), ["source", "g"])
        .groupBy("source", "doc_id")
        .agg(F.lit(1).alias("one"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs_with_bp"))
    )
    return (
        nd.join(n_bp, "source", "left")
        .join(covered, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_bp_grams", F.lit(0)).alias("n_bp_grams"),
            F.coalesce("n_bp_hits", F.lit(0)).alias("n_bp_hits"),
            F.coalesce("n_docs_with_bp", F.lit(0)).alias("n_docs_with_bp"),
            eround(
                F.lit(1e-9)
                + F.coalesce("n_docs_with_bp", F.lit(0)).cast("double")
                / F.col("n_docs"),
                4,
            ).alias("bp_doc_share"),
        )
        .orderBy("source")
    )


def q147_boilerplate_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    return boilerplate_grams(load_table(spark, sf_dir, "documents"))


def source_gram_counts(docs: DataFrame) -> DataFrame:
    """(source, g, df) — document frequency of every distinct word
    4-gram within its source. ADDITIVE over disjoint doc sets (df is a
    per-doc-distinct count), so a persisted copy merges with a delta
    batch by bucket-wise sum — the evolving-state index the
    incremental release rides (plans/release.py::update_release), same
    mergeability contract as q200's DDSketch partials."""
    return distinct_ngrams(docs).groupBy("source", "g").agg(
        F.count("*").alias("df")
    )


def boilerplate_threshold_filter(
    counts: DataFrame, nd: DataFrame, with_df: bool = False
) -> DataFrame:
    """Apply the boilerplate threshold df >= max(2, ceil(n_docs/20))
    (integer arithmetic) to a (source, g, df) count table given the
    per-source (source, n_docs) table."""
    thr = F.greatest(
        F.lit(2), F.floor((F.col("n_docs") + F.lit(19)) / F.lit(20))
    ).cast("long")
    out = counts.join(F.broadcast(nd), "source").filter(F.col("df") >= thr)
    cols = ["source", "g", "df"] if with_df else ["source", "g"]
    return out.select(*cols)


def _boilerplate_gram_set(docs: DataFrame, with_df: bool = False) -> DataFrame:
    """(source, g[, df]) — the within-source boilerplate 4-grams, the
    threshold being df >= max(2, ceil(n_docs/20)) in integer
    arithmetic. Shared by the detector (q147) and the cleaner
    (q155/q156) so the two can never disagree about what counts as
    boilerplate."""
    nd = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    return boilerplate_threshold_filter(
        source_gram_counts(docs), nd, with_df=with_df
    )


# --- q155/q156: boilerplate REMOVAL — the action analog of q147 (the
# C4/CCNet clean-text materialization; same detect→act pairing as
# q101-over-q46 and the redaction in sitscan). A token position is
# stripped when it lies inside ANY occurrence of a flagged
# within-source boilerplate 4-gram; the surviving tokens are re-joined
# into the cleaned text. Reference analog: validator.py's find-bad-
# content tier (/root/reference/modules/validator.py:42-357) detects;
# this materializes the corrected corpus.
#
# Scale shape: the positional-gram explode is linear in corpus tokens
# (same narrow transform as q131's _span_grams); the boilerplate gram
# set is SMALL BY CONSTRUCTION (its doc-frequency threshold scales
# with corpus size), so flagging is a broadcast hash join; covered
# positions collapse to ONE row per touched doc (a sorted position
# array), and the rewrite is a doc_id equi-join of that small frame
# back to the corpus followed by a pure higher-order-function filter —
# no Python UDF, no window, no corpus-sized shuffle carrying text.
def _pos_ngrams(docs: DataFrame, n: int = DECON_N) -> DataFrame:
    """(doc_id, source, pos, g) — every overlapping word n-gram with
    its 1-based start position (the positional sibling of
    distinct_ngrams; same narrow transform, shared by the two 4-gram
    strip actions q155/q160). Fans the scan out first — see
    distinct_ngrams."""
    from ..sources.tables import fan_out_scan

    docs = fan_out_scan(docs.sparkSession, docs)
    arr = _tokens(F.col("text"))
    base = docs.select("doc_id", "source", arr.alias("arr"))
    return base.select(
        "doc_id",
        "source",
        F.posexplode(
            F.when(
                F.size("arr") >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size("arr") - (n - 1)),
                    lambda i: F.concat_ws(
                        " ",
                        *[
                            F.element_at(F.col("arr"), (i + j).cast("int"))
                            for j in range(n)
                        ],
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pos0", "g"),
    ).select(
        "doc_id", "source", (F.col("pos0") + 1).alias("pos"), "g"
    )


def boilerplate_clean(
    docs: DataFrame,
    gram_docs: DataFrame | None = None,
    gram_set: DataFrame | None = None,
) -> DataFrame:
    """Per-TOUCHED-doc materialization: (doc_id, source, tokens_before,
    tokens_removed, clean_text) for every document containing at least
    one flagged boilerplate gram; untouched docs pass through a real
    pipeline unchanged so they are omitted here.

    ``gram_docs`` lets a caller pin the boilerplate DEFINITION to a
    different (usually larger) corpus than the one being rewritten:
    the release pipeline computes the gram set from the full raw
    corpus so its stage-3 strip agrees with q155's corpus-wide
    definition even though it rewrites only the post-dedup subset
    (ADVICE r11). Default (None) = derive grams from ``docs`` itself,
    the q155/q156 behavior. ``gram_set`` injects an already-computed
    (source, g) flag table instead (the incremental release's merged
    evolving-state counts) and wins over ``gram_docs``."""
    from .dedup import _rewrite_without_spans

    if gram_set is not None:
        bp = gram_set.select("source", "g")
    else:
        bp = _boilerplate_gram_set(docs if gram_docs is None else gram_docs)
    flagged = (
        _pos_ngrams(docs)
        .join(F.broadcast(bp), ["source", "g"])
        .select("doc_id", "pos")
    )
    return _rewrite_without_spans(docs, flagged, n=DECON_N)


def q155_boilerplate_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    return boilerplate_clean(load_table(spark, sf_dir, "documents"))


def boilerplate_clean_stats(docs: DataFrame) -> DataFrame:
    """Per-source accounting for the q155 strip: docs_touched,
    tokens_total, tokens_removed, removed_share — the number a pipeline
    owner reads before shipping the cleaned corpus."""
    arr = _tokens(F.col("text"))
    totals = (
        docs.select("source", F.size(arr).alias("n_tok"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("tokens_total"),
        )
    )
    touched = boilerplate_clean(docs).groupBy("source").agg(
        F.count("*").alias("docs_touched"),
        F.sum("tokens_removed").alias("tokens_removed"),
    )
    return (
        totals.join(touched, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("docs_touched", F.lit(0)).alias("docs_touched"),
            "tokens_total",
            F.coalesce("tokens_removed", F.lit(0)).alias("tokens_removed"),
            eround(
                F.lit(1e-9)
                + F.coalesce("tokens_removed", F.lit(0)).cast("double")
                / F.col("tokens_total"),
                4,
            ).alias("removed_share"),
        )
        .orderBy("source")
    )


def q156_boilerplate_clean_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return boilerplate_clean_stats(load_table(spark, sf_dir, "documents"))


# --- q160: decontamination STRIP — the ACTION on q105's detector
# (C4/CCNet remove benchmark-overlapping content rather than dropping
# whole docs): every train-doc position covered by a word 4-gram that
# also appears in the held-out benchmark source is removed and the
# cleaned text materialized. Third member of the strip family (q155
# within-source boilerplate, q157/q159 cross-doc spans) — here the
# flag set is the BENCHMARK gram table, tiny relative to the corpus
# by construction, so flagging is a pure broadcast hash join; the
# train side is one positional explode + the shared covered-position
# rewrite. No shuffle ever carries document text.
def decontaminate_strip(
    docs: DataFrame,
    n: int = DECON_N,
    bench_source: str = DECON_BENCH_SOURCE,
) -> DataFrame:
    """Per-TOUCHED-train-doc materialization: (doc_id, source,
    tokens_before, tokens_removed, clean_text); benchmark docs are the
    flag source and are never rewritten."""
    from .dedup import _rewrite_without_spans

    bench = (
        distinct_ngrams(docs.filter(F.col("source") == bench_source), n)
        .select("g")
        .distinct()
    )
    train = docs.filter(F.col("source") != bench_source)
    flagged = (
        _pos_ngrams(train, n)
        .join(F.broadcast(bench), "g")
        .select("doc_id", "pos")
    )
    return _rewrite_without_spans(train, flagged, n=n)


def q160_decontaminate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decontaminate_strip(load_table(spark, sf_dir, "documents"))


def write_bench_gram_index(
    spark: SparkSession, sf_dir: str, path: str,
    n: int = DECON_N, bench_source: str = DECON_BENCH_SOURCE,
) -> None:
    """Persist the held-out benchmark's distinct word n-grams — the
    fixed state q160's streaming twin strips against (the benchmark
    changes on release cadence, not per batch)."""
    docs = load_table(spark, sf_dir, "documents")
    (
        distinct_ngrams(docs.filter(F.col("source") == bench_source), n)
        .select("g")
        .distinct()
        .write.mode("overwrite")
        .parquet(path)
    )


def decon_strip_batch(
    spark: SparkSession, index_path: str, batch_df: DataFrame,
    n: int = DECON_N,
) -> DataFrame:
    """One micro-batch through the decontamination strip (q160's
    streaming twin): flag against the PERSISTED benchmark gram index
    (broadcast — benchmark-sized by construction), rewrite with the
    shared covered-position pass. Per-doc outcomes are IDENTICAL to
    q160's for the same docs (test_decon_strip_stream_equals_batch)."""
    from .dedup import _rewrite_without_spans

    bench = spark.read.parquet(index_path)
    flagged = (
        _pos_ngrams(batch_df, n)
        .join(F.broadcast(bench.select("g")), "g")
        .select("doc_id", "pos")
    )
    return _rewrite_without_spans(batch_df, flagged, n=n)


_Q160_ORACLE = f"""
    WITH base AS (
      SELECT doc_id, source,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
      FROM documents
    ),
    pgrams AS (
      SELECT doc_id, source,
             unnest(range(1, len(arr) - {DECON_N - 2})) AS pos,
             unnest(list_transform(
               range(1, len(arr) - {DECON_N - 2}),
               i -> array_to_string(arr[i:i + {DECON_N - 1}], ' ')
             )) AS g
      FROM base WHERE len(arr) >= {DECON_N}
    ),
    bench AS (
      SELECT DISTINCT g FROM pgrams
      WHERE source = '{DECON_BENCH_SOURCE}'
    ),
    covered AS (
      SELECT doc_id,
             list_sort(list_distinct(flatten(list(
               range(pos, pos + {DECON_N})
             )))) AS cov
      FROM (
        SELECT p.doc_id, p.pos
        FROM pgrams p JOIN bench b ON b.g = p.g
        WHERE p.source != '{DECON_BENCH_SOURCE}'
      ) GROUP BY doc_id
    )
    SELECT b.doc_id, b.source,
           CAST(len(b.arr) AS BIGINT) AS tokens_before,
           CAST(len(c.cov) AS BIGINT) AS tokens_removed,
           coalesce(array_to_string(
             list_filter(
               list_transform(
                 range(1, len(b.arr) + 1),
                 i -> CASE WHEN list_contains(c.cov, i) THEN NULL
                           ELSE b.arr[i] END
               ),
               x -> x IS NOT NULL
             ), ' '), '') AS clean_text
    FROM base b JOIN covered c USING (doc_id)
    ORDER BY doc_id
"""


_BP_CLEAN_CTES = f"""
    WITH base AS (
      SELECT doc_id, source,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, source,
             unnest(list_transform(
               range(1, len(arr) - {DECON_N - 2}),
               i -> array_to_string(arr[i:i + {DECON_N - 1}], ' ')
             )) AS g
      FROM base WHERE len(arr) >= {DECON_N}
    ),
    nd AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
    bp AS (
      SELECT d.source, d.g
      FROM (SELECT source, g, count(*) AS df FROM grams GROUP BY 1, 2) d
      JOIN nd USING (source)
      WHERE d.df >= greatest(2, (n_docs + 19) // 20)
    ),
    pgrams AS (
      SELECT doc_id, source,
             unnest(range(1, len(arr) - {DECON_N - 2})) AS pos,
             unnest(list_transform(
               range(1, len(arr) - {DECON_N - 2}),
               i -> array_to_string(arr[i:i + {DECON_N - 1}], ' ')
             )) AS g
      FROM base WHERE len(arr) >= {DECON_N}
    ),
    covered AS (
      SELECT doc_id,
             list_sort(list_distinct(flatten(list(
               range(pos, pos + {DECON_N})
             )))) AS cov
      FROM (
        SELECT p.doc_id, p.pos
        FROM pgrams p JOIN bp ON bp.source = p.source AND bp.g = p.g
      ) GROUP BY doc_id
    )
"""

_Q155_ORACLE = (
    _BP_CLEAN_CTES
    + """
    SELECT b.doc_id, b.source,
           CAST(len(b.arr) AS BIGINT) AS tokens_before,
           CAST(len(c.cov) AS BIGINT) AS tokens_removed,
           coalesce(array_to_string(
             list_filter(
               list_transform(
                 range(1, len(b.arr) + 1),
                 i -> CASE WHEN list_contains(c.cov, i) THEN NULL
                           ELSE b.arr[i] END
               ),
               x -> x IS NOT NULL
             ), ' '), '') AS clean_text
    FROM base b JOIN covered c USING (doc_id)
    ORDER BY doc_id
"""
)

_Q156_ORACLE = (
    _BP_CLEAN_CTES
    + """,
    totals AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(len(arr)) AS BIGINT) AS tokens_total
      FROM base GROUP BY source
    ),
    touched AS (
      SELECT b.source, count(*) AS docs_touched,
             CAST(sum(len(c.cov)) AS BIGINT) AS tokens_removed
      FROM base b JOIN covered c USING (doc_id)
      GROUP BY b.source
    )
    SELECT t.source, t.n_docs,
           coalesce(docs_touched, 0) AS docs_touched,
           tokens_total,
           coalesce(tokens_removed, 0) AS tokens_removed,
           round(1e-9 + coalesce(tokens_removed, 0)
                 / CAST(tokens_total AS DOUBLE), 4) AS removed_share
    FROM totals t
    LEFT JOIN touched USING (source)
    ORDER BY source
"""
)


_Q147_ORACLE = f"""
    WITH base AS (
      SELECT doc_id, source,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, source,
             unnest(list_transform(
               range(1, len(arr) - {DECON_N - 2}),
               i -> array_to_string(arr[i:i + {DECON_N - 1}], ' ')
             )) AS g
      FROM base WHERE len(arr) >= {DECON_N}
    ),
    nd AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
    df_tab AS (
      SELECT source, g, count(*) AS df FROM grams GROUP BY 1, 2
    ),
    bp AS (
      SELECT d.source, d.g, d.df
      FROM df_tab d JOIN nd USING (source)
      WHERE d.df >= greatest(2, (n_docs + 19) // 20)
    ),
    n_bp AS (
      SELECT source, count(*) AS n_bp_grams,
             CAST(sum(df) AS BIGINT) AS n_bp_hits
      FROM bp GROUP BY 1
    ),
    covered AS (
      SELECT source, count(*) AS n_docs_with_bp
      FROM (
        SELECT gr.source, gr.doc_id
        FROM grams gr JOIN bp ON bp.source = gr.source AND bp.g = gr.g
        GROUP BY 1, 2
      ) GROUP BY 1
    )
    SELECT nd.source, nd.n_docs,
           coalesce(n_bp_grams, 0) AS n_bp_grams,
           coalesce(n_bp_hits, 0) AS n_bp_hits,
           coalesce(n_docs_with_bp, 0) AS n_docs_with_bp,
           round(1e-9 + coalesce(n_docs_with_bp, 0)
                 / CAST(nd.n_docs AS DOUBLE), 4) AS bp_doc_share
    FROM nd
    LEFT JOIN n_bp USING (source)
    LEFT JOIN covered USING (source)
    ORDER BY source
"""


_Q143_ORACLE = """
    WITH base AS (
      SELECT source,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
      FROM documents
    ),
    uni AS (
      SELECT source, w, count(*) AS cnt
      FROM (SELECT source, unnest(arr) AS w FROM base)
      WHERE len(w) > 0 GROUP BY 1, 2
    ),
    ustats AS (
      SELECT source, count(*) AS distinct_unigrams,
             CAST(sum(cnt) AS BIGINT) AS n_unigrams
      FROM uni GROUP BY 1
    ),
    bi AS (
      SELECT source, g, count(*) AS cnt
      FROM (
        SELECT source,
               unnest(list_transform(range(1, len(arr)),
                      i -> concat_ws(' ', arr[i], arr[i+1]))) AS g
        FROM base WHERE len(arr) >= 2
      ) GROUP BY 1, 2
    ),
    bstats AS (
      SELECT source, count(*) AS distinct_bigrams,
             CAST(sum(cnt) AS BIGINT) AS n_bigrams
      FROM bi GROUP BY 1
    ),
    nd AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1)
    SELECT source, n_docs, n_unigrams, distinct_unigrams,
           round(1e-9 + distinct_unigrams / CAST(n_unigrams AS DOUBLE), 4)
             AS ttr_corpus,
           n_bigrams, distinct_bigrams,
           round(1e-9 + distinct_bigrams / CAST(n_bigrams AS DOUBLE), 4)
             AS distinct2
    FROM nd JOIN ustats USING (source) JOIN bstats USING (source)
    ORDER BY source
"""


def _q141_oracle() -> str:
    return (
        _bpe_oracle_ctes()
        + f""",
    wordmap AS (SELECT replace(ws, ' ', '') AS w,
                       len(string_split(ws, ' ')) AS n_syms
                FROM words{BPE_MERGES}),
    lwc AS (
      SELECT lang, w, count(*) AS cnt
      FROM (
        SELECT lang,
               unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
        FROM documents
      ) WHERE len(w) > 0
      GROUP BY 1, 2
    )
    SELECT lang,
           CAST(sum(cnt) AS BIGINT) AS n_words,
           CAST(sum(cnt * n_syms) AS BIGINT) AS n_tokens,
           round(1e-9 + sum(cnt * n_syms) / CAST(sum(cnt) AS DOUBLE), 4)
             AS fertility,
           round(1e-9 + sum(cnt * length(w))
                 / CAST(sum(cnt * n_syms) AS DOUBLE), 4)
             AS chars_per_token
    FROM lwc JOIN wordmap USING (w)
    GROUP BY lang ORDER BY lang"""
    )


def _q126_oracle() -> str:
    from ..functions.xsql import expand_u16, hash_u16

    return _Q126_ORACLE_TEMPLATE.format(
        U16=expand_u16(hash_u16("g", "dsir"), "duckdb"),
        B=DSIR_BUCKETS,
        BENCH=DECON_BENCH_SOURCE,
        K=DSIR_TOP_K,
    )


# --- q164: BM25 sparse retrieval (round 11) — the lexical top-k
# retrieval baseline a RAG / decontamination / eval-harness stack runs
# beside the dense ANN tier (q50/q55). Okapi BM25 (Robertson-Walker;
# the Lucene positive-idf form ln(1 + (N-df+.5)/(df+.5)) so scores
# never go negative on common terms).
#
# TERMS ARE WORD BIGRAMS, not unigrams: the synthetic corpus draws
# from a ~31-word vocabulary, so every unigram appears in most docs
# and carries no signal (measured: ZERO unigrams pass the df band at
# sf0.01) — while the ~900 bigrams distribute like real terms. A
# production corpus would run unigrams+bigrams; the term definition
# is one expression swap, the plan is identical.
#
# Query set: the deterministic doc_id % BM25_QUERY_MOD slice "asks"
# with its BM25_QUERY_TERMS most frequent eligible terms (tf desc,
# term asc — integer-deterministic in both engines). Term
# eligibility is the SCALE GUARD: a term must appear in >= BM25_DF_MIN
# docs (else it only finds the query doc itself) and its posting list
# is capped BOTH relatively (df * BM25_DF_CAP_DIV <= n_docs — the
# stop-word trick, integer arithmetic) and absolutely (df <=
# BM25_DF_CAP_ABS), so per-query candidate volume is bounded by
# TERMS x min(n/DIV, ABS) regardless of corpus size — the same
# df-cap family q104's PPJoin index uses. Plan shape: one corpus
# tokenize -> (doc, term) tf + doc-length aggs (map-side combined),
# a vocab-sized df agg, then the tiny query-term table BROADCASTS
# against the tf posting lists; per-query ranking windows run over
# the capped candidate sets only. No corpus-sized window, no
# all-pairs. The reference has no retrieval at all — north-star
# surface (BASELINE.json's LLM-pipeline requirements).
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 10
BM25_QUERY_MOD = 100
BM25_QUERY_TERMS = 6
BM25_DF_MIN = 2
BM25_DF_CAP_DIV = 20
BM25_DF_CAP_ABS = 1000


def bm25_stats(docs: DataFrame):
    """(tf, dlen, stats, dfreq) — the four BM25 index tables over a
    (doc_id, source, text) frame, bigram terms. ``tf`` carries
    ``source`` so callers can restrict query/candidate sides by feed
    (q172's cross-source decontamination) without a join-back."""
    toks = docs.select(
        "doc_id", "source", _tokens(F.col("text")).alias("arr")
    ).select("doc_id", "source", F.explode(_bigram_array()).alias("token"))
    tf = toks.groupBy("doc_id", "source", "token").agg(
        F.count("*").alias("cnt")
    )
    dlen = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dlen.agg(
        F.count("*").alias("_n_docs"), F.avg("dl").alias("_avgdl")
    )
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    return tf, dlen, stats, dfreq


# Session memo of the four BM25 index tables over the corpus — the
# in-session form of the PERSISTED index write_bm25_index builds
# (q171's deployment shape): q164/q172/q178 each rebuilt the posting
# lists per call, re-running the bigram explode + three aggregates a
# serving system reads from its index (r14; the token_state/
# simhash_state precedent applied to retrieval). Results are identical
# with or without a hit (same deterministic lineage); cold probes stay
# honest via clear_lp_cache's cascade.
_BM25_CACHE: dict = {}
_BM25_CACHE_MAX = 3


def clear_bm25_cache() -> None:
    from .sketches import _safe_unpersist

    for frames in _BM25_CACHE.values():
        for df in frames:
            _safe_unpersist(df)
    _BM25_CACHE.clear()


def bm25_state(spark: SparkSession, sf_dir: str):
    """Memoized persisted (tf, dlen, stats, dfreq) over the corpus —
    see _BM25_CACHE's comment."""
    from pyspark import StorageLevel

    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _BM25_CACHE.get(key)
    if hit is not None:
        return hit
    tf, dlen, stats, dfreq = bm25_stats(
        load_table(spark, sf_dir, "documents")
    )
    frames = tuple(
        df.persist(StorageLevel.MEMORY_AND_DISK)
        for df in (tf, dlen, stats, dfreq)
    )
    frames[0].count()  # materialize the shared explode once
    while len(_BM25_CACHE) >= _BM25_CACHE_MAX:
        from .sketches import _safe_unpersist as _su

        for df in _BM25_CACHE.pop(next(iter(_BM25_CACHE))):
            _su(df)
    _BM25_CACHE[key] = frames
    return frames


def bm25_query_terms(qtf: DataFrame, dfreq: DataFrame, stats: DataFrame):
    """Per-query eligible term table from the query docs' own
    (query_id, token, cnt) rows: df band applied (the scale guard —
    see q164's header comment), then the top BM25_QUERY_TERMS by
    (tf desc, token asc). The per-query window runs over the doc's
    own eligible vocabulary — bounded by doc length."""
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("cnt"), F.asc("token")
    )
    return (
        qtf.join(dfreq, "token")
        .crossJoin(F.broadcast(stats))
        .filter(
            (F.col("df") >= BM25_DF_MIN)
            & (F.col("df") * BM25_DF_CAP_DIV <= F.col("_n_docs"))
            & (F.col("df") <= BM25_DF_CAP_ABS)
        )
        .withColumn("qrk", F.row_number().over(wq))
        .filter(F.col("qrk") <= BM25_QUERY_TERMS)
        .select("query_id", "token", "df", "_n_docs", "_avgdl")
    )


def bm25_topk(
    qterms: DataFrame,
    tf: DataFrame,
    dlen: DataFrame,
    cand_filter=None,
) -> DataFrame:
    """Broadcast the tiny query-term table onto the posting lists,
    score with Okapi BM25, rank top BM25_TOP_K per query. Scores
    eround-ed to 6dp BEFORE ranking (doc_id tiebreak) so a
    cross-engine summation ulp can never flip a rank — the q151
    rank-key discipline."""
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = (
        idf
        * (F.col("cnt") * (BM25_K1 + 1.0))
        / (
            F.col("cnt")
            + BM25_K1
            * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("_avgdl"))
        )
    )
    cands = (
        F.broadcast(qterms)
        .join(tf, "token")
        .filter(F.col("doc_id") != F.col("query_id"))
    )
    if cand_filter is not None:
        cands = cands.filter(cand_filter)
    scored = (
        cands.join(dlen, "doc_id")
        .groupBy("query_id", "doc_id")
        .agg(eround(F.sum(contrib), 6).alias("score"))
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= BM25_TOP_K)
        .select("query_id", "rk", "doc_id", "score")
        .orderBy("query_id", "rk")
    )


def q164_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 BM25 results per query doc: (query_id, rk, doc_id,
    score) for the deterministic doc_id % BM25_QUERY_MOD query slice.
    Index tables come from the session memo since r14 (bm25_state) —
    the cold build is q171's row and the bm25_stats_* bench extras."""
    tf, dlen, stats, dfreq = bm25_state(spark, sf_dir)
    qtf = (
        tf.filter(F.col("doc_id") % BM25_QUERY_MOD == 0)
        .select(F.col("doc_id").alias("query_id"), "token", "cnt")
    )
    return bm25_topk(bm25_query_terms(qtf, dfreq, stats), tf, dlen)


# --- q171: persisted BM25 index + ingest-time retrieval (round 11) —
# the deployment shape of q164, the q118/q132 pattern applied to
# retrieval: the posting lists, doc lengths, document frequencies and
# corpus stats are PERSISTED tables (write_bm25_index — built once at
# index time), and retrieving for an incoming batch touches ONLY the
# batch's own text plus the index (bm25_from_index; the plan test
# pins that no corpus re-scan happens at ingest). The registry query
# replays the q164 query slice through the index path, and its oracle
# IS q164's full-scan SQL — a green driver row proves
# from-index == full-recompute, the q163 pinning trick.
def _staged_overwrite(
    spark: SparkSession, df: DataFrame, index_dir: str, table: str
) -> None:
    """Rewrite ``{index_dir}/{table}`` through a staging dir (never
    read-and-overwrite in one lineage), then drop the staging copy on
    local filesystems — the one definition of the dance the index
    maintainers share."""
    import shutil

    pending = f"{index_dir}/_{table}_pending"
    df.write.mode("overwrite").parquet(pending)
    spark.read.parquet(pending).write.mode("overwrite").parquet(
        f"{index_dir}/{table}"
    )
    if "://" not in pending:
        shutil.rmtree(pending, ignore_errors=True)


def _rebuild_bm25_derived(spark: SparkSession, index_dir: str) -> None:
    """Rebuild dlen/dfreq/stats from the persisted tf — the single
    source of truth. Idempotent: safe to run at any point, from any
    crash state."""
    tf = spark.read.parquet(f"{index_dir}/tf")
    _staged_overwrite(
        spark,
        tf.groupBy("doc_id").agg(F.sum("cnt").alias("dl")),
        index_dir,
        "dlen",
    )
    _staged_overwrite(
        spark,
        tf.groupBy("token").agg(F.count("*").alias("df")),
        index_dir,
        "dfreq",
    )
    _staged_overwrite(
        spark,
        spark.read.parquet(f"{index_dir}/dlen").agg(
            F.count("*").alias("_n_docs"), F.avg("dl").alias("_avgdl")
        ),
        index_dir,
        "stats",
    )


def write_bm25_index(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Initial index build. tf lands under a batch=-1 hive partition
    so later incremental batches (bm25_index_update) can claim their
    own idempotent partitions.

    The corpus is tokenized ONCE: only tf is computed from the text;
    dlen/dfreq/stats derive from the WRITTEN tf (dl == sum(cnt) — the
    same identity _rebuild_bm25_derived and the update path already
    rely on). The old shape wrote dlen and dfreq from the bm25_stats
    lineage, which re-ran the corpus explode per table (3 corpus
    passes); r14 A/B at sf0.1, interleaved min-of-3 inside q171:
    5.39 s -> 4.02 s (-25%)."""
    docs = load_table(spark, sf_dir, "documents")
    tf, _dlen, _stats, _dfreq = bm25_stats(docs)
    tf.write.mode("overwrite").parquet(f"{path}/tf/batch=-1")
    tfp = spark.read.parquet(f"{path}/tf")
    tfp.groupBy("doc_id").agg(F.sum("cnt").alias("dl")).write.mode(
        "overwrite"
    ).parquet(f"{path}/dlen")
    tfp.groupBy("token").agg(F.count("*").alias("df")).write.mode(
        "overwrite"
    ).parquet(f"{path}/dfreq")
    spark.read.parquet(f"{path}/dlen").agg(
        F.count("*").alias("_n_docs"), F.avg("dl").alias("_avgdl")
    ).write.mode("overwrite").parquet(f"{path}/stats")


def bm25_index_update(
    spark: SparkSession, index_dir: str, batch_df: DataFrame,
    batch_id: int = 0,
) -> None:
    """Incremental index maintenance — the q118/q163 evolving-state
    pattern applied to retrieval: a batch of new documents lands in
    the persisted BM25 index WITHOUT re-reading the corpus. Because
    every table lands exactly as a full rebuild would compute it,
    retrieval through the updated index EQUALS retrieval through a
    from-scratch rebuild — pinned row-for-row by
    test_bm25_index_update_equals_rebuild (existing docs' scores
    legitimately shift as df/avgdl move; the parity is
    index-vs-rebuilt, not score stability).

    CRASH-SAFE BY CONSTRUCTION (hardened after the round-11 review
    found the append+anti-join protocol had silently-corrupting replay
    windows): the batch's tf rows land as an idempotent OVERWRITE of
    their own hive partition (tf/batch={batch_id} — a replayed
    micro-batch rewrites the identical partition, the
    run_foreach_batch_parquet sink trick applied to state), docs
    re-sent under a DIFFERENT batch id are dropped by an anti-join
    against the other partitions' doc_ids, and the three derived
    tables are rebuilt from the persisted tf afterwards
    (_rebuild_bm25_derived — idempotent from any crash point; a death
    between the tf write and the rebuild is healed by the replay's own
    rebuild, pinned by test_bm25_repair_after_crash). The price of
    exactness under at-least-once replay is that the derived rebuild
    aggregates the whole tf per batch — a lake with transactional
    tables (Delta/Iceberg MERGE) pays an incremental merge instead;
    repair_bm25_index exposes the same rebuild for manual recovery."""
    tf_all = spark.read.parquet(f"{index_dir}/tf")
    indexed_other = (
        tf_all.filter(F.col("batch") != batch_id)
        .select("doc_id")
        .distinct()
    )
    fresh = batch_df.join(indexed_other, "doc_id", "anti")
    tf_new, _dlen, _stats, _dfreq = bm25_stats(fresh)
    tf_new.write.mode("overwrite").parquet(
        f"{index_dir}/tf/batch={batch_id}"
    )
    _rebuild_bm25_derived(spark, index_dir)


def repair_bm25_index(spark: SparkSession, index_dir: str) -> None:
    """Manual recovery surface: rebuild every derived table from the
    persisted tf partitions. With batch-keyed tf overwrites duplicates
    are structurally impossible, so repair == derived rebuild — after
    it, retrieval equals a from-scratch rebuild
    (test_bm25_repair_after_crash)."""
    _rebuild_bm25_derived(spark, index_dir)


def bm25_from_index(
    spark: SparkSession, index_dir: str, new_docs: DataFrame
) -> DataFrame:
    """Top-k BM25 for a batch of incoming documents against the
    persisted index. The batch side is tokenized here; everything
    corpus-sized is a parquet read of the index."""
    tf = spark.read.parquet(f"{index_dir}/tf")
    dlen = spark.read.parquet(f"{index_dir}/dlen")
    stats = spark.read.parquet(f"{index_dir}/stats")
    dfreq = spark.read.parquet(f"{index_dir}/dfreq")
    qtoks = new_docs.select(
        F.col("doc_id").alias("query_id"), _tokens(F.col("text")).alias("arr")
    ).select("query_id", F.explode(_bigram_array()).alias("token"))
    qtf = qtoks.groupBy("query_id", "token").agg(F.count("*").alias("cnt"))
    return bm25_topk(bm25_query_terms(qtf, dfreq, stats), tf, dlen)


def q171_bm25_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q164's query slice retrieved THROUGH the persisted-index path
    (index rebuilt under a temp dir per call so the gate replays the
    whole lineage; a deployment calls write_bm25_index once and
    serves every batch from it — test_bm25_index_only_ingest proves
    the ingest plan never rescans the corpus)."""
    import tempfile

    path = tempfile.mkdtemp(prefix="sdps_bm25_index_")
    write_bm25_index(spark, sf_dir, path)
    new_docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % BM25_QUERY_MOD == 0
    )
    return bm25_from_index(spark, path, new_docs)


# --- q172: retrieval-based decontamination report (round 11) — the
# complement of q105's exact n-gram overlap: real eval suites also
# hunt NEAR-verbatim leakage with a retriever (lexical BM25 is the
# standard first pass). Every benchmark doc (source ==
# DECON_BENCH_SOURCE, the held-out suite q105/q126/q160 share)
# queries the TRAIN side (bench-source candidates excluded via the
# source column bm25_stats carries — no join-back), and the top-k
# hits aggregate into the per-train-source exposure table a
# decontamination pass triages: which feeds contain the documents
# most retrievable from benchmark prompts. Same bounded plan as
# q164: df-capped query terms broadcast onto posting lists; the
# report agg is |sources|-keyed.
def q172_retrieval_decon(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf, dlen, stats, dfreq = bm25_state(spark, sf_dir)
    qtf = tf.filter(F.col("source") == DECON_BENCH_SOURCE).select(
        F.col("doc_id").alias("query_id"), "token", "cnt"
    )
    hits = bm25_topk(
        bm25_query_terms(qtf, dfreq, stats),
        tf,
        dlen,
        cand_filter=F.col("source") != DECON_BENCH_SOURCE,
    )
    src = tf.select("doc_id", "source").distinct()
    return (
        hits.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_hits"),
            F.countDistinct("query_id").alias("n_queries_hit"),
            eround(F.avg("score"), 4).alias("avg_score"),
        )
        .orderBy("source")
    )


_Q164_ORACLE = f"""
    WITH arrs AS (
      SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
      FROM documents
    ),
    toks AS MATERIALIZED (
      SELECT doc_id,
             unnest(list_transform(range(1, len(arr)),
                                   i -> concat_ws(' ', arr[i], arr[i+1])))
               AS token
      FROM arrs
    ),
    tf AS MATERIALIZED (
      SELECT doc_id, token, count(*) AS cnt
      FROM toks GROUP BY doc_id, token
    ),
    dlen AS MATERIALIZED (
      SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
    ),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dlen),
    dfreq AS MATERIALIZED (
      SELECT token, count(*) AS df FROM tf GROUP BY token
    ),
    qt AS (
      SELECT t.doc_id AS query_id, t.token, f.df, s.n_docs, s.avgdl,
             row_number() OVER (
               PARTITION BY t.doc_id ORDER BY t.cnt DESC, t.token ASC
             ) AS qrk
      FROM tf t JOIN dfreq f USING (token) CROSS JOIN stats s
      WHERE t.doc_id % {BM25_QUERY_MOD} = 0
        AND f.df >= {BM25_DF_MIN}
        AND f.df * {BM25_DF_CAP_DIV} <= s.n_docs
        AND f.df <= {BM25_DF_CAP_ABS}
    ),
    qterms AS (
      SELECT query_id, token, df, n_docs, avgdl FROM qt
      WHERE qrk <= {BM25_QUERY_TERMS}
    ),
    scored AS (
      SELECT q.query_id, t.doc_id,
             round(sum(
               ln(1 + (q.n_docs - q.df + 0.5) / (q.df + 0.5))
               * (t.cnt * ({BM25_K1} + 1.0))
               / (t.cnt + {BM25_K1}
                  * (1.0 - {BM25_B} + {BM25_B} * l.dl / q.avgdl))
             ), 6) AS score
      FROM qterms q
      JOIN tf t USING (token)
      JOIN dlen l ON l.doc_id = t.doc_id
      WHERE t.doc_id <> q.query_id
      GROUP BY q.query_id, t.doc_id
    )
    SELECT query_id, rk, doc_id, score FROM (
      SELECT query_id, doc_id, score,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id ASC
             ) AS INTEGER) AS rk
      FROM scored
    ) WHERE rk <= {BM25_TOP_K}
    ORDER BY query_id, rk
"""


# --- q169: per-source dataset card (round 11) — the one-stop
# governance summary a dataset release ships (Datasheets for Datasets
# / model-card practice): per source, volume (docs, tokens), length
# shape (mean / exact p50 / p90 — `percentile` ↔ DuckDB
# `quantile_cont`, same interpolation, the q111 pairing; at 100 TB
# you'd swap approx_percentile into the same plan — the swap's rank
# error and wall-clock are measured, not assumed: q201 + SCALING
# pctl_ab), language makeup
# (count + dominant language via the q144 two-pass argmax — max
# count, then min lang, window-free and tie-deterministic), lexical
# health (mean within-doc TTR), and the exact-duplicate share
# (q45's normalized-text md5, counted with the TWO-LEVEL distinct
# pattern — (source, hash) pre-agg then count — never countDistinct
# on a skewed corpus column). Three |sources|-row aggregates joined;
# the corpus is scanned once per signal family.
def q169_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    norm = F.regexp_replace(
        F.lower(F.trim(F.col("text"))), F.lit(r"\s+"), F.lit(" ")
    )
    base = docs.select(
        "source",
        "lang",
        F.size(toks).alias("n_tok"),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("ttr"),
        F.md5(norm).alias("h"),
    )
    per_src = base.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        eround(F.avg("n_tok"), 4).alias("avg_tokens"),
        eround(F.expr("percentile(n_tok, 0.5)"), 4).alias("p50_tokens"),
        eround(F.expr("percentile(n_tok, 0.9)"), 4).alias("p90_tokens"),
        eround(F.avg("ttr"), 4).alias("avg_ttr"),
    )
    uniq = (
        base.groupBy("source", "h")
        .agg(F.count("*").alias("c"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_unique"),
            F.sum("c").alias("_n"),
        )
        .select(
            "source",
            eround(1.0 - F.col("n_unique") / F.col("_n"), 4).alias(
                "dup_share"
            ),
        )
    )
    lc = base.groupBy("source", "lang").agg(F.count("*").alias("c"))
    lmax = lc.groupBy("source").agg(
        F.count("*").alias("n_langs"), F.max("c").alias("cmax")
    )
    top_lang = (
        lc.join(lmax, "source")
        .filter(F.col("c") == F.col("cmax"))
        .groupBy("source", "n_langs")
        .agg(F.min("lang").alias("top_lang"))
    )
    return (
        per_src.join(uniq, "source")
        .join(top_lang, "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "avg_tokens",
            "p50_tokens",
            "p90_tokens",
            "avg_ttr",
            "dup_share",
            "n_langs",
            "top_lang",
        )
        .orderBy("source")
    )


_Q169_ORACLE = """
    WITH base AS (
      SELECT source, lang,
             len(regexp_split_to_array(lower(trim(text)), '\\s+'))
               AS n_tok,
             len(list_distinct(regexp_split_to_array(
               lower(trim(text)), '\\s+')))
               / CAST(len(regexp_split_to_array(
                   lower(trim(text)), '\\s+')) AS DOUBLE) AS ttr,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS h
      FROM documents
    ),
    per_src AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             round(avg(n_tok), 4) AS avg_tokens,
             round(quantile_cont(n_tok, 0.5), 4) AS p50_tokens,
             round(quantile_cont(n_tok, 0.9), 4) AS p90_tokens,
             round(avg(ttr), 4) AS avg_ttr
      FROM base GROUP BY source
    ),
    uniq AS (
      SELECT source,
             round(1.0 - count(*) / CAST(sum(c) AS DOUBLE), 4)
               AS dup_share
      FROM (SELECT source, h, count(*) AS c FROM base GROUP BY 1, 2)
      GROUP BY source
    ),
    lc AS (SELECT source, lang, count(*) AS c FROM base GROUP BY 1, 2),
    lmax AS (
      SELECT source, count(*) AS n_langs, max(c) AS cmax
      FROM lc GROUP BY source
    ),
    top_lang AS (
      SELECT lc.source, lmax.n_langs, min(lc.lang) AS top_lang
      FROM lc JOIN lmax ON lc.source = lmax.source AND lc.c = lmax.cmax
      GROUP BY lc.source, lmax.n_langs
    )
    SELECT p.source, p.n_docs, p.n_tokens, p.avg_tokens, p.p50_tokens,
           p.p90_tokens, p.avg_ttr, u.dup_share, t.n_langs, t.top_lang
    FROM per_src p
    JOIN uniq u ON u.source = p.source
    JOIN top_lang t ON t.source = p.source
    ORDER BY p.source
"""


_Q172_ORACLE = f"""
    WITH arrs AS (
      SELECT doc_id, source,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
      FROM documents
    ),
    toks AS MATERIALIZED (
      SELECT doc_id, source,
             unnest(list_transform(range(1, len(arr)),
                                   i -> concat_ws(' ', arr[i], arr[i+1])))
               AS token
      FROM arrs
    ),
    tf AS MATERIALIZED (
      SELECT doc_id, source, token, count(*) AS cnt
      FROM toks GROUP BY doc_id, source, token
    ),
    dlen AS MATERIALIZED (
      SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
    ),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dlen),
    dfreq AS MATERIALIZED (
      SELECT token, count(*) AS df FROM tf GROUP BY token
    ),
    qt AS (
      SELECT t.doc_id AS query_id, t.token, f.df, s.n_docs, s.avgdl,
             row_number() OVER (
               PARTITION BY t.doc_id ORDER BY t.cnt DESC, t.token ASC
             ) AS qrk
      FROM tf t JOIN dfreq f USING (token) CROSS JOIN stats s
      WHERE t.source = '{DECON_BENCH_SOURCE}'
        AND f.df >= {BM25_DF_MIN}
        AND f.df * {BM25_DF_CAP_DIV} <= s.n_docs
        AND f.df <= {BM25_DF_CAP_ABS}
    ),
    qterms AS (
      SELECT query_id, token, df, n_docs, avgdl FROM qt
      WHERE qrk <= {BM25_QUERY_TERMS}
    ),
    scored AS (
      SELECT q.query_id, t.doc_id,
             round(sum(
               ln(1 + (q.n_docs - q.df + 0.5) / (q.df + 0.5))
               * (t.cnt * ({BM25_K1} + 1.0))
               / (t.cnt + {BM25_K1}
                  * (1.0 - {BM25_B} + {BM25_B} * l.dl / q.avgdl))
             ), 6) AS score
      FROM qterms q
      JOIN tf t USING (token)
      JOIN dlen l ON l.doc_id = t.doc_id
      WHERE t.doc_id <> q.query_id
        AND t.source <> '{DECON_BENCH_SOURCE}'
      GROUP BY q.query_id, t.doc_id
    ),
    topk AS (
      SELECT query_id, doc_id, score FROM (
        SELECT query_id, doc_id, score,
               row_number() OVER (
                 PARTITION BY query_id ORDER BY score DESC, doc_id ASC
               ) AS rk
        FROM scored
      ) WHERE rk <= {BM25_TOP_K}
    ),
    src AS (SELECT DISTINCT doc_id, source FROM tf)
    SELECT s.source, count(*) AS n_hits,
           CAST(count(DISTINCT t.query_id) AS BIGINT) AS n_queries_hit,
           round(avg(t.score), 4) AS avg_score
    FROM topk t JOIN src s USING (doc_id)
    GROUP BY s.source ORDER BY s.source
"""


# --- q178: hybrid retrieval fusion (round 11) — Reciprocal Rank
# Fusion (Cormack, Clarke & Buettcher, SIGIR 2009): the standard way
# production retrieval stacks combine a LEXICAL ranker (BM25, q164's
# core) with a DENSE ranker (embedding cosine, q50's exact top-k)
# without score calibration — rrf(d) = Σ_s 1/(K0 + rank_s(d)), rank
# only, so the two systems' incomparable score scales never touch.
# Anchors are the N_QUERIES demo vectors (vec_id < 10), with the
# row-aligned corpus convention vec_id == doc_id (documents and
# embeddings are parallel synthetic corpora, 0..n-1 at every sf —
# asserted by test_hybrid_rrf_planted's two-table fixture). Plan
# shape: the dense arm is q50's bounded broadcast-probe scan (at
# 100 TB swap q55's IVF in — same (query_id, doc_id, rank) contract),
# the lexical arm is the df-capped BM25 posting join; the fusion
# itself is a full-outer join of two ≤ N_QUERIES·K-row ranked lists —
# corpus-independent. rrf is eround-ed to 6dp BEFORE the fused rank
# (doc_id tiebreak), the q151/q164 rank-key discipline.
RRF_K0 = 60


def hybrid_rrf_core(
    spark: SparkSession, sf_dir: str, dense: DataFrame
) -> DataFrame:
    """RRF fusion over any dense arm honoring the (query_id, doc_id,
    dense_rk) contract — q178 passes q50's exact ranking,
    hybrid_rrf_ivf passes ivf_knn's (the 100 TB swap; at full probe
    count the two are pinned equal by test)."""
    from .similarity import N_QUERIES

    tf, dlen, stats, dfreq = bm25_state(spark, sf_dir)
    qtf = tf.filter(F.col("doc_id") < N_QUERIES).select(
        F.col("doc_id").alias("query_id"), "token", "cnt"
    )
    lex = bm25_topk(bm25_query_terms(qtf, dfreq, stats), tf, dlen).select(
        "query_id", "doc_id", F.col("rk").alias("lex_rk")
    )
    rrf = eround(
        F.coalesce(
            F.lit(1.0) / (F.lit(RRF_K0) + F.col("dense_rk")), F.lit(0.0)
        )
        + F.coalesce(
            F.lit(1.0) / (F.lit(RRF_K0) + F.col("lex_rk")), F.lit(0.0)
        ),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf"), F.asc("doc_id")
    )
    return (
        dense.join(lex, ["query_id", "doc_id"], "full_outer")
        .withColumn("rrf", rrf)
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .select("query_id", "rk", "doc_id", "rrf", "dense_rk", "lex_rk")
        .orderBy("query_id", "rk")
    )


def q178_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import q50_knn_bruteforce

    dense = q50_knn_bruteforce(spark, sf_dir).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rk").alias("dense_rk"),
    )
    return hybrid_rrf_core(spark, sf_dir, dense)


def hybrid_rrf_ivf(
    spark: SparkSession, sf_dir: str, n_probe: int | None = None
) -> DataFrame:
    """q178 with the IVF dense arm — the stated 100 TB shape. At
    n_probe = |labels| (full scan) the fused table provably equals
    q178 (pinned by test); at serving probe counts the lexical arm is
    untouched and only the dense member list narrows."""
    from .similarity import N_PROBE, ivf_knn

    dense = ivf_knn(
        spark, sf_dir, n_probe if n_probe is not None else N_PROBE
    ).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rk").alias("dense_rk"),
    )
    return hybrid_rrf_core(spark, sf_dir, dense)


def _q178_oracle() -> str:
    from .similarity import N_QUERIES, TOP_K, _COSINE_SQL

    cosine_sql = _COSINE_SQL.format(nq=N_QUERIES)
    return f"""
    WITH dense_scored AS ({cosine_sql}),
    dense AS (
      SELECT query_id, doc_id, dense_rk FROM (
        SELECT query_id, neighbor_id AS doc_id,
               CAST(row_number() OVER (
                 PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
               ) AS INTEGER) AS dense_rk
        FROM dense_scored
      ) WHERE dense_rk <= {TOP_K}
    ),
    arrs AS (
      SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
      FROM documents
    ),
    toks AS MATERIALIZED (
      SELECT doc_id,
             unnest(list_transform(range(1, len(arr)),
                                   i -> concat_ws(' ', arr[i], arr[i+1])))
               AS token
      FROM arrs
    ),
    tf AS MATERIALIZED (
      SELECT doc_id, token, count(*) AS cnt
      FROM toks GROUP BY doc_id, token
    ),
    dlen AS MATERIALIZED (
      SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
    ),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dlen),
    dfreq AS MATERIALIZED (
      SELECT token, count(*) AS df FROM tf GROUP BY token
    ),
    qt AS (
      SELECT t.doc_id AS query_id, t.token, f.df, s.n_docs, s.avgdl,
             row_number() OVER (
               PARTITION BY t.doc_id ORDER BY t.cnt DESC, t.token ASC
             ) AS qrk
      FROM tf t JOIN dfreq f USING (token) CROSS JOIN stats s
      WHERE t.doc_id < {N_QUERIES}
        AND f.df >= {BM25_DF_MIN}
        AND f.df * {BM25_DF_CAP_DIV} <= s.n_docs
        AND f.df <= {BM25_DF_CAP_ABS}
    ),
    qterms AS (
      SELECT query_id, token, df, n_docs, avgdl FROM qt
      WHERE qrk <= {BM25_QUERY_TERMS}
    ),
    lex_scored AS (
      SELECT q.query_id, t.doc_id,
             round(sum(
               ln(1 + (q.n_docs - q.df + 0.5) / (q.df + 0.5))
               * (t.cnt * ({BM25_K1} + 1.0))
               / (t.cnt + {BM25_K1}
                  * (1.0 - {BM25_B} + {BM25_B} * l.dl / q.avgdl))
             ), 6) AS score
      FROM qterms q
      JOIN tf t USING (token)
      JOIN dlen l ON l.doc_id = t.doc_id
      WHERE t.doc_id <> q.query_id
      GROUP BY q.query_id, t.doc_id
    ),
    lex AS (
      SELECT query_id, doc_id, lex_rk FROM (
        SELECT query_id, doc_id,
               CAST(row_number() OVER (
                 PARTITION BY query_id ORDER BY score DESC, doc_id ASC
               ) AS INTEGER) AS lex_rk
        FROM lex_scored
      ) WHERE lex_rk <= {BM25_TOP_K}
    ),
    fused AS (
      SELECT coalesce(d.query_id, l.query_id) AS query_id,
             coalesce(d.doc_id, l.doc_id) AS doc_id,
             round(coalesce(1.0 / ({RRF_K0} + d.dense_rk), 0.0)
                 + coalesce(1.0 / ({RRF_K0} + l.lex_rk), 0.0), 6) AS rrf,
             d.dense_rk, l.lex_rk
      FROM dense d FULL OUTER JOIN lex l
        ON d.query_id = l.query_id AND d.doc_id = l.doc_id
    )
    SELECT query_id,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY rrf DESC, doc_id ASC
           ) AS INTEGER) AS rk,
           doc_id, rrf, dense_rk, lex_rk
    FROM fused
    ORDER BY query_id, rk
"""


# --- q179: quality-classifier training-set export (round 11) — the
# labeled table a CCNet / GPT-3-style quality classifier trains on
# (Wenzek et al. 2020; Brown et al. 2020 App. A): POSITIVES are every
# doc of the curated reference feed (DECON_BENCH_SOURCE — the same
# held-out suite q105/q160/q172 treat as the trusted side), NEGATIVES
# a deterministic counter-mode-md5 sample of the remaining corpus at
# 1/QCLF_NEG_ODDS (the curated feed is 1 source in 20, so 1/19 of the
# rest ≈ class balance — and the export stays bounded at ~2x the
# curated feed's size at ANY corpus scale; the hash sample is the q96
# engine-portable u16 trick, never rand()). Features are the cheap
# expression-only signals the quality tier already computes (q42's
# family): token count, type-token ratio, mean token length, an
# is-English indicator. The actual FIT is functions/classifier.py's
# train_logreg — one distributed aggregate per gradient step over this
# bounded export (the q56 iterate-by-agg pattern, supervised), with
# scoring a pure narrow projection over the full corpus. Plan: one
# corpus scan, two pushed filters, no join, no window.
# --- compression-ratio quality signal (round 11) — the zlib/gzip
# heuristic production filters use (Gopher's quality rules, RefinedWeb
# / FineWeb reimplementations): highly repetitive or templated text
# compresses far better than organic prose, so compressed_size /
# raw_size is a one-number repetition-and-entropy proxy that needs no
# model. No JVM builtin exposes DEFLATE, so this is a sanctioned
# Arrow-edge pass (UDF_NOTES policy: Python only at codec boundaries —
# the multimodal decode class): one mapInPandas over (doc_id, source,
# text), stdlib zlib level 6, pure projection — no shuffle. Not a
# registry query: DuckDB has no zlib, so there is no SQL oracle to
# hash against; semantics are pinned by the planted test (repetitive
# text ratio << shuffled-unique text ratio, identical text → identical
# ratio) and determinism across partitionings.
def compression_signal(docs: DataFrame) -> DataFrame:
    """(doc_id, source, n_bytes, z_bytes, ratio) per doc; ratio =
    deflate(level 6) size over raw utf-8 size, 4dp."""
    import zlib

    import pandas as pd

    def _batches(it):
        for pdf in it:
            if not len(pdf):
                continue
            raw = [t.encode("utf-8") for t in pdf["text"]]
            z = [len(zlib.compress(b, 6)) for b in raw]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "n_bytes": [len(b) for b in raw],
                    "z_bytes": z,
                }
            )

    out = docs.select("doc_id", "source", "text").mapInPandas(
        _batches,
        "doc_id long, source string, n_bytes long, z_bytes long",
    )
    return out.withColumn(
        "ratio",
        eround(F.col("z_bytes") / F.col("n_bytes").cast("double"), 4),
    )


# --- q181: DoReMi-lite mixture reweighting (round 11) — Xie et al.
# 2023 ("DoReMi: Optimizing Data Mixtures Speeds Up Language Model
# Pretraining") reweights domains by EXCESS LOSS under exponentiated
# gradient ascent. This is the one-shot "lite" step a pipeline runs
# from signals it already has: loss proxy = per-source mean per-token
# NLL under the corpus-fit bigram LM (q109/q149's model — ln(ppl) is
# exactly the per-doc mean NLL), reference = the token-weighted corpus
# mean (DoReMi proper trains a reference model; stated honestly),
# excess clipped at 0 (only HARD domains get upweighted), weight ∝
# token_share · exp(η · excess), normalized. Output is the mixture
# decision table next to q173's temperature sweep: per source, token
# share, loss, excess, reweighted weight, boost over proportional.
# Plan shape: q109's ppl chain (broadcast model tables), one
# |sources|-row agg, two 1-row broadcast scalars — nothing new
# corpus-scaling. Boundary discipline: the greatest(·,0) cut and all
# ratios land on eround-ed 4dp values; a cross-engine summation ulp
# inside exp() is ~1e-16 of the weight, far under the 4dp grid.
DOREMI_ETA = 1.0


def q181_doremi_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_doc = doc_perplexity(docs)
    ntok = docs.select(
        "doc_id", F.size(_tokens(F.col("text"))).alias("n_tok")
    )
    src = (
        per_doc.join(ntok, "doc_id")
        .groupBy("source")
        .agg(
            F.sum("n_tok").alias("n_tokens"),
            F.avg(F.log("ppl")).alias("_loss"),
        )
    )
    tot = src.agg(
        F.sum("n_tokens").alias("_tot_tok"),
        (
            F.sum(F.col("_loss") * F.col("n_tokens")) / F.sum("n_tokens")
        ).alias("_ref_loss"),
    )
    share = F.col("n_tokens") / F.col("_tot_tok").cast("double")
    excess = F.greatest(F.col("_loss") - F.col("_ref_loss"), F.lit(0.0))
    w = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        share.alias("_share"),
        F.col("_loss").alias("_l"),
        excess.alias("_excess"),
        (share * F.exp(F.lit(DOREMI_ETA) * excess)).alias("_uw"),
    )
    z = w.agg(F.sum("_uw").alias("_z"))
    return (
        w.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_tokens",
            eround("_share", 4).alias("token_share"),
            eround("_l", 4).alias("loss"),
            eround("_excess", 4).alias("excess"),
            eround(F.col("_uw") / F.col("_z"), 4).alias("weight"),
            eround(
                (F.col("_uw") / F.col("_z")) / F.col("_share"), 4
            ).alias("boost"),
        )
        .orderBy("source")
    )


QCLF_NEG_ODDS = 19
QCLF_FEATURES = ["n_tokens", "distinct_ratio", "avg_token_len", "is_en"]


def quality_features(docs: DataFrame) -> DataFrame:
    """Per-doc classifier features (QCLF_FEATURES) + the sampling u16 —
    the SAME projection serves training-set export (q179) and the
    corpus-sized scoring path (classifier.score_expr over this frame):
    one narrow expression-only select, no shuffle."""
    from ..functions.xsql import expand_u16, hash_u16

    u16 = F.expr(
        expand_u16(hash_u16("CAST(doc_id AS STRING)", "qclf"), "spark")
    )
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks)
    nospace = F.length(
        F.replace(F.lower(F.trim(F.col("text"))), F.lit(" "), F.lit(""))
    )
    return docs.select(
        "doc_id",
        "source",
        n_tokens.cast("bigint").alias("n_tokens"),
        eround(
            F.size(F.array_distinct(toks)).cast("double") / n_tokens, 6
        ).alias("distinct_ratio"),
        eround(nospace.cast("double") / n_tokens, 6).alias("avg_token_len"),
        (F.col("lang") == "en").cast("int").alias("is_en"),
        u16.alias("_u"),
    )


def q179_quality_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = quality_features(load_table(spark, sf_dir, "documents"))
    pos = feats.filter(F.col("source") == DECON_BENCH_SOURCE).withColumn(
        "label", F.lit(1)
    )
    neg = feats.filter(
        (F.col("source") != DECON_BENCH_SOURCE)
        & (F.col("_u") * QCLF_NEG_ODDS < 65536)
    ).withColumn("label", F.lit(0))
    return (
        pos.unionByName(neg)
        .select(
            "doc_id",
            "label",
            "n_tokens",
            "distinct_ratio",
            "avg_token_len",
            "is_en",
        )
        .orderBy("doc_id")
    )


def _q179_oracle() -> str:
    from ..functions.xsql import expand_u16, hash_u16

    u16 = expand_u16(hash_u16("CAST(doc_id AS STRING)", "qclf"), "duckdb")
    return f"""
    WITH t AS (
      SELECT doc_id, source, lang,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS arr,
             length(replace(lower(trim(text)), ' ', '')) AS nsl
      FROM documents
    ),
    f AS (
      SELECT doc_id, source,
             CAST(len(arr) AS BIGINT) AS n_tokens,
             round(CAST(len(list_distinct(arr)) AS DOUBLE) / len(arr), 6)
               AS distinct_ratio,
             round(CAST(nsl AS DOUBLE) / len(arr), 6) AS avg_token_len,
             CAST(lang = 'en' AS INTEGER) AS is_en,
             {u16} AS u
      FROM t
    )
    SELECT doc_id, CAST(1 AS INTEGER) AS label,
           n_tokens, distinct_ratio, avg_token_len, is_en
    FROM f WHERE source = '{DECON_BENCH_SOURCE}'
    UNION ALL
    SELECT doc_id, CAST(0 AS INTEGER) AS label,
           n_tokens, distinct_ratio, avg_token_len, is_en
    FROM f WHERE source <> '{DECON_BENCH_SOURCE}'
      AND u * {QCLF_NEG_ODDS} < 65536
    ORDER BY doc_id
"""


def _q181_oracle() -> str:
    return f"""
    WITH {_PPL_PER_DOC_SQL},
    ntok AS (SELECT doc_id, len(arr) AS n_tok FROM base),
    src AS (
      SELECT p.source, CAST(sum(t.n_tok) AS BIGINT) AS n_tokens,
             avg(ln(p.ppl)) AS loss
      FROM per_doc p JOIN ntok t USING (doc_id)
      GROUP BY p.source
    ),
    tot AS (
      SELECT sum(n_tokens) AS tot_tok,
             sum(loss * n_tokens) / sum(n_tokens) AS ref_loss
      FROM src
    ),
    w AS (
      SELECT s.source, s.n_tokens,
             s.n_tokens / CAST(t.tot_tok AS DOUBLE) AS share,
             s.loss,
             greatest(s.loss - t.ref_loss, 0.0) AS excess,
             (s.n_tokens / CAST(t.tot_tok AS DOUBLE))
               * exp({DOREMI_ETA} * greatest(s.loss - t.ref_loss, 0.0))
               AS uw
      FROM src s CROSS JOIN tot t
    ),
    z AS (SELECT sum(uw) AS z FROM w)
    SELECT source, n_tokens,
           round(share, 4) AS token_share,
           round(loss, 4) AS loss,
           round(excess, 4) AS excess,
           round(uw / z.z, 4) AS weight,
           round((uw / z.z) / share, 4) AS boost
    FROM w CROSS JOIN z
    ORDER BY source
"""


def write_dataset_cards(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """Materialize q169's per-source dataset cards as one markdown file
    per source (the publishable artifact a dataset release ships; q169
    computes the numbers, this renders them). Rendering is a pure
    column expression over the |sources|-row card table; files land via
    the S9 one-file-per-row sink — no driver-side loop."""
    from ..sources.renditions import write_files_per_row

    card = q169_dataset_card(spark, sf_dir)
    md = F.concat(
        F.lit("# Dataset card: "), F.col("source"), F.lit("\n\n"),
        F.lit("| metric | value |\n|---|---|\n"),
        F.lit("| documents | "), F.col("n_docs").cast("string"), F.lit(" |\n"),
        F.lit("| tokens | "), F.col("n_tokens").cast("string"), F.lit(" |\n"),
        F.lit("| avg tokens/doc | "), F.col("avg_tokens").cast("string"),
        F.lit(" |\n"),
        F.lit("| p50 tokens | "), F.col("p50_tokens").cast("string"),
        F.lit(" |\n"),
        F.lit("| p90 tokens | "), F.col("p90_tokens").cast("string"),
        F.lit(" |\n"),
        F.lit("| avg type-token ratio | "), F.col("avg_ttr").cast("string"),
        F.lit(" |\n"),
        F.lit("| exact-dup share | "), F.col("dup_share").cast("string"),
        F.lit(" |\n"),
        F.lit("| languages | "), F.col("n_langs").cast("string"), F.lit(" |\n"),
        F.lit("| top language | "), F.col("top_lang"), F.lit(" |\n"),
    )
    write_files_per_row(
        card.select(
            F.concat(F.col("source"), F.lit(".md")).alias("filename"),
            md.alias("data"),
        ),
        out_dir,
    )


# --- q190: per-source quality-threshold calibration (round 11,
# session 2) — the fairness table behind a corpus-wide quality cut:
# quality scores are NOT comparable across sources (a source whose
# style runs low-diversity would be wiped out by a global cutoff), so
# real pipelines calibrate per-domain percentiles (CCNet's
# per-language-bucket perplexity split is this move). Per source: the
# LOCAL p10 threshold of the q42 diversity score, docs dropped under
# it, and — side by side — docs the GLOBAL p10 would drop, so the
# imbalance a global cut causes is visible per source. Scale shape:
# q111's two-pass class — pass 1 computes the per-doc score and the
# percentile aggregates (|sources| keys + one 1-row global, both
# broadcast back), pass 2 is one conditional agg; exact `percentile`
# ↔ quantile_cont (approx_percentile is the 100 TB drop-in — its
# rank-error bound and cost measured by q201 + SCALING pctl_ab). The
# score is a ratio of integers (identical doubles on both engines), so
# the `<` threshold comparisons have no cross-engine knife edge.
QUALITY_DROP_Q = 0.10


def q190_calibrated_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    score = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    per_doc = docs.select("source", score.alias("score"))
    loc = per_doc.groupBy("source").agg(
        F.expr(f"percentile(score, {QUALITY_DROP_Q}D)").alias("thr_local")
    )
    glob = per_doc.agg(
        F.expr(f"percentile(score, {QUALITY_DROP_Q}D)").alias("thr_global")
    )
    return (
        per_doc.join(F.broadcast(loc), "source")
        .crossJoin(F.broadcast(glob))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            eround(1e-9 + F.first("thr_local"), 6).alias("thr_local"),
            F.sum(
                F.when(F.col("score") < F.col("thr_local"), 1).otherwise(0)
            ).alias("n_drop_local"),
            F.sum(
                F.when(F.col("score") < F.col("thr_global"), 1).otherwise(0)
            ).alias("n_drop_global"),
        )
        .select(
            "source",
            "n_docs",
            "thr_local",
            "n_drop_local",
            "n_drop_global",
            eround(
                1e-9 + F.col("n_drop_local") / F.col("n_docs").cast("double"), 4
            ).alias("local_share"),
            eround(
                1e-9 + F.col("n_drop_global") / F.col("n_docs").cast("double"), 4
            ).alias("global_share"),
        )
        .orderBy("source")
    )


_Q190_ORACLE = f"""
    WITH per_doc AS (
      SELECT source,
             CAST(len(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS DOUBLE)
               / len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS score
      FROM documents
    ),
    loc AS (
      SELECT source, quantile_cont(score, {QUALITY_DROP_Q}) AS thr_local
      FROM per_doc GROUP BY source
    ),
    gbl AS (
      SELECT quantile_cont(score, {QUALITY_DROP_Q}) AS thr_global FROM per_doc
    )
    SELECT p.source,
           count(*) AS n_docs,
           round(1e-9 + any_value(l.thr_local), 6) AS thr_local,
           CAST(sum(CASE WHEN p.score < l.thr_local THEN 1 ELSE 0 END)
                AS BIGINT) AS n_drop_local,
           CAST(sum(CASE WHEN p.score < g.thr_global THEN 1 ELSE 0 END)
                AS BIGINT) AS n_drop_global,
           round(1e-9 + sum(CASE WHEN p.score < l.thr_local THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 4) AS local_share,
           round(1e-9 + sum(CASE WHEN p.score < g.thr_global THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 4) AS global_share
    FROM per_doc p JOIN loc l USING (source) CROSS JOIN gbl g
    GROUP BY p.source
    ORDER BY p.source
"""


# --- q188: corpus snapshot diff (round 11, session 2) — the data-
# versioning audit a recurring-crawl pipeline runs between releases:
# which docs were added / removed / changed / unchanged since the last
# snapshot, rolled up per source with a churn share. The diff runs on
# FINGERPRINT MANIFESTS (doc_id, source, md5(text␁source␁lang)) — never
# so at 100 TB the join moves ~48 bytes/doc: ONE doc_id-keyed
# full-outer SMJ between two narrow manifests, then a |sources|-key
# agg. The registry query simulates the previous snapshot
# deterministically from the current corpus (the q177 ERASE_USER_MOD
# stand-in pattern): u16(doc_id)%20 == 0 → doc is newly added (absent
# from prev), == 1 → changed (prev text lacked the first token),
# == 2 → a prev-only tombstone row (-(doc_id+1)) that reads as
# removed. The persisted-artifact path (`write_snapshot_manifest` +
# `diff_vs_manifest`) is the production form — pinned by pytest
# (planted add/remove/change, and manifest(v2) vs v2 → all unchanged).
SNAPSHOT_MOD = 20


def snapshot_manifest(docs: DataFrame) -> DataFrame:
    """(doc_id, source, fp) fingerprint manifest — the ~48-byte/doc
    artifact snapshots are diffed on (q43's md5 class).

    The fp covers ALL curation-relevant inputs — md5 over
    text ␁ source ␁ lang (\\x01-joined, ADVICE r13) — not text alone:
    update_release classifies its delta by fp equality, and a
    metadata-only edit (source drives the benchmark holdout, the
    per-source boilerplate threshold and the bench gram index; lang is
    shipped) must read 'changed', or the stale curated row carries
    forward and the delta release diverges from a full rebuild. A
    manifest written under the old text-only definition diffs as
    all-'changed' against this one — a one-time full reprocess on
    upgrade, never a wrong carry."""
    fp = F.md5(
        F.concat_ws("\x01", F.col("text"), F.col("source"), F.col("lang"))
    )
    return docs.select("doc_id", "source", fp.alias("fp"))


def snapshot_diff(cur_m: DataFrame, prev_m: DataFrame) -> DataFrame:
    """Per-source added/removed/changed/unchanged counts + churn share
    from two manifests. One full-outer join on doc_id (narrow), one
    |sources|-key aggregate."""
    cur = cur_m.select(
        F.col("doc_id"), F.col("source").alias("src_c"), F.col("fp").alias("fp_c")
    )
    prev = prev_m.select(
        F.col("doc_id"), F.col("source").alias("src_p"), F.col("fp").alias("fp_p")
    )
    j = cur.join(prev, "doc_id", "full_outer")
    status = (
        F.when(F.col("fp_p").isNull(), "added")
        .when(F.col("fp_c").isNull(), "removed")
        .when(F.col("fp_c") != F.col("fp_p"), "changed")
        .otherwise("unchanged")
    )
    agg = (
        j.select(
            F.coalesce("src_c", "src_p").alias("source"), status.alias("status")
        )
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("status") == "added", 1).otherwise(0)).alias("n_added"),
            F.sum(F.when(F.col("status") == "removed", 1).otherwise(0)).alias(
                "n_removed"
            ),
            F.sum(F.when(F.col("status") == "changed", 1).otherwise(0)).alias(
                "n_changed"
            ),
            F.sum(F.when(F.col("status") == "unchanged", 1).otherwise(0)).alias(
                "n_unchanged"
            ),
        )
    )
    n_prev = F.col("n_removed") + F.col("n_changed") + F.col("n_unchanged")
    churn = (
        F.col("n_added") + F.col("n_removed") + F.col("n_changed")
    ).cast("double") / n_prev
    return agg.select(
        "source",
        "n_added",
        "n_removed",
        "n_changed",
        "n_unchanged",
        F.when(n_prev == 0, None).otherwise(eround(1e-9 + churn, 4)).alias("churn"),
    ).orderBy("source")


def _prev_snapshot_sim(docs: DataFrame) -> DataFrame:
    """Deterministic previous-snapshot stand-in (see q188 header)."""
    from ..functions.xsql import expand_u16, hash_u16

    b = expand_u16(hash_u16("CAST(doc_id AS STRING)", "snap"), "spark")
    kept = docs.selectExpr(
        "doc_id",
        "source",
        "lang",
        f"CASE WHEN {b} % {SNAPSHOT_MOD} = 1 "
        "THEN regexp_replace(text, '^\\\\S+\\\\s', '') ELSE text END AS text",
        f"{b} % {SNAPSHOT_MOD} AS _b",
    ).filter(F.col("_b") != 0)
    tombs = kept.filter(F.col("_b") == 2).select(
        (-(F.col("doc_id") + 1)).alias("doc_id"), "source", "lang", "text"
    )
    return kept.drop("_b").unionByName(tombs)


def q188_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return snapshot_diff(
        snapshot_manifest(docs), snapshot_manifest(_prev_snapshot_sim(docs))
    )


def _q188_oracle() -> str:
    from ..functions.xsql import expand_u16, hash_u16

    b = expand_u16(hash_u16("CAST(doc_id AS STRING)", "snap"), "duckdb")
    return f"""
    WITH cur AS (
      SELECT doc_id, source,
             md5(concat_ws(chr(1), text, source, lang)) AS fp
      FROM documents
    ),
    kept AS (
      SELECT doc_id, source, lang,
             CASE WHEN {b} % {SNAPSHOT_MOD} = 1
                  THEN regexp_replace(text, '^\\S+\\s', '')
                  ELSE text END AS text,
             {b} % {SNAPSHOT_MOD} AS _b
      FROM documents
      WHERE {b} % {SNAPSHOT_MOD} <> 0
    ),
    prev AS (
      SELECT doc_id, source,
             md5(concat_ws(chr(1), text, source, lang)) AS fp
      FROM kept
      UNION ALL
      SELECT -(doc_id + 1) AS doc_id, source,
             md5(concat_ws(chr(1), text, source, lang)) AS fp
      FROM kept WHERE _b = 2
    ),
    j AS (
      SELECT coalesce(c.source, p.source) AS source,
             (CASE WHEN p.fp IS NULL THEN 'added'
                   WHEN c.fp IS NULL THEN 'removed'
                   WHEN c.fp <> p.fp THEN 'changed'
                   ELSE 'unchanged' END) AS status
      FROM cur c FULL OUTER JOIN prev p USING (doc_id)
    ),
    agg AS (
      SELECT source,
             CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
             CAST(sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
             CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
             CAST(sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
      FROM j GROUP BY source
    )
    SELECT source, n_added, n_removed, n_changed, n_unchanged,
           (CASE WHEN n_removed + n_changed + n_unchanged = 0 THEN NULL
                 ELSE round(1e-9 + CAST(n_added + n_removed + n_changed AS DOUBLE)
                            / (n_removed + n_changed + n_unchanged), 4)
            END) AS churn
    FROM agg ORDER BY source
"""


def write_snapshot_manifest(docs: DataFrame, path: str) -> None:
    """Persist the release fingerprint manifest (the production form of
    q188's simulated prev side)."""
    snapshot_manifest(docs).write.mode("overwrite").parquet(path)


def diff_vs_manifest(spark: SparkSession, docs: DataFrame, path: str) -> DataFrame:
    """Diff the live corpus against a persisted release manifest."""
    return snapshot_diff(snapshot_manifest(docs), spark.read.parquet(path))


# --- q186: source keyness — Dunning (1993) log-likelihood ratio of
# term frequencies, source vs rest-of-corpus: the corpus-linguistics
# "what vocabulary makes this source DIFFERENT" table a mixture curator
# reads before weighting sources (complements q121, which scores each
# source's divergence as ONE number — this names the terms driving it,
# and q67, which is per-DOC tf-idf). Scale shape: tokenize once →
# (source, token) counts (ONE shuffle on a |sources|×vocab-bounded
# key, map-side combine), token totals (vocab-bounded agg), per-source
# totals (|sources| rows, broadcast), corpus total (1-row broadcast);
# the top-K window partitions over the vocab-bounded scored frame
# (q136's class — never corpus-sized). Determinism: the
# overrepresentation filter is integer cross-multiplication
# (a·N > c_t·n1 — no float boundary), and the rank key is the
# eround-ed LLR with a token tiebreak (q146's ulp-proof pattern).
KEYNESS_TOP_K = 5


def q186_source_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(_tokens(F.col("text"))).alias("token")
    )
    # |sources|×vocab-bounded (Zipf) frame consumed four times (both
    # marginals, the corpus total, and the scored join) — the lazy
    # checkpoint keeps the corpus tokenize to ONE pass
    st = (
        toks.groupBy("source", "token")
        .agg(F.count("*").alias("a"))
        .localCheckpoint(eager=False)
    )
    tt = st.groupBy("token").agg(F.sum("a").alias("c_t"))
    srct = st.groupBy("source").agg(F.sum("a").alias("n1"))
    n = st.agg(F.sum("a").alias("nn"))
    scored = (
        st.join(tt, "token")
        .join(F.broadcast(srct), "source")
        .crossJoin(F.broadcast(n))
        # overrepresented only: a/n1 > c_t/N, integer-exact
        .filter(F.col("a") * F.col("nn") > F.col("c_t") * F.col("n1"))
    )
    b = F.col("c_t") - F.col("a")
    n2 = F.col("nn") - F.col("n1")
    term_a = F.col("a") * F.log(
        F.col("a") * F.col("nn").cast("double")
        / (F.col("n1") * F.col("c_t")).cast("double")
    )
    term_b = F.when(b == 0, F.lit(0.0)).otherwise(
        b * F.log(b * F.col("nn").cast("double") / (n2 * F.col("c_t")).cast("double"))
    )
    llr = scored.select(
        "source",
        "token",
        F.col("a").alias("n_in_source"),
        eround(1e-9 + 2.0 * (term_a + term_b), 4).alias("llr"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("llr"), F.asc("token"))
    return (
        llr.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= KEYNESS_TOP_K)
        .select("source", "rk", "token", "n_in_source", "llr")
        .orderBy("source", "rk")
    )


_Q186_ORACLE = f"""
    WITH toks AS (
      SELECT source,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
      FROM documents
    ),
    st AS (SELECT source, token, count(*) AS a FROM toks GROUP BY 1, 2),
    tt AS (SELECT token, sum(a) AS c_t FROM st GROUP BY 1),
    srct AS (SELECT source, sum(a) AS n1 FROM st GROUP BY 1),
    n AS (SELECT sum(a) AS nn FROM st),
    scored AS (
      SELECT st.source, st.token, st.a, tt.c_t, srct.n1, n.nn,
             (tt.c_t - st.a) AS b, (n.nn - srct.n1) AS n2
      FROM st
      JOIN tt USING (token)
      JOIN srct ON st.source = srct.source
      CROSS JOIN n
      WHERE st.a * n.nn > tt.c_t * srct.n1
    ),
    llr AS (
      SELECT source, token, a AS n_in_source,
             round(1e-9 + 2.0 * (
               a * ln(a * CAST(nn AS DOUBLE) / CAST(n1 * c_t AS DOUBLE))
               + (CASE WHEN b = 0 THEN 0.0
                  ELSE b * ln(b * CAST(nn AS DOUBLE) / CAST(n2 * c_t AS DOUBLE))
                  END)
             ), 4) AS llr
      FROM scored
    )
    SELECT source, rk, token, n_in_source, llr FROM (
      SELECT source, token, n_in_source, llr,
             CAST(row_number() OVER (
               PARTITION BY source ORDER BY llr DESC, token
             ) AS INT) AS rk
      FROM llr
    ) WHERE rk <= {KEYNESS_TOP_K}
    ORDER BY source, rk
"""


# --- q206: Zipf rank-frequency fit per source (round 14) — the
# power-law audit corpus reports run before trusting token statistics:
# regress ln(count) on ln(rank) over the frequency-ranked HEAD of each
# source's vocabulary (the head is where Zipf holds; the tail always
# sags) and report slope + r². A healthy natural-language source sits
# near slope −1; templated/generated text goes shallow, boilerplate
# floods go steep. Scale shape: the only corpus-sized pass is the
# token explode→count agg (map-side combined). Ranking never windows
# the full vocabulary: the cumulative tie-class prefilter windows the
# DISTINCT count values per source (≤ |count values| rows), keeps only
# count classes whose cumulative size reaches ZIPF_HEAD_K, and the
# row_number window runs over that ≤K+ties-per-source sliver — at
# 100 TB the 10M-token vocabulary never passes through a window.
ZIPF_HEAD_K = 1024


def q206_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("source", _tokens(F.col("text")).alias("arr"))
    counts = (
        base.select("source", F.explode("arr").alias("t"))
        .groupBy("source", "t")
        .agg(F.count("*").alias("c"))
    )
    src_stats = counts.groupBy("source").agg(
        F.count("*").alias("vocab_size"),
        F.sum("c").alias("total_tokens"),
    )
    # head prefilter: one window over the distinct count VALUES per
    # source (tiny), then an exact row_number over the surviving
    # ≤K+boundary-ties rows
    mc = counts.groupBy("source", "c").agg(F.count("*").alias("m"))
    w_c = (
        Window.partitionBy("source")
        .orderBy(F.col("c").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    keep_c = (
        mc.withColumn(
            "cum_before", F.coalesce(F.sum("m").over(w_c), F.lit(0))
        )
        .filter(F.col("cum_before") < ZIPF_HEAD_K)
        .select("source", "c")
    )
    w_r = Window.partitionBy("source").orderBy(F.col("c").desc(), F.col("t"))
    head = (
        counts.join(F.broadcast(keep_c), ["source", "c"])
        .withColumn("rnk", F.row_number().over(w_r))
        .filter(F.col("rnk") <= ZIPF_HEAD_K)
    )
    pts = head.select(
        "source",
        F.log(F.col("rnk").cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    fit = pts.groupBy("source").agg(
        F.count("*").alias("head_k"),
        (F.covar_pop("x", "y") / F.var_pop("x")).alias("slope"),
        (F.corr("x", "y") * F.corr("x", "y")).alias("r2"),
    )
    return (
        src_stats.join(fit, "source")
        .select(
            "source",
            "vocab_size",
            "total_tokens",
            "head_k",
            eround("slope", 4).alias("zipf_slope"),
            eround("r2", 4).alias("zipf_r2"),
        )
        .orderBy("source")
    )


_Q206_ORACLE = f"""
    WITH base AS (
      SELECT doc_id, source,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
      FROM documents
    ),
    counts AS (
      SELECT source, t, count(*) AS c
      FROM (SELECT source, unnest(arr) AS t FROM base) GROUP BY 1, 2
    ),
    src_stats AS (
      SELECT source, count(*) AS vocab_size, sum(c) AS total_tokens
      FROM counts GROUP BY 1
    ),
    ranked AS (
      SELECT source, c,
             row_number() OVER (
               PARTITION BY source ORDER BY c DESC, t
             ) AS rnk
      FROM counts
    ),
    head AS (SELECT * FROM ranked WHERE rnk <= {ZIPF_HEAD_K}),
    fit AS (
      SELECT source, count(*) AS head_k,
             regr_slope(ln(c), ln(rnk)) AS slope,
             regr_r2(ln(c), ln(rnk)) AS r2
      FROM head GROUP BY 1
    )
    SELECT s.source, CAST(s.vocab_size AS BIGINT) AS vocab_size,
           CAST(s.total_tokens AS BIGINT) AS total_tokens,
           CAST(f.head_k AS BIGINT) AS head_k,
           round(f.slope, 4) AS zipf_slope,
           round(f.r2, 4) AS zipf_r2
    FROM src_stats s JOIN fit f USING (source) ORDER BY s.source
"""


# --- q207: Heaps'-law vocabulary growth (round 14) — how fast the
# corpus keeps yielding NEW n-grams as it grows, the saturation curve
# release planning reads before deciding whether more raw data still
# buys diversity (V(N) ≈ K·N^β; β near 1 = still fresh, β → 0 =
# saturated). The growth unit is the word TRIGRAM (the unigram
# vocabulary of a bounded domain saturates immediately; trigram space
# keeps growing for decades of data). Docs are cut into HEAPS_TILES
# checkpoints in doc_id order via the range-bucketed two-phase ntile
# (functions/ranking.py — no single-partition window at any corpus
# size); each trigram contributes to the checkpoint of its FIRST
# document, so cum_vocab is an exact distinct-so-far count. The final
# cumsum + log-log regression run over exactly HEAPS_TILES rows.
HEAPS_TILES = 20


def q207_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import global_analytics

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", _tokens(F.col("text")).alias("arr"))
    tiled = global_analytics(
        base.select("doc_id", F.size("arr").alias("n_toks")),
        "doc_id",
        "doc_id",
        ntile_k=HEAPS_TILES,
        ntile_name="tile",
    ).select("doc_id", "n_toks", F.col("tile").cast("long").alias("tile"))
    tg = base.filter(F.size("arr") >= 3).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("arr") - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("arr", i),
                    F.element_at("arr", i + 1),
                    F.element_at("arr", i + 2),
                ),
            )
        ).alias("g"),
    )
    first = tg.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    newv = (
        first.join(
            tiled.select(F.col("doc_id").alias("first_doc"), "tile"),
            "first_doc",
        )
        .groupBy("tile")
        .agg(F.count("*").alias("new_vocab"))
    )
    per_tile = tiled.groupBy("tile").agg(
        F.count("*").alias("n_docs"), F.sum("n_toks").alias("toks")
    )
    # the running totals + regression see exactly HEAPS_TILES rows —
    # the unpartitioned window is bounded by construction
    w = Window.orderBy("tile").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_tile.join(newv, "tile", "left").select(
        "tile",
        "n_docs",
        F.sum("toks").over(w).alias("cum_tokens"),
        F.sum(F.coalesce("new_vocab", F.lit(0))).over(w).alias("cum_vocab"),
    )
    pts = cum.select(
        F.log(F.col("cum_tokens").cast("double")).alias("x"),
        F.log(F.col("cum_vocab").cast("double")).alias("y"),
    )
    fit = pts.agg(
        (F.covar_pop("x", "y") / F.var_pop("x")).alias("beta"),
        (F.corr("x", "y") * F.corr("x", "y")).alias("r2"),
    )
    return (
        cum.crossJoin(F.broadcast(fit))
        .select(
            "tile",
            "n_docs",
            "cum_tokens",
            "cum_vocab",
            eround("beta", 4).alias("heaps_beta"),
            eround("r2", 4).alias("heaps_r2"),
        )
        .orderBy("tile")
    )


_Q207_ORACLE = f"""
    WITH base AS (
      SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
      FROM documents
    ),
    docs AS (
      SELECT doc_id, len(arr) AS n_toks,
             CAST(ntile({HEAPS_TILES}) OVER (ORDER BY doc_id) AS BIGINT)
               AS tile
      FROM base
    ),
    tg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(arr) - 1),
               i -> concat_ws(' ', arr[i], arr[i+1], arr[i+2]))) AS g
      FROM base WHERE len(arr) >= 3
    ),
    tok_first AS (SELECT g, min(doc_id) AS first_doc FROM tg GROUP BY g),
    newv AS (
      SELECT d.tile, count(*) AS new_vocab
      FROM tok_first f JOIN docs d ON d.doc_id = f.first_doc GROUP BY 1
    ),
    per_tile AS (
      SELECT tile, count(*) AS n_docs, sum(n_toks) AS toks
      FROM docs GROUP BY 1
    ),
    cum AS (
      SELECT p.tile, p.n_docs,
             sum(p.toks) OVER (ORDER BY p.tile) AS cum_tokens,
             sum(coalesce(v.new_vocab, 0)) OVER (ORDER BY p.tile)
               AS cum_vocab
      FROM per_tile p LEFT JOIN newv v USING (tile)
    ),
    fit AS (
      SELECT regr_slope(ln(cum_vocab), ln(cum_tokens)) AS beta,
             regr_r2(ln(cum_vocab), ln(cum_tokens)) AS r2
      FROM cum
    )
    SELECT c.tile, CAST(c.n_docs AS BIGINT) AS n_docs,
           CAST(c.cum_tokens AS BIGINT) AS cum_tokens,
           CAST(c.cum_vocab AS BIGINT) AS cum_vocab,
           round(f.beta, 4) AS heaps_beta,
           round(f.r2, 4) AS heaps_r2
    FROM cum c CROSS JOIN fit f ORDER BY c.tile
"""


# --- q209: span-level LM anomaly scan (round 14) — q109 scores whole
# documents; cleaning pipelines also need WHERE a document goes bad
# (a corrupt segment spliced into otherwise-fine text drags the doc
# mean only slightly). Every positional bigram is scored under the
# same corpus-fit add-k bigram model as q109, a sliding window of
# SPAN_W bigram log-probs is averaged per position, and each doc
# reports its WORST window; docs whose worst span falls below
# SPAN_LP_MIN are flagged. Scale shape: one posexplode pass, model
# joins are vocab-bounded broadcasts, the sliding window partitions by
# doc_id (document-sized partitions — never corpus-wide), then two
# small aggs. Threshold calibrated on the sf corpus: worst-window lp
# spans [−3.83, −3.30] with p01 ≈ −3.72, so −3.65 flags the genuine
# low-probability tail (a few %) on any SF of this generator.
SPAN_W = 8
SPAN_LP_MIN = -3.65


def q209_span_lm_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "source", _tokens(F.col("text")).alias("arr")
    )
    bgp = base.filter(F.size("arr") >= 2).select(
        "doc_id", "source", F.posexplode(_bigram_array()).alias("pos", "bg")
    )
    c12 = bgp.groupBy("bg").agg(F.count("*").alias("c12"))
    c1 = (
        bgp.select(F.split("bg", " ").getItem(0).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    vocab = base.select(F.explode("arr").alias("t")).agg(
        F.countDistinct("t").alias("v")
    )
    lp = F.log(
        (F.col("c12") + F.lit(PPL_SMOOTH_K))
        / (F.col("c1") + F.lit(PPL_SMOOTH_K) * F.col("v"))
    )
    scored = (
        bgp.withColumn("w1", F.split("bg", " ").getItem(0))
        .join(F.broadcast(c12), "bg")
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", "source", "pos", lp.alias("lp"))
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, SPAN_W - 1)
    )
    win = scored.select(
        "doc_id",
        "source",
        F.avg("lp").over(w).alias("wavg"),
        F.count("*").over(w).alias("wn"),
    )
    worst = (
        win.filter(F.col("wn") == SPAN_W)
        .groupBy("doc_id", "source")
        .agg(F.min("wavg").alias("worst_lp"))
    )
    return (
        worst.groupBy("source")
        .agg(
            F.count("*").alias("n_scored"),
            eround(1e-9 + F.avg("worst_lp"), 4).alias("avg_worst_lp"),
            eround(F.min("worst_lp"), 4).alias("min_worst_lp"),
            F.sum(
                F.when(F.col("worst_lp") < SPAN_LP_MIN, 1).otherwise(0)
            ).alias("n_flagged"),
        )
        .orderBy("source")
    )


_Q209_ORACLE = f"""
    WITH base AS (
      SELECT doc_id, source,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
      FROM documents
    ),
    bgl AS (
      SELECT doc_id, source,
             list_transform(range(1, len(arr)),
                            i -> concat_ws(' ', arr[i], arr[i+1])) AS bgs
      FROM base WHERE len(arr) >= 2
    ),
    bgp0 AS (
      SELECT doc_id, source, bgs,
             unnest(generate_series(1, len(bgs))) AS pos
      FROM bgl
    ),
    bgp AS (SELECT doc_id, source, pos, bgs[pos] AS bg FROM bgp0),
    c12 AS (SELECT bg, count(*) AS c12 FROM bgp GROUP BY bg),
    c1 AS (
      SELECT string_split(bg, ' ')[1] AS w1, count(*) AS c1
      FROM bgp GROUP BY 1
    ),
    vocab AS (
      SELECT count(DISTINCT t) AS v
      FROM (SELECT unnest(arr) AS t FROM base)
    ),
    scored AS (
      SELECT b.doc_id, b.source, b.pos,
             ln((m.c12 + {PPL_SMOOTH_K})
                / (c.c1 + {PPL_SMOOTH_K} * vocab.v)) AS lp
      FROM bgp b
      JOIN c12 m ON m.bg = b.bg
      JOIN c1 c ON c.w1 = string_split(b.bg, ' ')[1]
      CROSS JOIN vocab
    ),
    win AS (
      SELECT doc_id, source,
             avg(lp) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND {SPAN_W - 1} FOLLOWING) AS wavg,
             count(*) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND {SPAN_W - 1} FOLLOWING) AS wn
      FROM scored
    ),
    worst AS (
      SELECT doc_id, source, min(wavg) AS worst_lp
      FROM win WHERE wn = {SPAN_W} GROUP BY 1, 2
    )
    SELECT source, count(*) AS n_scored,
           round(1e-9 + avg(worst_lp), 4) AS avg_worst_lp,
           round(min(worst_lp), 4) AS min_worst_lp,
           CAST(sum(CASE WHEN worst_lp < {SPAN_LP_MIN} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flagged
    FROM worst GROUP BY source ORDER BY source
"""


# --- q210: PMI collocations (round 14, wave 3) — the classic
# pointwise-mutual-information collocation mining a corpus team runs
# before fixing a tokenizer vocabulary: word pairs whose co-occurrence
# beats independence (PMI = ln p(ab)/(p(a)p(b))) are the multi-word
# expressions worth merging into single tokens, and a PMI table that
# suddenly fills with templated pairs is a boilerplate alarm. The
# min-count floor keeps the rare-pair PMI explosion out (a hapax pair
# maxes PMI by construction); complements q186 (per-source keyness,
# which ranks terms against OTHER sources) and q44 (raw trigram
# counts) with an independence-normalized statistic. Scale shape: the
# corpus is touched by exactly two explode→hash-agg passes (tokens,
# bigrams — both map-side combined); the floored candidate table is
# vocab-bounded and shrinks with the floor, the two unigram joins are
# plain equi-joins on vocab-sized tables (AQE picks the strategy —
# broadcasting c1 would die at a 100M-token vocabulary), the two
# scalar totals broadcast as 1-row frames, and the top-K runs through
# ranked_topk (TakeOrdered — no single-partition window). The rank
# key is the ROUNDED pmi + bigram tiebreak, so a cross-engine ln ulp
# cannot flip the K-th place (q151's ranking discipline).
PMI_MIN_COUNT = 5
PMI_TOP_K = 50


def q210_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .relational import ranked_topk

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(_tokens(F.col("text")).alias("arr"))
    tok = base.select(F.explode("arr").alias("t"))
    c1 = tok.groupBy("t").agg(F.count("*").alias("c"))
    n_tok = tok.agg(F.count("*").alias("n"))
    bg = base.select(F.explode(_bigram_array()).alias("bg"))
    c12 = bg.groupBy("bg").agg(F.count("*").alias("c12"))
    m_bg = bg.agg(F.count("*").alias("m"))
    cand = (
        c12.filter(F.col("c12") >= PMI_MIN_COUNT)
        .withColumn("w1", F.split("bg", " ").getItem(0))
        .withColumn("w2", F.split("bg", " ").getItem(1))
    )
    pmi = (
        F.log(F.col("c12").cast("double"))
        - F.log(F.col("m").cast("double"))
        - F.log(F.col("c_a").cast("double"))
        - F.log(F.col("c_b").cast("double"))
        + F.lit(2.0) * F.log(F.col("n").cast("double"))
    )
    scored = (
        cand.join(
            c1.select(F.col("t").alias("w1"), F.col("c").alias("c_a")), "w1"
        )
        .join(
            c1.select(F.col("t").alias("w2"), F.col("c").alias("c_b")), "w2"
        )
        .crossJoin(F.broadcast(m_bg))
        .crossJoin(F.broadcast(n_tok))
        .select("bg", "c12", "c_a", "c_b", eround(pmi, 4).alias("pmi"))
    )
    top = ranked_topk(scored, [F.desc("pmi"), F.asc("bg")], PMI_TOP_K)
    return top.select(
        F.col("rk").cast("long").alias("rk"),
        F.col("bg").alias("bigram"),
        "c12",
        "c_a",
        "c_b",
        "pmi",
    ).orderBy("rk")


_Q210_ORACLE = f"""
    WITH base AS (
      SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
      FROM documents
    ),
    tok AS (SELECT unnest(arr) AS t FROM base),
    c1 AS (SELECT t, count(*) AS c FROM tok GROUP BY 1),
    ntok AS (SELECT count(*) AS n FROM tok),
    bg AS (
      SELECT unnest(list_transform(range(1, len(arr)),
               i -> concat_ws(' ', arr[i], arr[i+1]))) AS bg
      FROM base WHERE len(arr) >= 2
    ),
    c12 AS (SELECT bg, count(*) AS c12 FROM bg GROUP BY 1),
    mbg AS (SELECT count(*) AS m FROM bg),
    scored AS (
      SELECT x.bg, x.c12, a.c AS c_a, b.c AS c_b,
             round(ln(CAST(x.c12 AS DOUBLE)) - ln(CAST(mbg.m AS DOUBLE))
                   - ln(CAST(a.c AS DOUBLE)) - ln(CAST(b.c AS DOUBLE))
                   + 2.0 * ln(CAST(ntok.n AS DOUBLE)), 4) AS pmi
      FROM c12 x
      JOIN c1 a ON a.t = string_split(x.bg, ' ')[1]
      JOIN c1 b ON b.t = string_split(x.bg, ' ')[2]
      CROSS JOIN mbg CROSS JOIN ntok
      WHERE x.c12 >= {PMI_MIN_COUNT}
    ),
    top AS (
      SELECT *, row_number() OVER (ORDER BY pmi DESC, bg) AS rk
      FROM scored ORDER BY pmi DESC, bg LIMIT {PMI_TOP_K}
    )
    SELECT CAST(rk AS BIGINT) AS rk, bg AS bigram,
           CAST(c12 AS BIGINT) AS c12, CAST(c_a AS BIGINT) AS c_a,
           CAST(c_b AS BIGINT) AS c_b, pmi
    FROM top ORDER BY rk
"""


QUERIES = {
    "q40_token_stats": q40_token_stats,
    "q169_dataset_card": q169_dataset_card,
    "q49_bpe_token_stats": q49_bpe_token_stats,
    "q66_winnowing_fingerprints": q66_winnowing_fingerprints,
    "q67_tfidf_top_terms": q67_tfidf_top_terms,
    "q41_lang_id": q41_lang_id,
    "q42_quality_by_source": q42_quality_by_source,
    "q43_fingerprints": q43_fingerprints,
    "q44_trigram_stats": q44_trigram_stats,
    "q94_token_chunks": q94_token_chunks,
    "q96_dataset_split": q96_dataset_split,
    "q97_quality_filter": q97_quality_filter,
    "q102_training_prep": q102_training_prep,
    "q105_decontaminate": q105_decontaminate,
    "q106_repetition_signals": q106_repetition_signals,
    "q109_perplexity_proxy": q109_perplexity_proxy,
    "q111_adaptive_quality": q111_adaptive_quality,
    "q121_source_divergence": q121_source_divergence,
    "q126_dsir_weights": q126_dsir_weights,
    "q128_bpe_merges": q128_bpe_merges,
    "q129_bpe_compression": q129_bpe_compression,
    "q136_bpe_vocab": q136_bpe_vocab,
    "q137_bpe_encode": q137_bpe_encode,
    "q141_tokenizer_fertility": q141_tokenizer_fertility,
    "q143_corpus_diversity": q143_corpus_diversity,
    "q147_boilerplate_grams": q147_boilerplate_grams,
    "q149_bigram_lm_export": q149_bigram_lm_export,
    "q155_boilerplate_clean": q155_boilerplate_clean,
    "q156_boilerplate_clean_stats": q156_boilerplate_clean_stats,
    "q160_decontaminate_strip": q160_decontaminate_strip,
    "q164_bm25_retrieval": q164_bm25_retrieval,
    "q171_bm25_ingest": q171_bm25_ingest,
    "q172_retrieval_decon": q172_retrieval_decon,
    "q178_hybrid_rrf": q178_hybrid_rrf,
    "q179_quality_training_set": q179_quality_training_set,
    "q181_doremi_mixture": q181_doremi_mixture,
    "q186_source_keyness": q186_source_keyness,
    "q206_zipf_fit": q206_zipf_fit,
    "q207_vocab_growth": q207_vocab_growth,
    "q209_span_lm_anomaly": q209_span_lm_anomaly,
    "q210_pmi_collocations": q210_pmi_collocations,
    "q188_snapshot_diff": q188_snapshot_diff,
    "q190_calibrated_quality": q190_calibrated_quality,
}


def _marker_hits_sql(lang: str) -> str:
    s = "concat(' ', lower(trim(text)), ' ')"
    terms = []
    for m in _LANG_MARKERS[lang]:
        needle = f" {m} "
        terms.append(
            f"(length({s}) - length(replace({s}, '{needle}', ''))) / {len(needle)}"
        )
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def _lang_id_oracle() -> str:
    langs = list(_LANG_MARKERS)
    hits_cols = ",\n".join(
        f"{_marker_hits_sql(lg)} AS hits_{lg}" for lg in langs
    )
    # same strict-> argmax with fixed order as the Spark builder
    pred = "'unknown'"
    best = "CAST(-1 AS BIGINT)"
    for lg in langs:
        pred = f"(CASE WHEN hits_{lg} > {best} THEN '{lg}' ELSE {pred} END)"
        best = f"(CASE WHEN hits_{lg} > {best} THEN hits_{lg} ELSE {best} END)"
    return f"""
        WITH scored AS (
          SELECT doc_id, lang, {hits_cols} FROM documents
        ), labeled AS (
          SELECT lang, {pred} AS predicted FROM scored
        )
        SELECT lang, predicted, count(*) AS n_docs
        FROM labeled GROUP BY lang, predicted ORDER BY lang, predicted
    """


_Q94_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    s AS (
      SELECT doc_id, toks,
             unnest(range(0, greatest(len(toks), 1), {_STRIDE})) AS start
      FROM t
    )
    SELECT doc_id,
           CAST(start / {_STRIDE} AS BIGINT) AS chunk_id,
           CAST(len(list_slice(toks, start + 1, start + {_CHUNK})) AS BIGINT) AS n_tokens,
           md5(array_to_string(list_slice(toks, start + 1, start + {_CHUNK}), ' ')) AS chunk_md5
    FROM s ORDER BY doc_id, chunk_id
"""

ORACLES = {
    "q164_bm25_retrieval": _Q164_ORACLE,
    "q171_bm25_ingest": _Q164_ORACLE,
    "q172_retrieval_decon": _Q172_ORACLE,
    "q178_hybrid_rrf": _q178_oracle(),
    "q179_quality_training_set": _q179_oracle(),
    "q181_doremi_mixture": _q181_oracle(),
    "q186_source_keyness": _Q186_ORACLE,
    "q206_zipf_fit": _Q206_ORACLE,
    "q207_vocab_growth": _Q207_ORACLE,
    "q209_span_lm_anomaly": _Q209_ORACLE,
    "q210_pmi_collocations": _Q210_ORACLE,
    "q188_snapshot_diff": _q188_oracle(),
    "q190_calibrated_quality": _Q190_ORACLE,
    "q169_dataset_card": _Q169_ORACLE,
    "q121_source_divergence": _Q121_ORACLE,
    "q126_dsir_weights": _q126_oracle(),
    "q128_bpe_merges": _q128_oracle(),
    "q129_bpe_compression": _q129_oracle(),
    "q136_bpe_vocab": _q136_oracle(),
    "q137_bpe_encode": _q137_oracle(),
    "q141_tokenizer_fertility": _q141_oracle(),
    "q143_corpus_diversity": _Q143_ORACLE,
    "q147_boilerplate_grams": _Q147_ORACLE,
    "q149_bigram_lm_export": _Q149_ORACLE,
    "q155_boilerplate_clean": _Q155_ORACLE,
    "q156_boilerplate_clean_stats": _Q156_ORACLE,
    "q160_decontaminate_strip": _Q160_ORACLE,
    "q67_tfidf_top_terms": """
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
          FROM documents
        ),
        tf AS (SELECT doc_id, token, count(*) AS cnt FROM toks GROUP BY doc_id, token),
        doc_len AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY doc_id),
        df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
          SELECT t.doc_id, t.token,
                 round((CAST(t.cnt AS DOUBLE) / l.len)
                       * ln(CAST(n.n_docs AS DOUBLE) / f.df), 6) AS tfidf
          FROM tf t
          JOIN doc_len l ON t.doc_id = l.doc_id
          JOIN df f ON t.token = f.token
          CROSS JOIN n
          WHERE t.doc_id < 20
        )
        SELECT doc_id, token, tfidf, rk FROM (
          SELECT doc_id, token, tfidf,
                 CAST(row_number() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, token ASC
                 ) AS INTEGER) AS rk
          FROM scored
        ) WHERE rk <= 3 ORDER BY doc_id, rk
    """,
    "q49_bpe_token_stats": f"""
        WITH t AS (
          SELECT lang,
                 len(regexp_extract_all(lower(text), '{BPE_PATTERN.replace("'", "''")}')) AS bpe_tokens,
                 len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS ws_tokens
          FROM documents
        )
        SELECT lang, count(*) AS n_docs,
               CAST(sum(bpe_tokens) AS BIGINT) AS total_bpe_tokens,
               round(1e-9 + avg(bpe_tokens), 4) AS avg_bpe_tokens,
               round(1e-9 + avg(CAST(bpe_tokens AS DOUBLE) / ws_tokens), 4) AS avg_bpe_per_word
        FROM t GROUP BY lang ORDER BY lang
    """,
    "q66_winnowing_fingerprints": """
        WITH toks AS (
          SELECT doc_id, lang, u.token, u.pos
          FROM documents,
               LATERAL (
                 SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token,
                        generate_subscripts(regexp_split_to_array(lower(trim(text)), '\\s+'), 1) AS pos
               ) u
        ), tri AS (
          SELECT doc_id, lang, pos,
                 md5(concat_ws(' ', token,
                               lead(token, 1) OVER w,
                               lead(token, 2) OVER w)) AS h,
                 lead(token, 2) OVER w AS t2
          FROM toks
          WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        ), selected AS (
          SELECT doc_id, lang,
                 min(h) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
          FROM tri WHERE t2 IS NOT NULL
        ), per_doc AS (
          SELECT doc_id, lang, count(DISTINCT fp) AS n_fps
          FROM selected GROUP BY doc_id, lang
        )
        SELECT lang, count(*) AS n_docs,
               CAST(sum(n_fps) AS BIGINT) AS total_fps,
               round(1e-9 + avg(n_fps), 4) AS avg_fps
        FROM per_doc GROUP BY lang ORDER BY lang
    """,
    "q40_token_stats": """
        WITH t AS (
          SELECT lang, len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tokens,
                 n_chars
          FROM documents
        )
        SELECT lang, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               round(1e-9 + avg(n_tokens), 4) AS avg_tokens,
               min(n_tokens) AS min_tokens,
               max(n_tokens) AS max_tokens,
               round(1e-9 + avg(CAST(n_chars AS DOUBLE) / n_tokens), 4) AS avg_chars_per_token
        FROM t GROUP BY lang ORDER BY lang
    """,
    "q41_lang_id": _lang_id_oracle(),
    "q42_quality_by_source": """
        WITH t AS (
          SELECT source,
                 len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tokens,
                 len(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS n_distinct,
                 length(replace(lower(trim(text)), ' ', '')) AS nospace_len
          FROM documents
        )
        SELECT source, count(*) AS n_docs,
               round(1e-9 + avg(n_tokens), 4) AS avg_tokens,
               round(1e-9 + avg(CAST(n_distinct AS DOUBLE) / n_tokens), 4) AS avg_distinct_ratio,
               round(1e-9 + avg(CAST(nospace_len AS DOUBLE) / n_tokens), 4) AS avg_token_len
        FROM t GROUP BY source ORDER BY source
    """,
    "q43_fingerprints": """
        WITH fp AS (
          SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
          FROM documents
        ), grp AS (
          SELECT fingerprint, count(*) AS n_docs FROM fp GROUP BY fingerprint
        )
        SELECT count(*) AS n_distinct_fingerprints,
               CAST(sum(CASE WHEN n_docs > 1 THEN n_docs ELSE 0 END) AS BIGINT) AS n_docs_in_dup_groups,
               max(n_docs) AS largest_group
        FROM grp
    """,
    "q44_trigram_stats": """
        WITH toks AS (
          SELECT doc_id, lang, u.token, u.pos
          FROM documents,
               LATERAL (
                 SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token,
                        generate_subscripts(regexp_split_to_array(lower(trim(text)), '\\s+'), 1) AS pos
               ) u
        ), tri AS (
          SELECT doc_id, lang,
                 concat_ws(' ', token,
                           lead(token, 1) OVER w,
                           lead(token, 2) OVER w) AS trigram,
                 lead(token, 2) OVER w AS t2
          FROM toks
          WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        )
        SELECT lang, count(*) AS n_trigrams,
               count(DISTINCT trigram) AS n_distinct_trigrams
        FROM tri WHERE t2 IS NOT NULL
        GROUP BY lang ORDER BY lang
    """,
    "q94_token_chunks": _Q94_ORACLE,
    "q96_dataset_split": _q96_oracle(),
    "q97_quality_filter": _Q97_ORACLE,
    "q105_decontaminate": _Q105_ORACLE,
    "q106_repetition_signals": _Q106_ORACLE,
    "q109_perplexity_proxy": _Q109_ORACLE,
    "q111_adaptive_quality": _Q111_ORACLE.format(per_doc=_PPL_PER_DOC_SQL),
    "q102_training_prep": _q102_oracle(),
}
