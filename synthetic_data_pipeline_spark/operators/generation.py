"""End-to-end generation pipeline queries (reference stages 1-2 + the
validator, SURVEY.md §3.1-3.3) — assembled from the shared-dialect SQL
in plans/generate.py and run through Spark's SQL front-end; the DuckDB
oracle executes the SAME logical SQL with only engine-syntax swaps
(numbers source, explode, list length/filter, ordered string agg,
regex-literal escaping).

This makes generation itself oracle-checked — stronger than the
reference, whose committed run fails its own validation
(output/validation_report.txt:51-52).

Scale shape: range() → narrow expressions → one explode (×sit_count) →
groupBy(doc) for render → groupBy(sit) for the report. No joins at all;
the two shuffles carry |slots| and |sits| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.catalog import (
    RE2_SAFE_IDS,
    SIT_CATALOG,
    is_placeholder_duckdb,
    is_placeholder_spark_sql,
)
from ..functions.rounding import apply_sql_eround
from ..functions.xsql import expand_u16
from ..plans.generate import (
    DEFAULT_CONFIG,
    GenConfig,
    ccn_body_sql,
    doc_sits_sql,
    docs_sql,
    header_sql,
    iban_bban_sql,
    sit_block_sql,
    sit_value_chunks,
    sit_value_sql,
)

_DIALECTS = {
    "spark": {
        "numbers": "(SELECT id AS doc_id FROM range(0, {n}))",
        "explode_j": "explode(sequence(0, sit_count - 1))",
        "len": "size",
        "filter": "filter",
        "agg_body": (
            "concat_ws(' ', transform(array_sort(collect_list(struct(slot, block))), "
            "x -> x.block))"
        ),
        "ph": is_placeholder_spark_sql,
        "esc": lambda pat: pat.replace("\\", "\\\\"),
    },
    "duckdb": {
        "numbers": "(SELECT range AS doc_id FROM range(0, {n}))",
        "explode_j": "unnest(range(0, sit_count))",
        "len": "len",
        "filter": "list_filter",
        "agg_body": "string_agg(block, ' ' ORDER BY slot)",
        "ph": is_placeholder_duckdb,
        "esc": lambda pat: pat,
    },
}


def _docs_only_sql(cfg: GenConfig) -> str:
    return docs_sql(cfg, _DIALECTS["spark"]["numbers"].format(n=cfg.n_docs))


def _gen_ctes_base(cfg: GenConfig, d: dict) -> str:
    """WITH-clause body up to vals0 (slots + SIT assignment + the two
    named generator bodies) — the part whose expressions are all small
    enough for one codegen unit."""
    numbers = d["numbers"].format(n=cfg.n_docs)
    return f"""
      docs AS ({docs_sql(cfg, numbers)}),
      {doc_sits_sql(cfg, "docs", d["explode_j"])},
      vals0 AS (
        SELECT *, {ccn_body_sql("slot")} AS ccn_body,
               {iban_bban_sql("slot")} AS iban_bban
        FROM doc_sits
      )
    """


def _gen_ctes(cfg: GenConfig, d: dict) -> str:
    """WITH-clause body: docs → slots → doc_sits → vals (value+block).
    Single-SQL form — used verbatim by the DuckDB oracle (DuckDB has no
    codegen method limit); the Spark side of the value-bearing queries
    goes through ``_staged_vals`` instead."""
    return f"""
      {_gen_ctes_base(cfg, d)},
      vals1 AS (
        SELECT *, {sit_value_sql("slot")} AS value FROM vals0
      ),
      vals AS (
        SELECT *, {sit_block_sql()} AS block FROM vals1
      )
    """


def _staged_vals(cfg: GenConfig, spark: SparkSession):
    """Spark-side vals with codegen-safe staging: every TP value chunk
    is its OWN top-level column in the first projection (per-column code
    is independently compilable; one inlined 54-SIT dispatch blows the
    JVM 64KB method limit and drops the whole generate+render+scan
    pipeline to interpreted mode — measured ~6× slower). The tiny slot
    table is then materialized once with localCheckpoint, and
    value/block are built from plain column references."""
    from pyspark.sql import functions as F

    d = _DIALECTS["spark"]
    tp_chunks, fp_case = sit_value_chunks("slot")
    chunk_cols = ", ".join(f"{c} AS _tp{i}" for i, c in enumerate(tp_chunks))
    base = spark.sql(
        expand_u16(
            f"WITH {_gen_ctes_base(cfg, d)} "
            f"SELECT *, {chunk_cols}, {fp_case} AS _fp FROM vals0",
            "spark",
        )
    ).localCheckpoint()
    value = F.when(
        F.col("label") == "TP",
        F.coalesce(*[F.col(f"_tp{i}") for i in range(len(tp_chunks))], F.lit("?")),
    ).otherwise(F.col("_fp"))
    return (
        base.withColumn("value", value)
        .withColumn("block", F.expr(sit_block_sql()))
        .drop("_fp", *[f"_tp{i}" for i in range(len(tp_chunks))])
    )


def _rendered_cte(d: dict) -> str:
    """docs rendered to text: header + ordered SIT blocks + filler pad
    to the word target (content_generator.py:236-242's padding, but
    deterministic)."""
    return f"""
      bodies AS (
        SELECT doc_id, format, word_count_target,
               {d["agg_body"]} AS body
        FROM vals
        GROUP BY doc_id, format, word_count_target
      ),
      rendered AS (
        SELECT doc_id, format, word_count_target,
               concat({header_sql()}, ' ', body, ' ',
                      repeat('lorem ',
                             CAST(greatest(word_count_target
                                           - {d["len"]}(split(body, ' ')), 0) AS INT)
                      )) AS text
        FROM bodies
      )
    """


def _meta_summary_sql(cfg: GenConfig, dialect: str) -> str:
    d = _DIALECTS[dialect]
    return apply_sql_eround(expand_u16(f"""
      WITH {_gen_ctes(cfg, d)}
      SELECT sit_id,
             count(*) AS n_docs,
             CAST(sum(CASE WHEN label = 'TP' THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
             CAST(sum(CASE WHEN label = 'FP' THEN 1 ELSE 0 END) AS BIGINT) AS n_fp,
             CAST(sum(instances) AS BIGINT) AS total_instances,
             CAST(sum(CASE WHEN confidence = 'High' THEN 1 ELSE 0 END) AS BIGINT) AS n_high
      FROM doc_sits
      GROUP BY sit_id ORDER BY sit_id
    """, dialect))


def _corpus_agg_select(d: dict) -> str:
    """The q61 aggregate over the ``rendered`` CTE — one text shared by
    the Spark staged path and the DuckDB single-SQL oracle so both
    engines compute the identical (eround-rewritten) formula."""
    return f"""
      SELECT format,
             count(*) AS n_docs,
             CAST(sum({d["len"]}(split(text, ' '))) AS BIGINT) AS total_words,
             round(1e-9 + avg(word_count_target), 4) AS avg_target,
             CAST(min(length(text)) AS BIGINT) AS min_chars,
             CAST(max(length(text)) AS BIGINT) AS max_chars
      FROM rendered
      GROUP BY format ORDER BY format
    """


def _corpus_stats_sql(cfg: GenConfig, dialect: str) -> str:
    d = _DIALECTS[dialect]
    return apply_sql_eround(expand_u16(f"""
      WITH {_gen_ctes(cfg, d)},
      {_rendered_cte(d)}
      {_corpus_agg_select(d)}
    """, dialect))


def _validation_sql(cfg: GenConfig, dialect: str) -> str:
    """The reference validator (modules/validator.py:235-360) as one
    query: per (doc, sit), count non-placeholder regex matches in the
    rendered text; TP rows are satisfied when real ≥ instances, FP rows
    are flagged by any real match."""
    d = _DIALECTS[dialect]
    ph = d["ph"]("x")
    whens = " ".join(
        f"WHEN '{sid}' THEN {d['len']}({d['filter']}("
        f"regexp_extract_all(text, '{d['esc'](regex)}', 0), x -> NOT {ph}))"
        for sid, _n, regex, _t in SIT_CATALOG
        if sid in RE2_SAFE_IDS
    )
    real = f"(CASE sit_id {whens} ELSE 0 END)"
    # TC SITs (empty regex) are generated but never scanned — same skip
    # as the reference validator; the Spark q62 path drops them via its
    # inner join against the per-pattern scan branches.
    scan_ids = ", ".join(f"'{sid}'" for sid in RE2_SAFE_IDS)
    return apply_sql_eround(expand_u16(f"""
      WITH {_gen_ctes(cfg, d)},
      {_rendered_cte(d)},
      scanned AS (
        SELECT v.sit_id, v.doc_id, v.label, v.instances,
               {real} AS real_matches
        FROM vals v JOIN rendered r ON v.doc_id = r.doc_id
        WHERE v.sit_id IN ({scan_ids})
      )
      SELECT sit_id,
             count(*) AS n_docs,
             CAST(sum(CASE WHEN label = 'TP' THEN 1 ELSE 0 END) AS BIGINT) AS tp_total,
             CAST(sum(CASE WHEN label = 'TP' AND real_matches >= instances
                           THEN 1 ELSE 0 END) AS BIGINT) AS tp_satisfied,
             CAST(sum(CASE WHEN label = 'FP' AND real_matches > 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS fp_flagged,
             CAST(sum(instances) AS BIGINT) AS total_instances
      FROM scanned
      GROUP BY sit_id ORDER BY sit_id
    """, dialect))


def q60_gen_meta_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_meta_summary_sql(DEFAULT_CONFIG, "spark"))


def q61_gen_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged like q62 (codegen-safe vals), then the same rendered+agg
    SQL text the oracle runs."""
    d = _DIALECTS["spark"]
    _staged_vals(DEFAULT_CONFIG, spark).createOrReplaceTempView("gen_vals_staged")
    return spark.sql(
        apply_sql_eround(
            f"WITH vals AS (SELECT * FROM gen_vals_staged), "
            f"{_rendered_cte(d)} {_corpus_agg_select(d)}"
        )
    )


def q62_gen_validation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side is staged, not one SQL: the fully-inlined generation +
    12-regex scan expression tree exceeds the JVM's 64KB codegen method
    limit, silently dropping the whole stage to interpreted mode
    (measured 21.5s → ~2s). The tiny generated corpus is materialized
    once with localCheckpoint, then scanned with one literal-pattern
    branch per SIT (small codegen units), then aggregated — same
    relation as the single-SQL DuckDB oracle.
    """
    from pyspark.sql import functions as F

    from ..plans.catalog import is_placeholder

    d = _DIALECTS["spark"]
    vals = _staged_vals(DEFAULT_CONFIG, spark)
    vals.createOrReplaceTempView("gen_vals_staged")
    rendered = spark.sql(
        f"""
        WITH vals AS (SELECT * FROM gen_vals_staged),
        {_rendered_cte(d)}
        SELECT doc_id, text FROM rendered
        """
    ).localCheckpoint()

    branches = []
    for sid, _n, regex, _t in SIT_CATALOG:
        if sid not in RE2_SAFE_IDS:
            continue
        real = F.size(
            F.filter(
                F.regexp_extract_all("text", F.lit(regex), 0),
                lambda m: ~is_placeholder(m),
            )
        )
        branches.append(
            rendered.select(
                F.lit(sid).alias("sit_id"), "doc_id", real.alias("real_matches")
            )
        )
    scanned = branches[0]
    for b in branches[1:]:
        scanned = scanned.unionByName(b)
    return (
        vals.select("doc_id", "sit_id", "label", "instances")
        .join(scanned, ["doc_id", "sit_id"])
        .groupBy("sit_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("label") == "TP", 1).otherwise(0)).alias("tp_total"),
            F.sum(
                F.when(
                    (F.col("label") == "TP")
                    & (F.col("real_matches") >= F.col("instances")),
                    1,
                ).otherwise(0)
            ).alias("tp_satisfied"),
            F.sum(
                F.when(
                    (F.col("label") == "FP") & (F.col("real_matches") > 0), 1
                ).otherwise(0)
            ).alias("fp_flagged"),
            F.sum("instances").alias("total_instances"),
        )
        .orderBy("sit_id")
    )


QUERIES = {
    "q60_gen_meta_summary": q60_gen_meta_summary,
    "q61_gen_corpus_stats": q61_gen_corpus_stats,
    "q62_gen_validation_report": q62_gen_validation_report,
}

ORACLES = {
    "q60_gen_meta_summary": _meta_summary_sql(DEFAULT_CONFIG, "duckdb"),
    "q61_gen_corpus_stats": _corpus_stats_sql(DEFAULT_CONFIG, "duckdb"),
    "q62_gen_validation_report": _validation_sql(DEFAULT_CONFIG, "duckdb"),
}
