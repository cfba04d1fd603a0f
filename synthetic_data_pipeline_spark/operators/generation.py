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
from ..plans.generate import (
    DEFAULT_CONFIG,
    GenConfig,
    ccn_body_sql,
    doc_sits_sql,
    docs_sql,
    header_sql,
    iban_bban_sql,
    sit_block_sql,
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


def _gen_ctes(cfg: GenConfig, d: dict) -> str:
    """WITH-clause body: docs → slots → doc_sits → vals (value+block)."""
    numbers = d["numbers"].format(n=cfg.n_docs)
    return f"""
      docs AS ({docs_sql(cfg, numbers)}),
      {doc_sits_sql(cfg, "docs", d["explode_j"])},
      vals0 AS (
        SELECT *, {ccn_body_sql("slot")} AS ccn_body,
               {iban_bban_sql("slot")} AS iban_bban
        FROM doc_sits
      ),
      vals1 AS (
        SELECT *, {sit_value_sql("slot")} AS value FROM vals0
      ),
      vals AS (
        SELECT *, {sit_block_sql()} AS block FROM vals1
      )
    """


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
    return f"""
      WITH {_gen_ctes(cfg, d)}
      SELECT sit_id,
             count(*) AS n_docs,
             CAST(sum(CASE WHEN label = 'TP' THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
             CAST(sum(CASE WHEN label = 'FP' THEN 1 ELSE 0 END) AS BIGINT) AS n_fp,
             CAST(sum(instances) AS BIGINT) AS total_instances,
             CAST(sum(CASE WHEN confidence = 'High' THEN 1 ELSE 0 END) AS BIGINT) AS n_high
      FROM doc_sits
      GROUP BY sit_id ORDER BY sit_id
    """


def _corpus_stats_sql(cfg: GenConfig, dialect: str) -> str:
    d = _DIALECTS[dialect]
    return f"""
      WITH {_gen_ctes(cfg, d)},
      {_rendered_cte(d)}
      SELECT format,
             count(*) AS n_docs,
             CAST(sum({d["len"]}(split(text, ' '))) AS BIGINT) AS total_words,
             round(1e-9 + avg(word_count_target), 4) AS avg_target,
             CAST(min(length(text)) AS BIGINT) AS min_chars,
             CAST(max(length(text)) AS BIGINT) AS max_chars
      FROM rendered
      GROUP BY format ORDER BY format
    """


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
    return f"""
      WITH {_gen_ctes(cfg, d)},
      {_rendered_cte(d)},
      scanned AS (
        SELECT v.sit_id, v.doc_id, v.label, v.instances,
               {real} AS real_matches
        FROM vals v JOIN rendered r ON v.doc_id = r.doc_id
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
    """


def q60_gen_meta_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_meta_summary_sql(DEFAULT_CONFIG, "spark"))


def q61_gen_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_corpus_stats_sql(DEFAULT_CONFIG, "spark"))


def q62_gen_validation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_validation_sql(DEFAULT_CONFIG, "spark"))


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
