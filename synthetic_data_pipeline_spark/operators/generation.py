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
    filler_word_sql,
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
        "fill": "array_join(transform(sequence(1, ({n})), i -> {w}), ' ')",
        "ph": is_placeholder_spark_sql,
        "esc": lambda pat: pat.replace("\\", "\\\\"),
    },
    "duckdb": {
        "numbers": "(SELECT range AS doc_id FROM range(0, {n}))",
        "explode_j": "unnest(range(0, sit_count))",
        "len": "len",
        "filter": "list_filter",
        "agg_body": "string_agg(block, ' ' ORDER BY slot)",
        "fill": (
            "array_to_string(list_transform(range(1, ({n}) + 1), i -> {w}), ' ')"
        ),
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


def _gen_partitions(cfg: GenConfig) -> int:
    """Partition count sized to the configured corpus: ~5k docs per
    partition, capped at 32 locally. The default 32-partition layout
    launches ~500 near-empty tasks per generation query at the test
    corpus size — pure scheduler overhead; at a 100 TB-scale config the
    same formula grows the partition count linearly with n_docs."""
    return max(2, min(32, cfg.n_docs // 5_000 + 2))


def _staged_vals(cfg: GenConfig, spark: SparkSession):
    """Spark-side vals with codegen-safe staging: the slot table is
    materialized ONCE with localCheckpoint after only small expressions
    (docs → slots → sit assignment → ccn/iban bodies), then the 54-SIT
    value dispatch is ROW-partitioned — each 6-SIT chunk evaluates its
    own small CASE in its own union branch, i.e. its own codegen unit.
    One inlined 54-branch dispatch exceeds the JVM 64KB method limit
    inside the generate stage and silently drops the whole
    generate+render+scan pipeline to interpreted mode (measured ~9s of
    failed compile attempts + interpreted eval on a 2k-row slot table;
    this form compiles everywhere)."""
    from functools import reduce

    from pyspark.sql import functions as F

    d = _DIALECTS["spark"]
    tp_chunks, fp_case = sit_value_chunks("slot")
    base = (
        spark.sql(
            expand_u16(
                f"WITH {_gen_ctes_base(cfg, d)} SELECT * FROM vals0", "spark"
            )
        )
        .coalesce(_gen_partitions(cfg))
        .localCheckpoint()
    )
    parts = [
        base.filter(F.col("sit_id").isin(cids)).selectExpr(
            "*",
            expand_u16(
                f"(CASE WHEN label = 'TP' THEN coalesce({tp_case}, '?') "
                f"ELSE {fp_case} END) AS value",
                "spark",
            ),
        )
        for cids, tp_case in tp_chunks
    ]
    return reduce(lambda a, b: a.unionByName(b), parts).withColumn(
        "block", F.expr(sit_block_sql())
    )


def _rendered_cte(d: dict) -> str:
    """docs rendered to text: per-format frame (header/footer) around
    the ordered SIT blocks + filler pad to the word target
    (content_generator.py:275-303's per-format dispatch and :236-242's
    padding, but deterministic). Email formats get From/To/Subject
    framing and a regards footer (EMAIL_TEMPLATE), email_with_attachment
    adds the attachment note, document/pdf get the CONFIDENTIAL header
    with the doc id and a closing line (build_document_text). Frame
    prose is lowercase/digit-safe and the doc id is prefixed with a
    letter ('d123') so no \\b-delimited digit run can reach another
    SIT's pattern space. Each format draws one of TWO template variants
    per doc (the reference ships two templates per format —
    templates/email_templates.md 'Formal Invoice Email' / 'Short
    Notification', doc_templates.md 'Employee Record' / 'Financial
    Statement', chat_templates.md 'Support Chat' / 'Quick Exchange')."""
    from ..functions.xsql import hash_u16

    v = f"({hash_u16('doc_id', 'tmplv')} % 2)"
    email_hdr = (
        f"concat('from: records-desk at corp-mail to: billing-team at "
        f"corp-mail subject: ', CASE WHEN {v} = 0 "
        "THEN 'invoice payment details' "
        "ELSE 'payment confirmation' END)"
    )
    doc_hdr = (
        f"concat(CASE WHEN {v} = 0 "
        "THEN 'confidential - employee record d' "
        "ELSE 'financial statement - confidential d' END, "
        "CAST(doc_id AS STRING))"
    )
    chat_hdr = (
        f"(CASE WHEN {v} = 0 THEN 'support chat transcript follows' "
        "ELSE 'quick exchange transcript follows' END)"
    )
    # the attachment email names ITS OWN attachment (letter-prefixed
    # doc id keeps the digit run out of \b-pattern space) — the
    # reference's email_with_attachment body references the generated
    # attachment filename (content_generator.py:208-234)
    att_name = "'report-d', CAST(doc_id AS STRING), '.xlsx'"
    pre = (
        "(CASE format "
        f"WHEN 'email' THEN {email_hdr} "
        "WHEN 'email_with_attachment' THEN concat('from: records-desk at "
        "corp-mail to: billing-team at corp-mail subject: see attached ', "
        f"{att_name}) "
        f"WHEN 'chat' THEN {chat_hdr} "
        f"ELSE {doc_hdr} END)"
    )
    post = (
        "(CASE format "
        f"WHEN 'email' THEN (CASE WHEN {v} = 0 "
        "THEN 'if you need anything else, please let me know. best "
        "regards, records-desk' ELSE 'thanks, records-desk' END) "
        "WHEN 'email_with_attachment' THEN "
        f"concat('attached: ', {att_name}, ' regards, records-desk') "
        "WHEN 'chat' THEN 'end of chat' "
        f"ELSE (CASE WHEN {v} = 0 THEN 'approved by: records-desk "
        "end of record' ELSE 'summary: see details above end of record' "
        "END) END)"
    )
    # paragraph break — a real blank line between frame, body, and
    # footer (multi-paragraph register; space-padded so ' '-tokenizing
    # stays stable on both engines). chr(10) rather than a '\n' literal:
    # Spark interprets backslash escapes in string literals, standard
    # SQL (DuckDB) does not.
    brk = "concat(' ', chr(10), chr(10), ' ')"
    fill_n = f"greatest(word_count_target - {d['len']}(split(body, ' ')), 0)"
    fill = d["fill"].format(n=fill_n, w=filler_word_sql())
    return f"""
      bodies AS (
        SELECT doc_id, format, word_count_target,
               {d["agg_body"]} AS body
        FROM vals
        GROUP BY doc_id, format, word_count_target
      ),
      rendered AS (
        SELECT doc_id, format, word_count_target,
               concat({pre}, {brk}, body, {brk}, {post}, ' ', {fill}) AS text
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
    whens = " ".join(_ms_whens(d))
    filtered = _ms_filtered(d, f"(CASE sit_id {whens} ELSE NULL END)")
    real = f"coalesce({d['len']}({filtered}), 0)"
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
            expand_u16(
                f"WITH vals AS (SELECT * FROM gen_vals_staged), "
                f"{_rendered_cte(d)} {_corpus_agg_select(d)}",
                "spark",
            )
        )
    )


def _ms_whens(d: dict) -> list[str]:
    """Per-SIT WHEN branches of the scan dispatch: for the row's own
    sit_id, the RAW matches of that SIT's pattern in the rendered
    text. One literal regex per branch (both engines require foldable
    patterns; literals also keep the compiled regex cached in
    codegen). The placeholder filter is applied ONCE by the caller
    (``_ms_filtered``) on the dispatched array — inlining the large
    placeholder expression per branch made Catalyst PLANNING dominate
    the scan (same finding as sitscan.sit_scan_frame, round 8)."""
    return [
        f"WHEN '{sid}' THEN "
        f"regexp_extract_all(text, '{d['esc'](rx)}', 0)"
        for sid, _n, rx, _t in SIT_CATALOG
        if sid in RE2_SAFE_IDS
    ]


def _ms_filtered(d: dict, arr: str) -> str:
    """Non-placeholder matches of a dispatched match array — the single
    application point of the placeholder predicate. filter(NULL) is
    NULL in both dialects, so unmatched sit_ids stay NULL exactly as
    the bare CASE dispatch left them."""
    ph = d["ph"]("x")
    return f"{d['filter']}({arr}, x -> NOT {ph})"


# Scanned-pairs table per (Spark application, GenConfig): q62, q91,
# q98 and the report assembly all consume the SAME generate → render →
# join → regex-scan pipeline; within one session it is computed once
# (the already-present localCheckpoint materializes it) — the
# in-session form of "at 100 TB you'd persist the validation scan as a
# table" (same reuse pattern as dedup.shingle_state). Results are
# identical with or without a memo hit: the lineage is deterministic,
# consumers only append further transformations.
_SCANNED_CACHE: dict[tuple[str, str], DataFrame] = {}
_SCANNED_CACHE_MAX = 3


def clear_scanned_pairs_cache() -> None:
    """Drop memoized scanned-pairs / rendered-corpus frames (checkpoint
    blocks are freed when the handles are GC'd) — keeps cold-path
    probes honest."""
    _SCANNED_CACHE.clear()
    _RENDERED_CACHE.clear()


def _scanned_pairs(spark: SparkSession, cfg: GenConfig = DEFAULT_CONFIG):
    """(doc_id, sit_id, label, instances, text, ms) for every ASSIGNED
    (doc, scanned-SIT) pair — the validator's loop shape
    (modules/validator.py:255-299 iterates mapping rows and runs only
    that row's SIT regex on that doc). Joining vals to rendered before
    the regex means each document is scanned with its ~4 assigned
    patterns, not all |catalog| of them — at 100 TB that is the
    difference between O(pairs) and O(docs × catalog) regex work.

    Codegen safety: the 33-branch dispatch is split into 6-branch CASE
    chunks, each its own column, materialized with localCheckpoint
    before the chunks are coalesced — one inlined mega-CASE (regex +
    placeholder-filter per branch) exceeds the JVM 64KB method limit
    and drops the stage to interpreted mode. (A union-of-row-chunks
    form without the checkpoint was measured 3-5× slower here: each
    branch re-executes the vals union + render agg + join.)

    The join takes a shuffle-hash hint: the rendered side carries the
    full document text, and broadcasting it collects the whole corpus
    to the driver per call — wasteful here, fatal at 100 TB.
    """
    from pyspark.sql import functions as F

    key = (spark.sparkContext.applicationId, repr(cfg))
    hit = _SCANNED_CACHE.get(key)
    if hit is not None:
        return hit

    d = _DIALECTS["spark"]
    vals = _staged_vals(cfg, spark)
    vals.createOrReplaceTempView("gen_vals_staged")
    rendered = spark.sql(
        expand_u16(
            f"""
            WITH vals AS (SELECT * FROM gen_vals_staged),
            {_rendered_cte(d)}
            SELECT doc_id, text FROM rendered
            """,
            "spark",
        )
    )
    whens = _ms_whens(d)
    chunk = 6
    chunks = [
        f"(CASE sit_id {' '.join(whens[i:i + chunk])} ELSE NULL END)"
        for i in range(0, len(whens), chunk)
    ]
    staged = (
        vals.select("doc_id", "sit_id", "label", "instances")
        .filter(F.col("sit_id").isin(RE2_SAFE_IDS))
        .join(rendered.hint("shuffle_hash"), "doc_id")
        .selectExpr(
            "doc_id",
            "sit_id",
            "label",
            "instances",
            "text",
            *[f"{c} AS _ms{i}" for i, c in enumerate(chunks)],
        )
        .coalesce(_gen_partitions(cfg))
        .localCheckpoint()
    )
    # placeholder filter applied ONCE on the coalesced dispatch (the
    # branches carry raw matches; see _ms_whens)
    out = staged.selectExpr(
        "doc_id", "sit_id", "label", "instances", "text",
        _ms_filtered(
            d,
            "coalesce(" + ", ".join(f"_ms{i}" for i in range(len(chunks)))
            + ")",
        ) + " AS ms",
    )
    while len(_SCANNED_CACHE) >= _SCANNED_CACHE_MAX:
        _SCANNED_CACHE.pop(next(iter(_SCANNED_CACHE)))
    _SCANNED_CACHE[key] = out
    return out


def q62_gen_validation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side is staged, not one SQL: the fully-inlined generation +
    regex-scan expression tree exceeds the JVM's 64KB codegen method
    limit, silently dropping the whole stage to interpreted mode
    (measured 21.5s → ~2s). Built on the per-assigned-pair scan — same
    relation as the single-SQL DuckDB oracle."""
    from pyspark.sql import functions as F

    return (
        _scanned_pairs(spark)
        .select(
            "doc_id",
            "sit_id",
            "label",
            "instances",
            F.size("ms").alias("real_matches"),
        )
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


_RENDERED_CACHE: dict[tuple[str, str], "DataFrame"] = {}


def _rendered_docs(spark: SparkSession, cfg: GenConfig = DEFAULT_CONFIG):
    """(doc_id, text) for the generated corpus — same staged-vals path
    as :func:`_scanned_pairs` (64KB-codegen-safe), no pair join.
    Memoized per (application, config) like the scanned-pairs table:
    the render CTE's plan is large, and re-analyzing it per consumer
    (q99 twice per bench round) costs more than the tiny corpus
    itself."""
    key = (spark.sparkContext.applicationId, repr(cfg))
    hit = _RENDERED_CACHE.get(key)
    if hit is not None:
        return hit
    d = _DIALECTS["spark"]
    vals = _staged_vals(cfg, spark)
    vals.createOrReplaceTempView("gen_vals_staged")
    out = spark.sql(
        expand_u16(
            f"""
            WITH vals AS (SELECT * FROM gen_vals_staged),
            {_rendered_cte(d)}
            SELECT doc_id, text FROM rendered
            """,
            "spark",
        )
    ).localCheckpoint(eager=False)
    while len(_RENDERED_CACHE) >= _SCANNED_CACHE_MAX:
        _RENDERED_CACHE.pop(next(iter(_RENDERED_CACHE)))
    _RENDERED_CACHE[key] = out
    return out


# q99 runs the alternation form, which costs ~20ms/doc on Java regex
# (see sitscan.redact_df) — a smaller corpus keeps the driver window
# fast while still planting every SIT's values ≥15 times.
_REDACT_CONFIG = GenConfig(per_sit_count=15)


def q99_redact_generated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-alternation PII redaction (sitscan.redact_df) over the
    GENERATED corpus — unlike q93's documents table, every doc here
    carries planted SIT values, so the hash check exercises real
    replacements. The DuckDB oracle runs the sequential catalog-order
    replace CHAIN over the identical corpus: a green row is a
    cross-implementation proof that the one-pass alternation equals
    the 34-pass chain on match-bearing text."""
    from ..operators.sitscan import redact_df

    return redact_df(_rendered_docs(spark, _REDACT_CONFIG))


def _redact_generated_sql(cfg: GenConfig, dialect: str) -> str:
    """Chain-form oracle for q99 (see q99_redact_generated docstring)."""
    d = _DIALECTS[dialect]
    col = "text"
    for sit_id, _name, regex, _tcs in SIT_CATALOG:
        if sit_id not in RE2_SAFE_IDS:
            continue
        pat = regex.replace("'", "''")
        flag = ", 'g'" if dialect == "duckdb" else ""
        col = f"regexp_replace({col}, '{pat}', '[{sit_id}]'{flag})"
    return expand_u16(f"""
      WITH {_gen_ctes(cfg, d)},
      {_rendered_cte(d)}
      SELECT doc_id,
             CAST((length({col}) - length(replace({col}, '[SIT_', ''))) / 5
                  AS BIGINT) AS n_redactions,
             md5({col}) AS redacted_md5
      FROM rendered ORDER BY doc_id
    """, dialect)


def q91_sit_issue_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Match-detail issue list over the generated corpus: every real
    (non-placeholder) match of an assigned (doc, SIT) pair with its
    0-based character position and ±30-char excerpt, deduped by value
    per (doc, SIT), capped at 5 rows per SIT and 500 rows globally.

    Re-expresses the reference validator's diagnostic capture
    (modules/validator.py:279-299 positions + excerpts, 210-233 per-SIT
    display samples, 351-352 global issue cap) with set semantics:
    dedup by match value, first-occurrence position via ``instr``, and
    deterministic (doc_id, match) ordering replacing Python list order.

    Scale shape: position and excerpt are computed in the same narrow
    projection that explodes the match list, so the cap window's
    shuffle never carries document text (see sitscan.cap_issues).
    """
    from pyspark.sql import functions as F

    from ..operators.sitscan import POSITION_EXCERPT_EXPRS, cap_issues

    matched = (
        _scanned_pairs(spark)
        .select("sit_id", "doc_id", "text", F.explode("ms").alias("match"))
        .selectExpr("sit_id", "doc_id", "match", *POSITION_EXCERPT_EXPRS)
        .distinct()
    )
    return cap_issues(matched)


def _issue_list_sql(cfg: GenConfig, dialect: str) -> str:
    """Single-SQL form of q91 (the DuckDB oracle; DuckDB has no codegen
    method limit so the dispatch stays one CASE)."""
    d = _DIALECTS[dialect]
    whens = " ".join(_ms_whens(d))
    scan_ids = ", ".join(f"'{sid}'" for sid in RE2_SAFE_IDS)
    unnest = "explode" if dialect == "spark" else "unnest"
    return expand_u16(f"""
      WITH {_gen_ctes(cfg, d)},
      {_rendered_cte(d)},
      pairs AS (
        SELECT v.sit_id, v.doc_id, r.text,
               {_ms_filtered(d, f"(CASE v.sit_id {whens} ELSE NULL END)")} AS ms
        FROM vals v JOIN rendered r ON v.doc_id = r.doc_id
        WHERE v.sit_id IN ({scan_ids})
      ),
      mrows AS (
        SELECT sit_id, doc_id, text, {unnest}(ms) AS match FROM pairs
      ),
      p AS (
        SELECT DISTINCT sit_id, doc_id, match,
               CAST(instr(text, match) - 1 AS BIGINT) AS start,
               replace(substr(text, greatest(1, instr(text, match) - 30),
                       least(length(text), instr(text, match) - 1 + length(match) + 30)
                       - greatest(0, instr(text, match) - 31)),
                       chr(10), ' ') AS excerpt
        FROM mrows
      ),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY sit_id ORDER BY doc_id, match) AS rn
        FROM p
      )
      SELECT sit_id, doc_id, match, start, excerpt
      FROM ranked WHERE rn <= 5
      ORDER BY sit_id, doc_id, match LIMIT 500
    """, dialect)


# --- q98: per-doc validation-failure list (the reference validator's
# issue branches, modules/validator.py:301-330). On a clean generated
# corpus both branches are provably empty (q62: tp_satisfied==tp_total,
# fp_flagged==0), so the driver query demonstrates the detector under
# deterministic FAULT INJECTION applied identically on both engines:
# every FLIP_MOD-th doc's TP pairs are relabeled FP (their planted
# values then count as FP hits), and every INFLATE_MOD-th doc's TP
# quota is inflated past what was planted (TP shortfall). The
# uninjected detector also feeds write_validation_report's issue lines.
_FAIL_FLIP_MOD = 7
_FAIL_INFLATE_MOD = 5
_FAIL_INFLATE_BY = 2


def validation_failures(pairs) -> "DataFrame":
    """Failure rows from a (doc_id, sit_id, label, instances, ms) pair
    relation: TP pairs with fewer real matches than max(1, instances)
    (validator.py:303-318) and FP pairs with any real match
    (validator.py:319-330). ``ms`` is the already-placeholder-filtered
    match list, so ``size(ms)`` is the reference's ``found_real``."""
    from pyspark.sql import functions as F

    needed = (
        F.when(
            F.col("label") == "TP",
            F.greatest(F.lit(1), F.col("instances")),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    return (
        pairs.select(
            "sit_id",
            "doc_id",
            "label",
            needed.alias("needed"),
            F.size("ms").cast("long").alias("found"),
        )
        .withColumn(
            "issue_type",
            F.when(
                (F.col("label") == "TP") & (F.col("found") < F.col("needed")),
                F.lit("TP_SHORTFALL"),
            ).when(
                (F.col("label") == "FP") & (F.col("found") > 0),
                F.lit("FP_HIT"),
            ),
        )
        .filter(F.col("issue_type").isNotNull())
    )


def inject_faults(pairs) -> "DataFrame":
    """Deterministic fault injection shared by q98 and the report
    writer: every FLIP_MOD-th doc's TP pairs are relabeled FP (their
    planted values then count as FP hits) and every INFLATE_MOD-th
    doc's TP quota is inflated past what was planted (TP shortfall)."""
    from pyspark.sql import functions as F

    return pairs.select(
        "doc_id",
        "sit_id",
        F.when(
            (F.col("doc_id") % _FAIL_FLIP_MOD == 0) & (F.col("label") == "TP"),
            F.lit("FP"),
        )
        .otherwise(F.col("label"))
        .alias("label"),
        F.when(
            (F.col("doc_id") % _FAIL_INFLATE_MOD == 0)
            & (F.col("label") == "TP"),
            F.col("instances") + _FAIL_INFLATE_BY,
        )
        .otherwise(F.col("instances"))
        .alias("instances"),
        "ms",
    )


def q98_validation_failures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fault-injected failure list, capped like q91 (5/SIT + 500
    global). Scale shape: the injection and failure predicates are
    narrow per-row maps over the per-assigned-pair scan; the cap window
    shuffles only short issue rows."""
    from ..operators.sitscan import cap_issues

    pert = inject_faults(_scanned_pairs(spark))
    return cap_issues(validation_failures(pert), order_cols=("doc_id",))


def _failures_sql(cfg: GenConfig, dialect: str) -> str:
    """Single-SQL twin of q98 — same fault-injection constants, same
    caps."""
    d = _DIALECTS[dialect]
    whens = " ".join(_ms_whens(d))
    scan_ids = ", ".join(f"'{sid}'" for sid in RE2_SAFE_IDS)
    return expand_u16(f"""
      WITH {_gen_ctes(cfg, d)},
      {_rendered_cte(d)},
      pairs AS (
        SELECT v.doc_id, v.sit_id, v.label, v.instances,
               {_ms_filtered(d, f"(CASE v.sit_id {whens} ELSE NULL END)")} AS ms
        FROM vals v JOIN rendered r ON v.doc_id = r.doc_id
        WHERE v.sit_id IN ({scan_ids})
      ),
      pert AS (
        SELECT doc_id, sit_id,
               CASE WHEN doc_id % {_FAIL_FLIP_MOD} = 0 AND label = 'TP'
                    THEN 'FP' ELSE label END AS label,
               CASE WHEN doc_id % {_FAIL_INFLATE_MOD} = 0 AND label = 'TP'
                    THEN instances + {_FAIL_INFLATE_BY}
                    ELSE instances END AS instances,
               ms
        FROM pairs
      ),
      f AS (
        SELECT sit_id, doc_id, label,
               CAST(CASE WHEN label = 'TP' THEN greatest(1, instances)
                         ELSE 0 END AS BIGINT) AS needed,
               CAST({d['len']}(ms) AS BIGINT) AS found
        FROM pert
      ),
      iss AS (
        SELECT sit_id, doc_id, label, needed, found,
               CASE WHEN label = 'TP' AND found < needed THEN 'TP_SHORTFALL'
                    WHEN label = 'FP' AND found > 0 THEN 'FP_HIT'
               END AS issue_type
        FROM f
      ),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY sit_id ORDER BY doc_id) AS rn
        FROM iss WHERE issue_type IS NOT NULL
      )
      SELECT sit_id, doc_id, label, needed, found, issue_type
      FROM ranked WHERE rn <= 5
      ORDER BY sit_id, doc_id LIMIT 500
    """, dialect)


def write_validation_report(
    spark: SparkSession,
    path: str,
    cfg: GenConfig = DEFAULT_CONFIG,
    inject: bool = False,
    coverage_target: int | None = None,
) -> str:
    """S17 sink: the single-file validation report text artifact
    (modules/validator.py:332-357), assembled from the oracle-checked
    distributed aggregates — the q60 per-SIT meta (ALL SITs, including
    the unscanned TC family, like the reference's mapping loop), the
    q62 scan results, and the FP issue lines from the per-pair scan.
    The collect()s fetch ≤ |catalog| + 500 short rows — final result
    fetch, not a driver-side compute loop. Returns the report text and
    writes it to ``path`` as one file.

    ``cfg`` must stay DEFAULT_CONFIG for the per-SIT/summary sections
    (q60/q62 are pinned to it); it parameterizes only the issue scan.
    ``inject=True`` applies q98's deterministic fault injection so both
    failure branches render real lines; ``coverage_target`` overrides
    the warning threshold (default ``cfg.per_sit_count``) — together
    they exercise every report section for the golden test.
    """
    from pyspark.sql import functions as F

    target = coverage_target if coverage_target is not None else cfg.per_sit_count
    meta = {r.sit_id: r for r in q60_gen_meta_summary(spark, "").collect()}
    val = {r.sit_id: r for r in q62_gen_validation_report(spark, "").collect()}
    # both validator failure branches (validator.py:303-330): TP docs
    # short of their quota and FP docs with any real-looking match, each
    # with a ≤5-value sample, capped at 500 lines like the reference
    pairs = _scanned_pairs(spark, cfg)
    if inject:
        pairs = inject_faults(pairs)
    issues = (
        pairs
        .withColumn("found", F.size("ms"))
        .withColumn(
            "needed",
            F.when(
                F.col("label") == "TP",
                F.greatest(F.lit(1), F.col("instances")),
            ).otherwise(F.lit(0)),
        )
        .filter(
            ((F.col("label") == "TP") & (F.col("found") < F.col("needed")))
            | ((F.col("label") == "FP") & (F.col("found") > 0))
        )
        .select(
            "doc_id", "sit_id", "label", "found", "needed",
            F.slice(F.array_distinct("ms"), 1, 5).alias("sample"),
        )
        .orderBy("sit_id", "doc_id")
        .limit(500)
        .collect()
    )

    lines = ["Validation report\n=================\n"]
    lines.append(f"Total unique SITs observed in mapping: {len(meta)}\n")
    for sid in sorted(meta):
        m, v = meta[sid], val.get(sid)
        tp = v.tp_satisfied if v is not None else 0
        fp = v.fp_flagged if v is not None else 0
        lines.append(
            f"{sid}: docs={m.n_docs}, tp_docs={tp}, fp_flagged={fp}, "
            f"total_instances={m.total_instances}"
        )
        if m.n_docs < target:
            lines.append(
                f"  >>> WARNING: only {m.n_docs} docs for {sid} "
                f"(target {target})"
            )

    n_rows = sum(m.n_docs for m in meta.values())
    n_inst = sum(m.total_instances for m in meta.values())
    lines.append("\nDistribution summary:\n")
    lines.append(f"Average SITs per doc: {n_rows / cfg.n_docs:.2f}")
    lines.append(f"Average instances per SIT (across docs): {n_inst / n_rows:.2f}")

    lines.append("\nDetected issues (first 500 lines):\n")
    if issues:
        lines.extend(
            (
                f"TP missing matches for doc {r.doc_id}, sit {r.sit_id}: "
                f"found {r.found} expected {r.needed} "
                f"sample_matches: {list(r.sample)}"
                if r.label == "TP"
                else f"FP contains valid-looking match in doc {r.doc_id}, "
                f"sit {r.sit_id}: sample {list(r.sample)}"
            )
            for r in issues
        )
    else:
        lines.append("No issues detected based on regex checks and heuristics.\n")

    text = "\n".join(lines)
    with open(path, "w", encoding="utf-8") as f:
        f.write(text)
    return text


QUERIES = {
    "q60_gen_meta_summary": q60_gen_meta_summary,
    "q61_gen_corpus_stats": q61_gen_corpus_stats,
    "q62_gen_validation_report": q62_gen_validation_report,
    "q91_sit_issue_list": q91_sit_issue_list,
    "q98_validation_failures": q98_validation_failures,
    "q99_redact_generated": q99_redact_generated,
}

ORACLES = {
    "q60_gen_meta_summary": _meta_summary_sql(DEFAULT_CONFIG, "duckdb"),
    "q61_gen_corpus_stats": _corpus_stats_sql(DEFAULT_CONFIG, "duckdb"),
    "q62_gen_validation_report": _validation_sql(DEFAULT_CONFIG, "duckdb"),
    "q91_sit_issue_list": _issue_list_sql(DEFAULT_CONFIG, "duckdb"),
    "q98_validation_failures": _failures_sql(DEFAULT_CONFIG, "duckdb"),
    "q99_redact_generated": _redact_generated_sql(_REDACT_CONFIG, "duckdb"),
}
