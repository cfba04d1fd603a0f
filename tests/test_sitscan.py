"""q91 issue-list semantics: positions and excerpts must agree with
Python ``re``/str ground truth (the reference validator's finditer
loop, modules/validator.py:279-299), and the display caps must hold."""

from __future__ import annotations

import re
from collections import Counter

import duckdb

from synthetic_data_pipeline_spark.functions.xsql import expand_u16
from synthetic_data_pipeline_spark.operators.generation import (
    _DIALECTS,
    _gen_ctes,
    _rendered_cte,
    q91_sit_issue_list,
)
from synthetic_data_pipeline_spark.plans.catalog import SIT_CATALOG
from synthetic_data_pipeline_spark.plans.generate import DEFAULT_CONFIG


def test_redact_single_pass_equals_chain(spark, sf_dir):
    """The single-pass alternation redaction must agree per document
    with the sequential catalog-order replace chain — the semantic spec
    it optimizes. Runs over BOTH the documents table (match-free
    passthrough) and the generated corpus (every doc carries planted
    SIT values, so real replacements are exercised); q99's DuckDB chain
    oracle re-proves the generated-corpus case every round."""
    from synthetic_data_pipeline_spark.operators.generation import _rendered_docs
    from synthetic_data_pipeline_spark.operators.sitscan import (
        redact_chain_df,
        redact_df,
    )
    from synthetic_data_pipeline_spark.sources.tables import load_table

    corpora = {
        "documents": load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        ),
        "generated": _rendered_docs(spark),
    }
    for label, docs in corpora.items():
        fast = {r.doc_id: (r.n_redactions, r.redacted_md5)
                for r in redact_df(docs).collect()}
        chain = {r.doc_id: (r.n_redactions, r.redacted_md5)
                 for r in redact_chain_df(docs).collect()}
        assert fast == chain, f"{label}: single-pass != chain"
    assert any(n > 0 for n, _ in fast.values()), (
        "generated corpus redacted nothing — planted values unmatched"
    )


def test_issue_list_positions_and_excerpts(spark, sf_dir):
    rows = q91_sit_issue_list(spark, sf_dir).collect()
    assert rows, "issue list empty"
    assert len(rows) <= 500
    per_sit = Counter(r.sit_id for r in rows)
    assert max(per_sit.values()) <= 5
    # a meaningful diagnostic: most scanned SITs contribute rows
    assert len(per_sit) >= 20

    # ground-truth rendered text, independently derived through DuckDB
    d = _DIALECTS["duckdb"]
    sql = expand_u16(
        f"WITH {_gen_ctes(DEFAULT_CONFIG, d)}, {_rendered_cte(d)} "
        "SELECT doc_id, text FROM rendered",
        "duckdb",
    )
    texts = dict(duckdb.connect().execute(sql).fetchall())
    pats = {sid: re.compile(rx) for sid, _n, rx, _t in SIT_CATALOG if rx}
    for r in rows:
        text = texts[r.doc_id]
        # start is the first occurrence of the match value, 0-based
        assert text[r.start : r.start + len(r.match)] == r.match
        assert text.find(r.match) == r.start
        # excerpt mirrors the validator's ±30-char slice, newlines
        # flattened
        end = r.start + len(r.match)
        expected = text[max(0, r.start - 30) : min(len(text), end + 30)].replace(
            "\n", " "
        )
        assert r.excerpt == expected
        # the value is a real regex match of its SIT's pattern
        assert pats[r.sit_id].fullmatch(r.match) or pats[r.sit_id].search(
            r.match
        ), f"{r.sit_id}: {r.match!r} not a pattern match"
