"""SIT (Sensitive Information Type) catalog — config-as-data.

The reference ships 50 SIT definitions ``{id, name, regex, tc}`` in
config.json:30-237, loaded at modules/meta_generator.py:55-57 and
compiled per-run at modules/validator.py:42-54. The engine's catalog is
a small broadcast dimension table (SURVEY.md §1.1).

Patterns here are re-authored, not copied: each is normalized to be
semantically identical under Python ``re``, Java ``java.util.regex``
(Spark's rlike / regexp_extract_all) and RE2 (DuckDB) — flags hoisted
to a literal prefix, no lookbehind (SURVEY.md §4.3.3 portability trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (sit_id, name, regex, tcs). Regexes are engine-portable: no lookaround,
# no mid-pattern flags, no backreferences (RE2 has none of these).
SIT_CATALOG: list[tuple[str, str, str, list[str]]] = [
    ("SIT_CCN", "Credit Card Number", r"\b(?:4\d{3}|5[1-5]\d{2})[ -]?\d{4}[ -]?\d{4}[ -]?\d{4}\b", ["Finance"]),
    ("SIT_SSN", "US Social Security Number", r"\b[0-8]\d{2}-\d{2}-\d{4}\b", ["HR", "Tax"]),
    ("SIT_IBAN", "IBAN", r"\b[A-Z]{2}\d{2}[A-Z0-9]{12,30}\b", ["Finance"]),
    ("SIT_IPV4", "IPv4 Address", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", ["Network"]),
    ("SIT_EMAIL", "Email Address", r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b", ["Contact"]),
    ("SIT_PHONE", "US Phone Number", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", ["Contact"]),
    ("SIT_ABA", "ABA Routing Number", r"\b[0-3]\d{8}\b", ["Finance"]),
    ("SIT_PASSPORT", "US Passport Number", r"\b[A-Z]\d{8}\b", ["Travel"]),
    ("SIT_DEA", "DEA Number", r"\b[A-Z]{2}\d{7}\b", ["Health"]),
    ("SIT_SWIFT", "SWIFT Code", r"\b[A-Z]{4}[A-Z]{2}[A-Z0-9]{2}(?:[A-Z0-9]{3})?\b", ["Finance"]),
    ("SIT_ITIN", "US ITIN", r"\b9\d{2}-[78]\d-\d{4}\b", ["Tax"]),
    ("SIT_DATE", "ISO Date", r"\b\d{4}-\d{2}-\d{2}\b", ["General"]),
]

# RE2 (DuckDB) rejects backreferences like \1; every catalog pattern is
# authored without them, so the oracle-portable subset is currently the
# full catalog. The filter stays as a guard for future additions.
RE2_SAFE_IDS = [s[0] for s in SIT_CATALOG if "\\1" not in s[2]]


def sit_catalog_df(spark: SparkSession) -> DataFrame:
    """The catalog as a broadcast-sized dimension DataFrame."""
    return spark.createDataFrame(
        SIT_CATALOG, "sit_id string, sit_name string, regex string, tcs array<string>"
    )


def is_placeholder(col: F.Column) -> F.Column:
    """Reusable Column predicate classifying a matched value as a fake/
    placeholder, re-expressing the reference's 12-heuristic test
    (modules/validator.py:147-194) UDF-free (SURVEY.md §2.2 P7):
    substring markers, x/dash runs, all-one-char, all-zero digits,
    too-short, mostly-non-alphanumeric.
    """
    s = F.lower(F.trim(col))
    digits = F.regexp_replace(s, F.lit(r"[^0-9]"), F.lit(""))
    alnum = F.regexp_replace(s, F.lit(r"[^a-z0-9]"), F.lit(""))
    all_same_char = (F.length(alnum) > 0) & (
        F.length(F.replace(alnum, F.substring(alnum, 1, 1), F.lit(""))) == 0
    )
    return (
        s.contains("xxx")
        | s.contains("redacted")
        | s.contains("placeholder")
        | s.contains("example")
        | s.contains("sample")
        | s.rlike(r"^[x*\-_]{3,}$")
        | (F.length(s) <= 2)
        | all_same_char
        # digits present but all zero
        | ((F.length(digits) > 0) & digits.rlike(r"^0+$"))
        # >60% of characters non-alphanumeric
        | (F.length(alnum).cast("double") < F.length(s) * 0.4)
    )


# Spark-SQL-dialect twin of ``is_placeholder`` (for queries built as
# SQL text; Spark string literals process backslash escapes, DuckDB's
# don't — regexes here are escape-free on purpose).
def is_placeholder_spark_sql(var: str) -> str:
    s = f"lower(trim({var}))"
    alnum = f"regexp_replace({s}, '[^a-z0-9]', '')"
    digits = f"regexp_replace({s}, '[^0-9]', '')"
    return (
        "("
        f"position('xxx' IN {s}) > 0 OR "
        f"position('redacted' IN {s}) > 0 OR "
        f"position('placeholder' IN {s}) > 0 OR "
        f"position('example' IN {s}) > 0 OR "
        f"position('sample' IN {s}) > 0 OR "
        f"{s} RLIKE '^[x*\\\\-_]{{3,}}$' OR "
        f"length({s}) <= 2 OR "
        f"(length({alnum}) > 0 AND length(replace({alnum}, substr({alnum}, 1, 1), '')) = 0) OR "
        f"(length({digits}) > 0 AND {digits} RLIKE '^0+$') OR "
        f"CAST(length({alnum}) AS DOUBLE) < length({s}) * 0.4"
        ")"
    )


# DuckDB-dialect twin of ``is_placeholder`` for oracle SQL generation.
# Same spec, RE2 + DuckDB function names ('g' flag: DuckDB's
# regexp_replace is first-match-only by default, Spark's is global).
def is_placeholder_duckdb(var: str) -> str:
    s = f"lower(trim({var}))"
    alnum = f"regexp_replace({s}, '[^a-z0-9]', '', 'g')"
    digits = f"regexp_replace({s}, '[^0-9]', '', 'g')"
    return (
        "("
        f"position('xxx' IN {s}) > 0 OR "
        f"position('redacted' IN {s}) > 0 OR "
        f"position('placeholder' IN {s}) > 0 OR "
        f"position('example' IN {s}) > 0 OR "
        f"position('sample' IN {s}) > 0 OR "
        f"regexp_matches({s}, '^[x*\\-_]{{3,}}$') OR "
        f"length({s}) <= 2 OR "
        f"(length({alnum}) > 0 AND length(replace({alnum}, substr({alnum}, 1, 1), '')) = 0) OR "
        f"(length({digits}) > 0 AND regexp_matches({digits}, '^0+$')) OR "
        f"CAST(length({alnum}) AS DOUBLE) < length({s}) * 0.4"
        ")"
    )
