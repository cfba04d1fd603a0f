"""Measure the three UDF pathways on the same function (the
is_placeholder predicate over the sf0.1 lineitem comment-sized strings)
and write UDF_NOTES.md — the measured basis for the engine's
"expressions first" policy (SURVEY.md §2.9).

Usage: python scripts/udf_pathways_bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType


def _py_is_placeholder(v: str) -> bool:
    import re

    s = (v or "").strip().lower()
    alnum = re.sub(r"[^a-z0-9]", "", s)
    digits = re.sub(r"[^0-9]", "", s)
    return (
        any(m in s for m in ("xxx", "redacted", "placeholder", "example", "sample"))
        or bool(re.match(r"^[x*\-_]{3,}$", s))
        or len(s) <= 2
        or (len(alnum) > 0 and alnum == alnum[0] * len(alnum))
        or (len(digits) > 0 and set(digits) == {"0"})
        or len(alnum) < len(s) * 0.4
    )


def main() -> None:
    from synthetic_data_pipeline_spark.plans.catalog import is_placeholder
    from synthetic_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="udf-pathways")
    # ~1.2M strings with realistic variety (values + fabricated fakes)
    base = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").select(
        F.concat_ws(
            "-",
            F.col("l_orderkey").cast("string"),
            F.col("l_returnflag"),
            F.when(F.col("l_linenumber") % 7 == 0, F.lit("XXX")).otherwise(
                F.col("l_extendedprice").cast("string")
            ),
        ).alias("v")
    )
    for _ in range(5):  # 32x → ~19M rows so compute dominates overhead
        base = base.union(base)
    base = base.cache()
    n = base.count()

    @F.pandas_udf(BooleanType())
    def pandas_ph(v: pd.Series) -> pd.Series:
        return v.map(_py_is_placeholder)

    row_ph = F.udf(_py_is_placeholder, BooleanType())

    # numeric function: arithmetic fold, no regex
    import math

    def _py_arith(x: float) -> float:
        return (x * 17.0) % 97.0 + math.sqrt(abs(x)) * 0.5

    @F.pandas_udf("double")
    def pandas_arith(x: pd.Series) -> pd.Series:
        import numpy as np

        return (x * 17.0) % 97.0 + np.sqrt(x.abs()) * 0.5

    row_arith = F.udf(_py_arith, "double")
    num = base.select(
        (F.crc32(F.col("v")) % 100000 / 7.0).alias("x")
    ).cache()
    num.count()
    arith_builtin = (F.col("x") * 17.0) % 97.0 + F.sqrt(F.abs(F.col("x"))) * 0.5

    suites = {
        "regex-heavy predicate (is_placeholder)": [
            ("builtin_expressions", base, is_placeholder(F.col("v")).cast("int")),
            ("pandas_udf_arrow", base, pandas_ph("v").cast("int")),
            ("python_row_udf", base, row_ph("v").cast("int")),
        ],
        "arithmetic function": [
            ("builtin_expressions", num, arith_builtin),
            ("pandas_udf_arrow", num, pandas_arith("x")),
            ("python_row_udf", num, row_arith("x")),
        ],
    }
    lines = [
        "# UDF_NOTES — measured cost of the three UDF pathways",
        "",
        f"Two functions over {n:,} rows on local[32] (sf0.1-derived data,",
        "min of 2 runs, `scripts/udf_pathways_bench.py`). The nuance behind",
        "the engine's expressions-first policy (SURVEY.md §2.9):",
        "",
        "- **Arithmetic / simple string work**: built-in expressions win —",
        "  whole-stage codegen, no serialization boundary at all.",
        "- **Regex-heavy predicates**: the Arrow pandas UDF can WIN, because",
        "  the Column form re-executes regexp_replace subtrees per reference",
        "  (no cross-reference CSE) and java.util.regex trails C-backed",
        "  `re` on short strings. Row-at-a-time Python remains the worst of",
        "  the Python options at every shape.",
        "",
        "Engine policy stays expressions-first for correctness-critical",
        "paths (oracle-parity is defined on expression semantics), with the",
        "Arrow path as the measured escape hatch for regex-dense hot loops.",
        "",
    ]
    for title, cases in suites.items():
        lines += [f"## {title}", "", "| pathway | seconds | vs builtin |", "|---|---|---|"]
        timings = {}
        for name, src, col in cases:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                src.select(col.alias("p")).agg(F.sum("p")).collect()
                best = min(best, time.perf_counter() - t0)
            timings[name] = best
        b = timings["builtin_expressions"]
        for name, t in timings.items():
            lines.append(f"| {name} | {t:.2f} | {t / b:.1f}x |")
        lines.append("")
    with open(
        os.path.join(os.path.dirname(__file__), "..", "UDF_NOTES.md"), "w"
    ) as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
