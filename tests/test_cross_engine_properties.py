"""Property-style cross-engine parity for the foundational functions:
the md5 counter-mode draws and the 3-dialect is_placeholder predicate
must agree value-for-value between Spark and DuckDB on adversarial
inputs — these two primitives underpin every oracle match.
"""

from __future__ import annotations

import random
import string

import duckdb
from pyspark.sql import functions as F

from synthetic_data_pipeline_spark.functions.xsql import expand_u16, hash_u16, hash_unit
from synthetic_data_pipeline_spark.plans.catalog import (
    is_placeholder,
    is_placeholder_duckdb,
)

random.seed(1234)


def _random_values(n: int = 300) -> list[str]:
    vals = []
    alphabet = string.ascii_letters + string.digits + " .-_*@xX0"
    for _ in range(n):
        ln = random.randint(0, 24)
        vals.append("".join(random.choice(alphabet) for _ in range(ln)))
    # adversarial corners for the placeholder heuristics
    vals += [
        "", " ", "x", "xx", "xxx", "XXXX", "0000 0000 0000 0000",
        "999.999.999.999", "REDACTED_7", "a sample value", "Example.com",
        "___", "***", "---", "4111 1111 1111 1111", "123-45-6789",
        "!!!???!!!", "aAaAaA", "0", "00-00", "x0x0x0", "...",
    ]
    return vals


def test_hash_draws_match_duckdb(spark):
    keys = [str(i) for i in range(500)] + ["a:b", "doc_42", "slot"]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    u16 = expand_u16(hash_u16("k", "tagA"), "spark")
    unit = expand_u16(hash_unit("k", "tagB"), "spark")
    got = {
        r.k: (r.u, r.f)
        for r in df.selectExpr("k", f"{u16} AS u", f"{unit} AS f").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(k VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(k,) for k in keys])
    want = {
        k: (u, f)
        for k, u, f in con.execute(
            f"SELECT k, {expand_u16(hash_u16('k', 'tagA'), 'duckdb')}, "
            f"{expand_u16(hash_unit('k', 'tagB'), 'duckdb')} FROM t"
        ).fetchall()
    }
    assert got == want
    # uniformity sanity: draws cover the range without gross clumping
    us = [u for u, _ in got.values()]
    assert 0 <= min(us) and max(us) <= 65535
    assert len(set(us)) > len(us) * 0.95


def test_is_placeholder_dialects_agree(spark):
    vals = _random_values()
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {
        r.v: bool(r.p)
        for r in df.select("v", is_placeholder(F.col("v")).alias("p")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = {
        v: bool(p)
        for v, p in con.execute(
            f"SELECT v, {is_placeholder_duckdb('v')} FROM t"
        ).fetchall()
    }
    diff = {v: (got[v], want.get(v)) for v in got if got[v] != want.get(v)}
    assert not diff, f"dialect disagreement on: {diff}"
    # sanity of the spec itself
    assert got["0000 0000 0000 0000"] and got["999.999.999.999"]
    assert got["xxx"] and got["REDACTED_7"] and got["a sample value"]
    assert not got["4111 1111 1111 1111"] and not got["123-45-6789"]