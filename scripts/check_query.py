"""Spot-check one or more registry queries against their DuckDB oracle.

Usage: python scripts/check_query.py q104_ngram_jaccard_join [more...]
       SPARK_GRAFT_SF_DIR overrides the default sf0.01 input.

Same canonical compare as driver_sim, but only for the named queries —
the fast inner loop while developing a new operator.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from scripts.driver_sim import TABLES, canon  # noqa: E402
from synthetic_data_pipeline_spark.queries import all_oracles, all_queries  # noqa: E402
from synthetic_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("/")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    qs, oracles = all_queries(), all_oracles()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark(app_name="check-query")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    fail = 0
    for name in names:
        t0 = time.time()
        sdf = qs[name](spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"WEAK {name}: rows={len(sdf)} (no oracle)")
            continue
        odf = con.execute(oracles[name]).df()
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        s_rows, o_rows = canon(sdf), canon(odf)
        ok = ok_cols and s_rows == o_rows
        print(f"{'PASS' if ok else 'FAIL'} {name}: spark={len(s_rows)} "
              f"oracle={len(o_rows)} cols_ok={ok_cols} "
              f"[{time.time() - t0:.1f}s]")
        if not ok:
            fail += 1
            if not ok_cols:
                print(f"  spark cols:  {sorted(sdf.columns)}")
                print(f"  oracle cols: {sorted(odf.columns)}")
            diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:5]
            for a, b in diffs:
                print(f"  spark:  {a}\n  oracle: {b}")
    spark.stop()
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
