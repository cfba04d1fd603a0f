"""Dump explain('formatted') for named registry queries to plans/r15/.

Usage: python scripts/r15_plan_dump.py before q203_delta_release_classes ...
       python scripts/r15_plan_dump.py after  q203_delta_release_classes ...

Writes plans/r15/<query>_<tag>.txt. Each query is executed once (noop
sink) BEFORE the dump so session memos are warm — the dumped plan is
the one the bench's min-of-2 headline actually measures (the warm
path), matching the r14 convention.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synthetic_data_pipeline_spark.queries import all_queries  # noqa: E402
from synthetic_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    assert tag in ("before", "after"), tag
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r15",
    )
    os.makedirs(out_dir, exist_ok=True)
    qs = all_queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark(app_name="r15-plan-dump")
    for name in names:
        # warm pass: builds session memos so the dumped plan is the
        # warm-path plan the bench headline measures
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
