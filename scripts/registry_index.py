"""Generate REGISTRY.md — the machine-derived index of every registry
query: where it lives, whether it has a DuckDB oracle, which artifact
surfaces cover it (bench HEADLINE, scaling PROBE tiers, plan showcase),
and the round of its newest external driver row.

Motivation (VERDICT r11 #7 / "What's wrong"): COVERAGE.md's hand-copied
per-query numbers drifted from the committed SCALING artifact within a
single round. Everything in this index is DERIVED — from the registry
itself, the script constant lists, and the CORRECTNESS_r*.json
artifacts — so it cannot drift; tests/test_registry_hygiene.py
regenerates it and fails if the committed file is stale.

Usage: python scripts/registry_index.py   (rewrites REGISTRY.md)

Coupling (VERDICT r13 #1, superseding the r12 note): the driver-row
column scans only git-TRACKED CORRECTNESS_r*.json. The external driver
drops each round's artifact AFTER the builder's last commit, so an
on-disk scan made every round end red at HEAD by construction — an
untracked post-freeze artifact must not redden a frozen tree. Each
round's reconciliation commit (`git add CORRECTNESS_rN.json` + regen)
is what advances the column, which is the audit trail we want anyway.
Fallback: outside a git checkout (or if git fails) every on-disk
artifact counts.
"""

from __future__ import annotations

import inspect
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def _tracked_artifacts() -> list[str] | None:
    """Names of git-tracked CORRECTNESS_r*.json, or None when git is
    unavailable (then the caller falls back to the on-disk listing)."""
    try:
        out = subprocess.run(
            ["git", "ls-files", "CORRECTNESS_r*.json"],
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=30,
            check=True,
        ).stdout
    except Exception:
        return None
    return [ln.strip() for ln in out.splitlines() if ln.strip()]


def generate() -> str:
    import bench
    import dump_plans
    import scaling_probe

    from synthetic_data_pipeline_spark.queries import all_oracles, all_queries

    queries = all_queries()
    oracles = all_oracles()
    headline = set(bench.HEADLINE)
    probe10 = set(scaling_probe.PROBE)
    probe100 = set(scaling_probe.PROBE_100)
    showcase = {n for n, _ in dump_plans.SHOWCASE}

    last_driver: dict[str, int] = {}
    tracked = _tracked_artifacts()
    names = tracked if tracked is not None else os.listdir(REPO)
    for fn in names:
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fn)
        if not m or not os.path.exists(os.path.join(REPO, fn)):
            continue
        rnd = int(m.group(1))
        with open(os.path.join(REPO, fn)) as fh:
            data = json.load(fh)
        # artifact shape: {query_name: {...row...}, ...} (per-round
        # driver output); tolerate a {"queries": {...}} wrapper too
        rows = data.get("queries", data) if isinstance(data, dict) else {}
        for name in rows:
            if re.match(r"q\d+_", str(name)):
                last_driver[name] = max(last_driver.get(name, 0), rnd)

    def qnum(name: str) -> int:
        return int(re.match(r"q(\d+)_", name).group(1))

    lines = [
        "# REGISTRY — generated query index (do not edit by hand)",
        "",
        "Regenerate with `python scripts/registry_index.py`; "
        "`tests/test_registry_hygiene.py::test_registry_index_is_fresh` "
        "fails when this file is stale. Every column is derived: "
        "location from the registry function itself, coverage flags "
        "from bench.HEADLINE / scaling_probe.PROBE(_100) / "
        "dump_plans.SHOWCASE, driver round from the newest git-tracked "
        "CORRECTNESS_r*.json naming the query (untracked post-freeze "
        "artifacts are ignored until their reconciliation commit).",
        "",
        "| query | module:line | oracle | bench | probe | plan | driver row |",
        "|---|---|---|---|---|---|---|",
    ]
    for name in sorted(queries, key=qnum):
        fn = queries[name]
        src = os.path.relpath(inspect.getsourcefile(fn), REPO)
        line = inspect.getsourcelines(fn)[1]
        probes = []
        if name in probe10:
            probes.append("10x")
        if name in probe100:
            probes.append("100x")
        rnd = last_driver.get(name)
        lines.append(
            "| {n} | {src}:{line} | {orc} | {b} | {p} | {sh} | {r} |".format(
                n=name,
                src=src,
                line=line,
                orc="yes" if name in oracles else "—",
                b="headline" if name in headline else "—",
                p="+".join(probes) if probes else "—",
                sh="showcase" if name in showcase else "—",
                r=f"r{rnd}" if rnd else "local-only",
            )
        )
    lines += [
        "",
        f"Totals: {len(queries)} queries, "
        f"{sum(1 for n in queries if n in oracles)} with oracles, "
        f"{sum(1 for n in queries if n in headline)} in bench HEADLINE, "
        f"{sum(1 for n in queries if n in probe10 | probe100)} in the "
        f"scaling probe, {sum(1 for n in queries if n in showcase)} in "
        "the plan showcase.",
        "",
    ]
    return "\n".join(lines)


def main() -> None:
    out = os.path.join(REPO, "REGISTRY.md")
    with open(out, "w") as fh:
        fh.write(generate())
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
