"""Registry hygiene meta-tests (VERDICT r9 Next #8): 145+ queries now
span 13 modules, and nothing structural kept the registry navigable —
these pin the conventions the repo already follows so drift fails a
test instead of a reviewer.
"""

from __future__ import annotations

import os
import re

from synthetic_data_pipeline_spark.queries import _MODULES, all_oracles, all_queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_query_names_follow_convention():
    pat = re.compile(r"^q\d{2,3}_[a-z0-9_]+$")
    bad = [n for n in all_queries() if not pat.fullmatch(n)]
    assert not bad, f"non-conforming query names: {bad}"


def test_query_numbers_unique():
    nums: dict[str, list[str]] = {}
    for n in all_queries():
        nums.setdefault(n.split("_")[0], []).append(n)
    dups = {k: v for k, v in nums.items() if len(v) > 1}
    assert not dups, f"duplicate query numbers: {dups}"


def test_queries_defined_in_registering_module():
    """A QUERIES entry must point at a callable DEFINED in the module
    that registers it — a re-export would make 'where does qN live'
    ambiguous and break the VERDICT table's file:line citations."""
    misplaced = []
    for m in _MODULES:
        for name, fn in m.QUERIES.items():
            if getattr(fn, "__module__", None) != m.__name__:
                misplaced.append((name, m.__name__, fn.__module__))
    assert not misplaced, f"queries registered outside their module: {misplaced}"


def test_oracles_registered_beside_their_query():
    """Every module's ORACLES keys must be a subset of the SAME
    module's QUERIES keys (the all_oracles() check only guards the
    global union, so a cross-module oracle would slip through it)."""
    stray = []
    for m in _MODULES:
        extra = set(m.ORACLES) - set(m.QUERIES)
        if extra:
            stray.append((m.__name__, sorted(extra)))
    assert not stray, f"oracles without a same-module query: {stray}"


def test_plans_md_sections_match_registry():
    """PLANS.md is the reviewable plan showcase: every section heading
    must name a REAL registry query (a renamed/deleted query must not
    leave a stale plan behind), and the dump script's SHOWCASE list
    must only reference registry names."""
    registry = set(all_queries())
    with open(os.path.join(REPO, "PLANS.md")) as fh:
        heads = re.findall(r"^## (q\d+_\w+)", fh.read(), re.MULTILINE)
    assert heads, "PLANS.md has no query sections — regenerate it"
    stale = sorted(set(heads) - registry)
    assert not stale, (
        f"PLANS.md sections for queries not in the registry: {stale} — "
        "re-run scripts/dump_plans.py"
    )
    dups = sorted({h for h in heads if heads.count(h) > 1})
    assert not dups, f"duplicate PLANS.md sections: {dups}"


def test_every_query_has_an_oracle_or_documented_exception():
    """The driver gate hash-checks every query that ships an oracle;
    a query WITHOUT one gets only the weak rows-only check, so each
    such omission must be deliberate. This pins the current list —
    adding an oracle-less query forces the author to explain it here."""
    missing = sorted(set(all_queries()) - set(all_oracles()))
    assert missing == [], (
        "queries without a DuckDB oracle (add one, or document the "
        f"engine-specific exception in this test): {missing}"
    )


def test_registry_index_is_fresh():
    """REGISTRY.md is generated, never hand-edited (VERDICT r11 #7 —
    hand-copied per-query tables drifted from artifacts within one
    round). Regenerate in-memory and compare; a mismatch means a
    registry/bench/probe/showcase change landed without re-running
    scripts/registry_index.py."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import registry_index

    with open(os.path.join(REPO, "REGISTRY.md")) as fh:
        committed = fh.read()
    assert committed == registry_index.generate(), (
        "REGISTRY.md is stale — re-run scripts/registry_index.py"
    )


def test_registry_index_ignores_untracked_artifacts():
    """VERDICT r13 #1 (structural): the external driver drops each
    round's CORRECTNESS_rN.json AFTER the builder's last commit, so the
    index must derive its driver-row column from git-TRACKED artifacts
    only — a synthetic untracked CORRECTNESS_r99.json must leave the
    generated index byte-identical, or every round ends red at HEAD by
    construction."""
    import json
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import registry_index

    if registry_index._tracked_artifacts() is None:
        import pytest

        pytest.skip("not a git checkout — on-disk fallback in effect")

    fake = os.path.join(REPO, "CORRECTNESS_r99.json")
    assert not os.path.exists(fake)
    before = registry_index.generate()
    with open(fake, "w") as fh:
        json.dump({"q01_pricing_summary": {"rows_match": True}}, fh)
    try:
        assert registry_index.generate() == before
    finally:
        os.remove(fake)


def test_artifact_surface_lists_reference_registry_names():
    """bench.HEADLINE, scaling_probe.PROBE/PROBE_100 and
    dump_plans.SHOWCASE must only name registry queries — a renamed or
    deleted query would otherwise fail at bench/probe RUNTIME (hours
    into a round) instead of here."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    sys.path.insert(0, REPO)
    import bench
    import dump_plans
    import scaling_probe

    registry = set(all_queries())
    for label, names in (
        ("bench.HEADLINE", bench.HEADLINE),
        ("scaling_probe.PROBE", scaling_probe.PROBE),
        ("scaling_probe.PROBE_100", scaling_probe.PROBE_100),
        ("dump_plans.SHOWCASE", [n for n, _ in dump_plans.SHOWCASE]),
    ):
        unknown = sorted(set(names) - registry)
        assert not unknown, f"{label} names not in the registry: {unknown}"
        dups = sorted({n for n in names if names.count(n) > 1})
        assert not dups, f"{label} duplicate entries: {dups}"
