"""Driver-window invariants (ADVICE r2, medium).

The external harness records correctness rows for only the first 50
``queries()`` entries per round. These tests pin the contract: the
rotation lives in ``__spark_entry__.py`` (driver layer), the product
registry stays in natural module order, and the window always leads
with the queries that most need a fresh driver row.
"""

from __future__ import annotations

import __spark_entry__ as e
from synthetic_data_pipeline_spark.queries import all_oracles, all_queries

DRIVER_CAP = 50

# Queries that MUST occupy the round-12 window (VERDICT r11 Next #1):
# the three r12 newborns (q202, the release-funnel capstone, took the
# head-start slot q122 would have had), the three changed-path anchors
# (q198's denominator change, q152/q170's shared simhash_state
# rewiring), the FULL 38-row r8-stale tier (computed from the
# CORRECTNESS_r* artifacts — the r11 VERDICT prose missed
# q47/q52/q71/q82), and 6 r9-tier head-start rows (release-pipeline
# deps q145/q147/q103, the two new bench media rows q100/q133, the
# flagship q90). The remaining r9 tier rotates in r13.
R2_UNCHECKED = [
    f"q{i:02d}" for i in [200, 201, 202,                   # born round 12
                          # (q202 took the head-start slot q122 would
                          # have had — q202 is the fresher member of
                          # the funnel-accounting family; q122 stays
                          # green locally and leads the r13 rotation)
                          198, 152, 170,                   # changed paths
                          # the full r8-stale tier
                          2, 3, 5, 8, 10, 13, 14, 15, 22, 29,
                          47, 52, 54, 70, 71, 72, 73, 74, 77, 79,
                          82, 91, 92, 93, 94, 95, 96, 97, 98,
                          101, 102, 105, 106, 107,
                          128, 129, 130, 131,
                          # r9 head start
                          145, 147, 103, 100, 133, 90]
]


def test_window_size_and_membership():
    assert len(e.DRIVER_WINDOW) == DRIVER_CAP
    assert len(set(e.DRIVER_WINDOW)) == DRIVER_CAP
    registry = set(all_queries())
    assert set(e.DRIVER_WINDOW) <= registry


def test_window_leads_queries_dict():
    first = list(e.queries())[:DRIVER_CAP]
    assert first == e.DRIVER_WINDOW


def test_full_registry_still_exposed():
    qs = e.queries()
    assert set(qs) == set(all_queries())
    # oracles mirror the same ordering contract
    orc = e.oracle_sql()
    assert set(orc) == set(all_oracles())


def test_stale_queries_inside_window():
    prefixes_in_window = {n.split("_")[0] for n in e.DRIVER_WINDOW}
    missing = [p for p in R2_UNCHECKED if p not in prefixes_in_window]
    assert not missing, (
        f"r2-unchecked queries outside the checked window: {missing}"
    )


def test_local_parity_artifact_covers_full_registry():
    """The full-registry local gate (scripts/driver_sim.py) must be
    re-run AFTER the last registry change of a round — a newborn query
    with no row in the newest CORRECTNESS_LOCAL artifact means the
    artifact predates the registry (VERDICT r7 Next #3)."""
    import json
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arts = {}
    for fn in os.listdir(repo):
        m = re.fullmatch(r"CORRECTNESS_LOCAL_r(\d+)\.json", fn)
        if m:
            arts[int(m.group(1))] = os.path.join(repo, fn)
    assert arts, "no CORRECTNESS_LOCAL artifact found — run driver_sim"
    with open(arts[max(arts)]) as fh:
        recorded = set(json.load(fh)["queries"])
    missing = sorted(set(all_queries()) - recorded)
    assert not missing, (
        f"registry queries missing from {arts[max(arts)]} — re-run "
        f"scripts/driver_sim.py after registry changes: {missing}"
    )
