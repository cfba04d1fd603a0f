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

# Queries that MUST occupy the round-13 window (VERDICT r12 Next #2):
# the r13 newborn q203 (update_release's gated funnel), four
# changed-path anchors (q201's exact arm now rides the q200 sketch-
# guided order statistic; q200's exact rounding gained the 1e-9 nudge
# on both engines; q155/q156's gram-set path factored through
# source_gram_counts/boilerplate_threshold_filter for the incremental
# release), the FULL 44-row r9-stale tier (computed from the
# CORRECTNESS_r* artifacts), and the second r13 newborn q204
# (token-weighted length quantiles on the q200 sketch, VERDICT r12
# #9). The r10 tier (49 rows) rotates wholesale in r14, led by q118.
R2_UNCHECKED = [
    f"q{i:02d}" for i in [203, 204,                        # born round 13
                          200, 201, 155, 156,              # changed paths
                          # the full r9-stale tier (44 rows)
                          1, 19, 20, 24, 28, 46, 55, 56,
                          60, 61, 62, 63, 64, 81,
                          108, 109, 110, 111, 112, 113, 114, 115,
                          117, 119, 122, 123, 124, 126, 127,
                          134, 135, 136, 137, 138, 139,
                          140, 141, 142, 143, 144, 146, 148, 149, 150]
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
