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

# Queries that MUST occupy the round-7 window (VERDICT r6 Next #2):
# the three never-driver-checked queries (q120/q121/q125), the eleven
# r3/r4-stale relational queries displaced in r6, and the four anchors
# whose code paths change this round (q54 pre-filter, q122 oracle fix,
# q104/q118 funnel lineage).
R2_UNCHECKED = [
    f"q{i:02d}" for i in [120, 121, 125,                      # never checked
                          126, 127,                           # born round 7
                          4, 6, 7, 9, 11, 16, 17, 18, 21, 26, 80,  # r3/r4
                          54, 104, 118, 122]                  # changed paths
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
