"""Unit tests for tools/rotation.py's window-derivation math.

The rotation tool is load-bearing process machinery: the driver checks
only the first 50 registry entries, and a derivation bug silently
starves a query of correctness evidence (the r7/r8 pre-derivations
were each off by one — caught only by hand recounts).  These tests pin
the pure math against synthetic correctness histories so refactors
can't regress it.  No Spark session needed.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.rotation import derive, newest_rows  # noqa: E402

GREEN = {"rows_match": True, "schema_match": True, "hash_match": True}
RED = {"rows_match": True, "schema_match": True, "hash_match": False}
ROWS_ONLY = {"rows_match": True}


def test_newest_rows_reads_files_and_splits_green_from_any(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"q1": GREEN, "q2": RED}))
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"q2": GREEN, "q3": ROWS_ONLY}))
    green, any_row, rounds = newest_rows(str(tmp_path))
    assert rounds == [1, 2]
    assert green == {"q1": 1, "q2": 2}          # q3 never green
    assert any_row == {"q1": 1, "q2": 2, "q3": 2}


def test_red_row_counts_for_staleness_but_flags_rule3():
    """r10 ADVICE: a red row IS a driver row — the name must not be
    treated as maximally stale (that's rule 3's job)."""
    names = {f"q{i:02d}" for i in range(60)}  # lag = ceil(60/50) = 2
    green = {n: 2 for n in names if n != "q59"}  # q59 never green...
    any_row = {n: 2 for n in names}              # ...but has a red r2 row
    d = derive(names, {}, green, any_row, rounds=[1, 2])
    # horizon at r3 keeps {r2, r3}: q59's red r2 row is still recent,
    # so it is NOT lead (any-row staleness) — it is rule-3 traffic
    assert d["lead"] == []
    assert d["red_newest"] == ["q59"]
    assert d["effective"]["q59"] == 2  # any-row recency, not 0


def test_lag1_every_name_is_horizon_critical():
    """With N <= 50 the window must carry every name every round."""
    names = {"q1", "q2"}
    green = {"q1": 2, "q2": 1}
    d = derive(names, {}, green, dict(green), rounds=[1, 2])
    assert d["lag"] == 1
    assert d["lead"] == ["q1", "q2"]


def test_virtual_rows_for_registered_but_never_driven():
    names = {f"q{i:02d}" for i in range(60)}  # lag = ceil(60/50) = 2
    green = {n: 2 for n in names if n != "q59"}
    any_row = dict(green)
    # q59 registered in round 2 -> virtual row at r1
    d = derive(names, {"q59": 2}, green, any_row, rounds=[1, 2])
    assert d["effective"]["q59"] == 1
    assert "q59" in d["virtual"]
    # horizon at r3 keeps files {r2, r3}: q59's virtual r1 row leaves
    assert d["lead"] == ["q59"]
    assert d["oldest_kept"] == 2


def test_horizon_counts_files_not_round_numbers():
    """A missing gate file (the r5 hiccup) stretches the horizon: with
    files {r1, r2, r4} and lag 2, the horizon after the next file is
    {r4, r5} — an r2 row is stale, an r4 row is not."""
    names = {f"q{i:02d}" for i in range(60)}  # lag = 2
    green = {n: 4 for n in names}
    green["q00"] = 2  # newest row in the r2 file
    any_row = dict(green)
    d = derive(names, {}, green, any_row, rounds=[1, 2, 4])
    assert d["oldest_kept"] == 4
    assert d["lead"] == ["q00"]


def test_lead_cohort_matches_lag_window_at_scale():
    """180 names, lag 4, files r1..r8: names whose newest row predates
    r6 (the oldest file kept once r9 lands) are exactly the lead."""
    names = {f"q{i:03d}" for i in range(180)}
    green = {}
    for i, n in enumerate(sorted(names)):
        green[n] = (i % 4) + 5  # rows r5..r8
    any_row = dict(green)
    d = derive(names, {}, green, any_row, rounds=list(range(1, 9)))
    assert d["lag"] == 4
    assert d["oldest_kept"] == 6
    expected = sorted(n for n in names if green[n] < 6)
    assert d["lead"] == expected


def test_current_repo_window_covers_lead_and_rule3():
    """The checked-in DRIVER_PRIORITY must satisfy the same invariants
    `rotation.py --check` asserts, against the repo's real files."""
    from janusgraph_clickhouse_spark.plans import get_queries
    from janusgraph_clickhouse_spark.plans.registry import (
        DRIVER_PRIORITY, REGISTERED_ROUND)
    names = set(get_queries())
    green, any_row, rounds = newest_rows()
    d = derive(names, REGISTERED_ROUND, green, any_row, rounds)
    assert not [q for q in d["lead"] if q not in DRIVER_PRIORITY]
    assert not [q for q in d["red_newest"] if q not in DRIVER_PRIORITY]
