#!/usr/bin/env python
"""Driver-window rotation math, derived fresh from the correctness
files (the CLAUDE.md standing rule: NEVER trust a pre-derived cohort
without recounting — the r7/r8/r9-era pre-derivations were each off by
one until this recount was run by hand; r9/r10/r11's survived because
the recount became routine).

Prints, for the NEXT round:
  - the newest-row histogram over all registered queries
    (virtual rows from REGISTERED_ROUND included, labeled),
  - rule-3 traffic (names whose newest real row is not green),
  - the horizon-critical lead cohort (names whose newest row leaves
    the ceil(N/50)-file horizon when the next file lands),
  - the family sentinel count of any candidate window file,
  - names in the CURRENT DRIVER_PRIORITY with their newest rows (so
    rule-2 additions can be checked against actual staleness).

Usage:
    python tools/rotation.py            # derive for the next round
    python tools/rotation.py --check    # also assert the current
                                        # window covers every
                                        # horizon-critical name
"""

from __future__ import annotations

import glob
import json
import math
import re
import sys
from collections import Counter
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def newest_rows(repo_dir: str = REPO,
                ) -> tuple[dict[str, int], dict[str, int], list[int]]:
    """(name -> newest fully-green real row, name -> newest ANY real
    row, rounds seen).  A green row = rows_match AND schema_match AND
    hash_match.  Staleness (CLAUDE.md rule 1: 'no driver row') is
    measured on ANY-row — a red or no_oracle row IS a driver row; red
    rows are rule-3 traffic, not staleness (r10 ADVICE).  Green-row
    recency is still reported so a name whose newest row is red shows
    up loudly."""
    green: dict[str, int] = {}
    any_row: dict[str, int] = {}
    rounds: list[int] = []
    for f in sorted(glob.glob(f"{repo_dir}/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", Path(f).name).group(1))
        rounds.append(rnd)
        for name, res in json.load(open(f)).items():
            any_row[name] = max(any_row.get(name, 0), rnd)
            if (res.get("rows_match") and res.get("schema_match")
                    and res.get("hash_match")):
                green[name] = max(green.get(name, 0), rnd)
    return green, any_row, rounds


def derive(names: set[str], registered_round: dict[str, int],
           green: dict[str, int], any_row: dict[str, int],
           rounds: list[int]) -> dict:
    """Pure window-derivation math (testable without the repo's files).

    Returns: effective newest row per name (virtual rows applied),
    the virtual-row set, rule-3 traffic (newest real row not green),
    the horizon-critical lead cohort for the NEXT round, and the
    horizon bound r{oldest_kept}.  Horizon staleness counts FILES, not
    round numbers, so a missing gate file (the r5 hiccup) stretches
    the horizon a round exactly as CLAUDE.md describes."""
    n = len(names)
    lag = math.ceil(n / 50)
    latest = max(rounds)

    # virtual rows: a query registered in round R counts as having a
    # row from R-1 until a real row lands.  Horizon math uses ANY-row
    # recency (a red row is still a driver row — rule 3 handles reds).
    effective: dict[str, int] = {}
    virtual: set[str] = set()
    for q in names:
        if q in any_row:
            effective[q] = any_row[q]
        else:
            effective[q] = registered_round.get(q, 1) - 1
            virtual.add(q)

    # rule-3 traffic: names whose newest real row is NOT green (red or
    # no_oracle newer than any green row) — they get windowed by rule 3
    # regardless of staleness
    red_newest = sorted(q for q in names
                        if q in any_row and green.get(q, 0) < any_row[q])

    # the horizon at r{next} covers the last `lag` FILES; a name whose
    # newest row predates the oldest file still in the horizon after
    # the next file lands is horizon-critical NOW
    horizon_files = sorted(rounds)[-(lag - 1):] if lag > 1 else []
    oldest_kept = min(horizon_files) if horizon_files else latest + 1
    lead = sorted(q for q in names if effective[q] < oldest_kept)

    return {"lag": lag, "latest": latest, "effective": effective,
            "virtual": virtual, "red_newest": red_newest,
            "oldest_kept": oldest_kept, "lead": lead}


def main() -> None:
    from janusgraph_clickhouse_spark.plans import get_queries
    from janusgraph_clickhouse_spark.plans.registry import (
        DRIVER_PRIORITY, REGISTERED_ROUND)

    names = set(get_queries())
    green, any_row, rounds = newest_rows()
    d = derive(names, REGISTERED_ROUND, green, any_row, rounds)
    effective, nxt = d["effective"], d["latest"] + 1

    hist = Counter(effective.values())
    print(f"registered: {len(names)}; horizon lag ceil(N/50) = "
          f"{d['lag']} files; latest file r{d['latest']}; "
          f"deriving for r{nxt}")
    print("newest-row histogram:",
          {f"r{k}": v for k, v in sorted(hist.items())})

    if d["red_newest"]:
        print(f"\nrule-3 traffic (newest row not green): "
              f"{len(d['red_newest'])}")
        for q in d["red_newest"]:
            print(f"  {q}  newest r{any_row[q]}, "
                  f"newest green r{green.get(q, 0) or '—'}")

    print(f"\nhorizon-critical lead cohort for r{nxt} "
          f"(newest row < r{d['oldest_kept']}, would leave the "
          f"horizon): {len(d['lead'])}")
    for q in d["lead"]:
        tag = " (virtual)" if q in d["virtual"] else ""
        print(f"  {q}  r{effective[q]}{tag}")

    fam = Counter(q[0] for q in DRIVER_PRIORITY)
    print(f"\ncurrent DRIVER_PRIORITY ({len(DRIVER_PRIORITY)}): "
          f"family sentinels {dict(sorted(fam.items()))}")

    if "--check" in sys.argv:
        missing = [q for q in d["lead"] if q not in DRIVER_PRIORITY]
        assert not missing, (
            f"horizon-critical names NOT in the current window: "
            f"{missing}")
        missing_red = [q for q in d["red_newest"]
                       if q not in DRIVER_PRIORITY]
        assert not missing_red, (
            f"rule-3 names (newest row red) NOT in the current window: "
            f"{missing_red}")
        bad_fam = [f for f in ("q", "g", "l", "s") if fam.get(f, 0) < 2]
        assert not bad_fam, f"family sentinel rule violated: {bad_fam}"
        print("check: window covers every horizon-critical and rule-3 "
              "name and the >=2-per-family sentinel rule")


if __name__ == "__main__":
    main()
