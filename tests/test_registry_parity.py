"""Driver-contract parity: every operator registered anywhere is registered
everywhere.

Round-5 postmortem (VERDICT.md r5 "What's wrong" #1): `heavy_hitters`
landed in the query registry after the driver's correctness pass ran, so
the graded CORRECTNESS_r05.json had 50 rows for 51 queries. The grading
bar is "a green CORRECTNESS row per operator", so a name-set mismatch
between the registry, the entrypoint, and the bench list is a silent
coverage hole. These tests make that structurally impossible:

- `crabspark.queries.REGISTRY` is the single source of truth;
- `__spark_entry__.queries()/oracle_sql()` (what the driver snapshots)
  must expose exactly that set;
- `bench.BENCH_QUERIES` (what BENCH_r{N}.json times) is now DERIVED from
  the registry and must equal it;
- the latest on-disk CORRECTNESS_r*.json must not contain names the
  registry has dropped (renames leave stale green rows that grade
  nothing) — new names are allowed to exceed the snapshot, that is the
  race this guards the NEXT snapshot against, not a failure now.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from crabspark import queries as Q  # noqa: E402


def test_entry_matches_registry():
    import __spark_entry__ as entry

    assert set(entry.queries()) == set(Q.queries())
    assert set(entry.oracle_sql()) == set(Q.oracle_sql())


def test_bench_list_matches_registry():
    import bench

    assert set(bench.BENCH_QUERIES) == set(Q.queries())
    # and nothing is benched twice (a dup would double-count a query's time)
    assert len(bench.BENCH_QUERIES) == len(set(bench.BENCH_QUERIES))


def test_oracle_sql_covers_every_query():
    """Every registered query has a DuckDB oracle. If a genuinely
    non-SQL-expressible operator ever lands with sql=None, list it here
    explicitly so the weaker rows-only check is a documented decision,
    not drift."""
    rows_only_allowed: set[str] = set()
    missing = set(Q.queries()) - set(Q.oracle_sql()) - rows_only_allowed
    assert not missing, f"queries with no oracle and no waiver: {missing}"


def test_no_stale_names_in_latest_correctness_snapshot():
    snaps = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if not snaps:  # fresh clone without driver artifacts
        return
    latest = max(snaps, key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    with open(latest) as f:
        snap = set(json.load(f))
    stale = snap - set(Q.queries())
    assert not stale, f"{latest} has rows for unregistered queries: {stale}"
