"""Local replica of the driver's duckdb-oracle correctness gate.

Runs every entry of ``queries()`` against the matching ``oracle_sql()`` on
the same parquet tables and compares row count, column names/types and an
order-insensitive value comparison (exact after string normalization --
stricter than a hash: shows the first differing rows).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
       python tools/oracle_check.py [sf_dir] --window N   # first N registry
       entries -- the exact slice the driver samples per round
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    args = sys.argv[2:]
    window = None
    if "--window" in args:
        i = args.index("--window")
        window = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    only = set(args)

    import __spark_entry__ as entrymod
    from dask_patternsearch_spark.session import get_spark

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = get_spark("oracle-check", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")

    n_pass = n_fail = n_rowsonly = 0
    items = list(qs.items())
    if window is not None:
        items = items[:window]
    for name, fn in items:
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (rows-only check, no oracle)")
            n_rowsonly += 1
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rowcount spark={len(sdf)} duckdb={len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"columns spark={sorted(sdf.columns)} duckdb={sorted(ddf.columns)}")
        if not problems:
            a, b = normalize(sdf), normalize(ddf)
            # The driver's gate hashes TYPED values: an int-vs-float column
            # (e.g. DuckDB HUGEINT -> pandas float) fails its hash even when
            # values compare equal, while integer-width drift (int32 vs
            # int64) passed in round 1.  Flag kind-level drift as a failure
            # so it cannot reach the driver unseen.
            dtype_mismatch = [
                f"{c}: spark={a[c].dtype} duckdb={b[c].dtype}"
                for c in a.columns
                if a[c].dtype.kind.replace("u", "i") != b[c].dtype.kind.replace("u", "i")
            ]
            if dtype_mismatch:
                problems.append("dtype drift (driver hash would fail): " + "; ".join(dtype_mismatch))
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            except AssertionError as exc:
                diff_mask = None
                try:
                    diff_mask = (a != b) & ~(a.isna() & b.isna())
                    bad = diff_mask.any(axis=1)
                    sample = pd.concat(
                        [a[bad].head(3).add_suffix("_spark"), b[bad].head(3).add_suffix("_duck")],
                        axis=1,
                    )
                    problems.append(f"values differ in {int(bad.sum())} rows\n{sample}")
                except Exception:
                    problems.append(f"values differ: {str(exc)[:400]}")
        if problems:
            n_fail += 1
            print(f"FAIL  {name}: " + "; ".join(str(p) for p in problems))
        else:
            n_pass += 1
            print(f"PASS  {name} ({len(sdf)} rows)")

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
