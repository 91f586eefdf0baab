"""Local mimic of the driver's correctness harness.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over the
same sf dir, compares row count, column names, and order-insensitive values
(rows sorted, columns sorted by name, floats compared to 1e-9).

Usage: python scripts/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

# repo root (this file's parent dir) — works from any cwd, unlike '.'
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    sort_keys = []
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
            sort_keys.append(c)
        elif np.issubdtype(df[c].dtype, np.floating):
            # primary-sort on ROUNDED floats: noise below the 1e-9
            # comparison tolerance must not permute the two engines' rows
            # differently (that would mis-align rows and fail on some OTHER
            # column); the raw column is appended as a FINAL tie-break key
            # below so rows tying on every rounded key still order
            # deterministically on both engines.
            # Residual window: values within 1e-9 of each other but
            # straddling a 1e-6 rounding boundary would still key apart.
            # Closed by CONTRACT, not code: every exposed float is
            # F.round(..., 6) / ROUND(..., 6) on both sides (the verify
            # skill's invariant), so both engines emit the same 6-dp
            # decimal and re-rounding it here is stable — raw unrounded
            # floats must never be added to the contract surface
            df[f"_sort_{c}"] = df[c].round(6)
            sort_keys.append(f"_sort_{c}")
        else:
            sort_keys.append(c)
    raw_floats = [
        c for c in df.columns
        if not c.startswith("_sort_") and np.issubdtype(df[c].dtype, np.floating)
    ]
    out = df.sort_values(sort_keys + raw_floats, kind="stable").reset_index(drop=True)
    return out[[c for c in out.columns if not c.startswith("_sort_")]]


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    if len(sdf) != len(odf):
        problems.append(f"rowcount: spark={len(sdf)} oracle={len(odf)}")
    a, b = canon(sdf), canon(odf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            # ONE violation mask decides pass/fail AND selects the printed
            # examples — a single predicate, so the examples can never
            # disagree with the verdict. Float columns use the tolerance
            # (string inequality would surface benign 1e-15 shortest-repr
            # differences and bury the real offender).
            if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
                viol = ~np.isclose(
                    av.astype(float), bv.astype(float),
                    rtol=0, atol=1e-9, equal_nan=True,
                )
            else:
                viol = (av.astype(str) != bv.astype(str)).to_numpy()
            viol = np.asarray(viol)
            if viol.any():
                mism = viol.nonzero()[0][:5]
                ex = [(av.iloc[i], bv.iloc[i]) for i in mism]
                problems.append(f"values differ in col {c}: {ex}")
    return problems


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from bioner_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name must not produce a zero-check 'ALL OK'
        sys.exit(f"unknown query name(s): {sorted(unknown)}; "
                 f"known: {sorted(qs)}")
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:500]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:500]}")
            n_fail += 1
            continue
        try:
            problems = compare(name, sdf, odf)
        except Exception as e:
            # e.g. astype(float) on a string column one side returned as
            # VARCHAR — a type-skew FAIL for THIS query, never a harness
            # traceback that silently skips every remaining query
            problems = [f"compare error (type skew?): {str(e)[:300]}"]
        if problems:
            n_fail += 1
            print(f"FAIL {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"PASS {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
