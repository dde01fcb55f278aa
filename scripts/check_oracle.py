#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run each oracle SQL
in DuckDB over the sf tables, load the Verify parquet dump, sort columns
by name + rows, and compare values exactly.

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (e.g. the ScaleGen sf1 copy): a
            # directory of part files rather than a single parquet
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # local-iteration filters (regex over names): CHECK_ONLY to restrict,
    # CHECK_SKIP for oracles with dedicated staged scripts (p119/p15/p67
    # at sf1+ — semantics identical, evaluation strategy materialized).
    # The driver never sets either, so its gate is unaffected.
    import re as _re
    only = os.environ.get("CHECK_ONLY")
    skip = os.environ.get("CHECK_SKIP")
    names = [n for n in sorted(oracle)
             if (not only or _re.search(only, n))
             and (not skip or not _re.search(skip, n))]
    if (only or skip) and not names:
        # a typo'd filter regex must not yield a silently green
        # "0 ok, 0 bad" run that checked nothing (r15 ADVICE)
        print(f"FILTERED-EMPTY: CHECK_ONLY={only!r} CHECK_SKIP={skip!r} "
              f"matched none of {len(oracle)} oracle names — nothing was checked")
        sys.exit(2)
    n_ok = n_bad = 0
    for name in names:
        sql = oracle[name]
        res_glob = f"{outdir}/{name}/*.parquet"
        if not glob.glob(res_glob):
            print(f"MISSING  {name}: no spark result parquet")
            n_bad += 1
            continue
        try:
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"ORACLEERR {name}: {e}")
            n_bad += 1
            continue
        got = canon(con.sql(f"SELECT * FROM '{res_glob}'").df())
        if list(got.columns) != list(exp.columns):
            print(f"SCHEMA   {name}: got {list(got.columns)} vs exp {list(exp.columns)}")
            n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"ROWS     {name}: got {len(got)} vs exp {len(exp)}")
            n_bad += 1
            continue
        bad_cols = []
        for c in got.columns:
            g, e = got[c], exp[c]
            # the driver's hash is dtype-KIND-sensitive: DuckDB HUGEINT →
            # float64 vs Spark int64 hash-differs on equal values (r3
            # cef09/cef10), while int32 vs int64 hash-passes (r3 q05/q15/
            # p01/p09 were green with that diff) — flag kind mismatches only
            if g.dtype.kind != e.dtype.kind:
                bad_cols.append(f"{c}(dtype {g.dtype} vs {e.dtype})")
                continue
            try:
                if g.dtype.kind == 'f' or e.dtype.kind == 'f':
                    ga, ea = g.astype(float).values, e.astype(float).values
                    if not np.array_equal(ga, ea, equal_nan=True):
                        md = np.nanmax(np.abs(ga - ea))
                        bad_cols.append(f"{c}(maxdiff={md:.3e})")
                else:
                    if not g.astype(str).equals(e.astype(str)):
                        n_diff = int((g.astype(str) != e.astype(str)).sum())
                        bad_cols.append(f"{c}({n_diff} diffs)")
            except Exception as ex:
                bad_cols.append(f"{c}(cmp err {ex})")
        if bad_cols:
            print(f"VALUES   {name}: {', '.join(bad_cols)}")
            n_bad += 1
        else:
            print(f"OK       {name} ({len(got)} rows)")
            n_ok += 1
    # queries without oracle → rows-only
    print(f"\n{n_ok} ok, {n_bad} bad, {len(names)} checked of {len(oracle)} with oracle")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
