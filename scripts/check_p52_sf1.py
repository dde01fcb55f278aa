#!/usr/bin/env python3
"""sf1-scale oracle for p52_dd_chunk_dedup (r17 SCALE sweep).

Semantics are IDENTICAL to the registered DuckDB oracle; only the
EVALUATION STRATEGY changes. The registered single-statement form
references the tokenize+chunk+md5 CTE `k` three times (f, f2 and the
final aggregate); DuckDB inlines multi-referenced non-recursive CTEs,
so the one-shot form re-tokenizes and re-hashes the whole corpus three
times AND carries the chunk strings through each copy — >1.5 h at the
sf1 corpus. Materializing every CTE stage as a temp table evaluates
each exactly once; the final SELECT then runs VERBATIM off the
materialized `k` and `f2`.

The stage SQL is NOT restated here — it is parsed out of the oracle
string the engine registers (oracle_sql.json from the Verify dump), so
this script can never drift from the registered semantics.

Usage: check_p52_sf1.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os, time
import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_p15_sf1 import split_ctes


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    p = f"{sfdir}/documents.parquet"
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
    con.sql(f"CREATE VIEW documents AS SELECT * FROM {src}")

    oracle = json.load(open(f"{outdir}/oracle_sql.json"))["p52_dd_chunk_dedup"]
    ctes, order, final = split_ctes(oracle)
    assert order == ["t", "starts", "ch", "k", "f", "f2"], order

    for name in order:
        t0 = time.time()
        con.sql(f"CREATE TEMP TABLE {name} AS {ctes[name]}")
        n = con.sql(f"SELECT count(*) FROM {name}").fetchone()[0]
        print(f"stage {name:6s}: {n:>10} rows  {time.time()-t0:7.1f} s", flush=True)

    expected = con.sql(final).df().reset_index(drop=True)
    got = pd.read_parquet(
        sorted(glob.glob(f"{outdir}/p52_dd_chunk_dedup/*.parquet")))
    got = got.sort_values("doc_id").reset_index(drop=True)
    expected = expected.sort_values("doc_id").reset_index(drop=True)

    ok = True
    if len(got) != len(expected):
        print(f"BAD row count: spark {len(got)} vs oracle {len(expected)}")
        ok = False
    else:
        for c in sorted(expected.columns):
            if not (got[c].to_numpy() == expected[c].to_numpy()).all():
                bad = (got[c].to_numpy() != expected[c].to_numpy()).sum()
                print(f"BAD column {c}: {bad} mismatching rows")
                ok = False
    kept = int(expected["n_kept"].sum())
    print(("OK" if ok else "BAD") +
          f"  p52_dd_chunk_dedup: {len(expected)} docs, {kept} kept chunks")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
