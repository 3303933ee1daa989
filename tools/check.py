#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet result plus oracle_sql.json,
registers <sfDir>/*.parquet as DuckDB views named after the table, runs the
oracle SQL, and compares: schema (sorted column names), row count, and values
(columns sorted by name, rows sorted by all columns, exact match after string
normalization). Mirrors the driver's compare closely enough to iterate
locally before each round's CORRECTNESS_r{N}.json.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize all values to strings to dodge dtype mismatches (int32/int64)
    out = df.copy()
    for c in out.columns:
        col = out[c]
        if pd.api.types.is_float_dtype(col):
            out[c] = col.map(lambda v: "NULL" if pd.isna(v) else f"{v:.6f}")
        else:
            out[c] = col.map(lambda v: "NULL" if v is None or (isinstance(v, float) and pd.isna(v)) else str(v))
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        t = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    results = {}
    found = sorted([d for d in os.listdir(out_dir)
                    if os.path.isdir(os.path.join(out_dir, d))])
    # a query that crashed inside Verify writes no dir — that is a FAIL, not
    # a silent absence from the compare set. queries.txt (full registry
    # manifest) covers rows-only queries too; fall back to oracle keys.
    manifest_path = os.path.join(out_dir, "queries.txt")
    if os.path.exists(manifest_path):
        expected = set(open(manifest_path).read().split())
    else:
        expected = set(oracles)
    for name in sorted(expected - set(found)):
        results[name] = "MISSING_OUTPUT (query failed in Verify?)"
    names = found
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            results[name] = "EMPTY_RESULT"
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracles:
            results[name] = f"NO_ORACLE rows={len(got)}"
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(g.columns)} duck={list(e.columns)}"
        elif len(g) != len(e):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(g)} duck={len(e)}"
        elif len(g) == 0:
            # two empty frames are value-equal (the driver hashes values;
            # empty == empty) even when pandas dtypes differ
            results[name] = "OK"
        elif not g.equals(e):
            diff = (g != e).any(axis=1)
            i = diff.idxmax()
            results[name] = (f"VALUE_MISMATCH first_diff_row={i} "
                             f"spark={g.loc[i].to_dict()} duck={e.loc[i].to_dict()}")
        else:
            results[name] = "OK"

    n_ok = sum(1 for v in results.values() if v == "OK")
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v=='OK' else 'FAIL' if not v.startswith('NO_ORACLE') else 'SKIP':4s} {k}: {v}")
    print(f"\n{n_ok}/{len([r for r in results.values() if not r.startswith('NO_ORACLE')])} oracle-checked queries OK")
    sys.exit(0 if all(v == "OK" or v.startswith("NO_ORACLE") for v in results.values()) else 1)

if __name__ == "__main__":
    main()
