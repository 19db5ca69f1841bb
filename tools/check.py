#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only; the shipped
library is pure Scala). Usage:
  python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
Compares each <verifyOutDir>/<name> parquet against the DuckDB oracle from
<verifyOutDir>/oracle_sql.json: row count, sorted column names, exact values.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        res_glob = os.path.join(out_dir, name, "*.parquet")
        if not glob.glob(res_glob):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.execute(f"SELECT * FROM '{res_glob}'").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: cols {list(g.columns)} vs {list(w.columns)}"); n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); n_fail += 1; continue
        # exact compare (driver hashes values; emulate with strict equality)
        try:
            eq = g.equals(w)
            if not eq:
                # pinpoint first differing cell
                diff_cols = [c for c in g.columns if not g[c].equals(w[c])]
                print(f"FAIL {name}: value mismatch in {diff_cols}")
                for c in diff_cols[:2]:
                    mask = ~(g[c].eq(w[c]) | (g[c].isna() & w[c].isna()))
                    idx = mask[mask].index[:3]
                    for i in idx:
                        print(f"   [{c}] row {i}: spark={g[c][i]!r} oracle={w[c][i]!r}")
                n_fail += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: compare error {e}"); n_fail += 1; continue
        print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
