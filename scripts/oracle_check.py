#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (for iteration only; not
part of the shipped library). Reads Verify output parquet + oracle_sql.json,
runs each oracle in DuckDB over the same sf dir, and compares results
(columns sorted by name, rows sorted, exact value match)."""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str, only: set) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue  # caller asked for a subset (same names passed to Verify)
        if not os.path.isdir(f"{out_dir}/{name}"):
            # on a FULL run a missing dir means the query crashed before
            # its write (analysis/planning error) — that must be visible
            print(f"FAIL {name}: no output dir (query crashed before write?)")
            failures += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        try:
            want = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        ok_shape = got.shape == want.shape and list(got.columns) == list(want.columns)
        if not ok_shape:
            print(f"FAIL {name}: shape/cols spark={got.shape}{list(got.columns)} "
                  f"oracle={want.shape}{list(want.columns)}")
            failures += 1
            continue
        # exact compare after stringify (mirrors a hash compare)
        gs = got.astype(str)
        ws = want.astype(str)
        if gs.equals(ws):
            print(f"OK   {name} ({got.shape[0]} rows)")
        else:
            diff = (gs != ws).any(axis=1)
            print(f"FAIL {name}: {int(diff.sum())}/{len(gs)} rows differ; first:")
            idx = diff[diff].index[:3]
            for i in idx:
                print(f"  spark : {got.loc[i].to_dict()}")
                print(f"  oracle: {want.loc[i].to_dict()}")
            failures += 1
    # also check dtypes loosely
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sys.exit(main(sf, out, set(sys.argv[3:])))
