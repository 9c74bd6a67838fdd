#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
SQL from oracle_sql.json in DuckDB over the sfDir tables, and compares the
way the driver does: both sides through pandas (.df()), columns sorted by
name, rows sorted by all columns, values hashed EXACTLY (no float
canonicalization). This surfaces the failure modes a lenient string compare
hides: DuckDB HUGEINT sums arriving as float64, list/array columns that
pandas cannot sort, dtype drift.
"""
import hashlib
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def frame_of(rel):
    df = rel.df()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    # the driver sorts by all columns before hashing — list-typed columns
    # raise TypeError here exactly as they do driver-side
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def row_hash(df):
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        for v in row:
            h.update(repr(v).encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    import json
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            odf = frame_of(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle side: {type(e).__name__}: {e}")
            failed.append(name)
            continue
        try:
            sdf = frame_of(con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"))
        except Exception as e:
            print(f"FAIL {name}: spark side: {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if list(sdf.columns) != list(odf.columns):
            print(f"FAIL {name}: schema spark={list(sdf.columns)} oracle={list(odf.columns)}")
            failed.append(name)
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            failed.append(name)
            continue
        if row_hash(sdf) != row_hash(odf):
            diff_cols = [c for c in sdf.columns
                         if not sdf[c].equals(odf[c])]
            detail = []
            for c in diff_cols[:4]:
                neq = sdf[c] != odf[c]
                # NaN != NaN: treat both-NaN as equal for the report
                neq &= ~(sdf[c].isna() & odf[c].isna())
                if not neq.any():
                    if str(sdf[c].dtype) != str(odf[c].dtype):
                        detail.append(f"{c}: dtype {sdf[c].dtype} vs {odf[c].dtype}")
                    continue
                i = neq.idxmax()
                detail.append(
                    f"{c}[{i}]: spark={sdf[c][i]!r} ({sdf[c].dtype}) "
                    f"oracle={odf[c][i]!r} ({odf[c].dtype})")
            if detail:
                print(f"FAIL {name}: hash mismatch — " + "; ".join(detail))
                failed.append(name)
            else:
                print(f"OK   {name}: {len(sdf)} rows (repr-hash diff only, values equal)")
        else:
            print(f"OK   {name}: {len(sdf)} rows")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} oracle queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
