#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
SQL from oracle_sql.json in DuckDB over the sfDir tables, and compares:
row count, schema (column names), and cell values (columns sorted by name,
rows in result order).
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    try:  # Decimal → canonical float-ish string
        import decimal
        if isinstance(v, decimal.Decimal):
            return f"{float(v):.10g}"
    except Exception:
        pass
    return str(v)


def table_of(con, sql):
    rel = con.sql(sql)
    cols = [c.lower() for c in rel.columns]
    rows = rel.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [cols[i] for i in order], [[canon(r[i]) for i in order] for r in rows]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            ocols, orows = table_of(con, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failed.append(name)
            continue
        try:
            scols, srows = table_of(con, f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            failed.append(name)
            continue
        if scols != ocols:
            print(f"FAIL {name}: schema mismatch spark={scols} oracle={ocols}")
            failed.append(name)
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            failed.append(name)
            continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, orows)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            i, a, b = bad
            print(f"FAIL {name}: row {i} differs\n  spark : {a}\n  oracle: {b}")
            failed.append(name)
        else:
            print(f"OK   {name}: {len(srows)} rows")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} oracle queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
