#!/usr/bin/env python3
"""Replay the generated Porter2 CTE chain in DuckDB over the token dump
written by `runMain graft.PorterDump <sfDir> <outDir>` and diff against the
Scala stems token-for-token. Exit 0 iff every token agrees."""
import sys

import duckdb

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/porter_parity"
scala = {}
with open(f"{outdir}/porter_scala.tsv", encoding="utf-8") as f:
    for line in f:
        line = line.rstrip("\n")
        if not line:
            continue
        tok, stem = line.split("\t")
        scala[tok] = stem
ctes = open(f"{outdir}/porter_ctes.sql", encoding="utf-8").read()

con = duckdb.connect()
con.execute("CREATE TABLE toks (orig VARCHAR, ltk VARCHAR)")
con.executemany("INSERT INTO toks VALUES (?, ?)", [(t, t) for t in scala])
rows = con.execute(f"WITH {ctes}\nSELECT orig, tok FROM psout").fetchall()

bad = [(o, s, scala[o]) for o, s in rows if scala[o] != s]
for o, got_sql, got_scala in bad[:40]:
    print(f"MISMATCH tok={o!r} sql={got_sql!r} scala={got_scala!r}")
print(f"{len(rows) - len(bad)}/{len(rows)} tokens agree")
sys.exit(0 if not bad and len(rows) == len(scala) else 1)
