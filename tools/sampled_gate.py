#!/usr/bin/env python3
"""Sampled-output oracle gate for wide-output queries at big SFs.

Usage:
  python3 tools/sampled_gate.py <sfDir> <verifyOutDir> <name>=<pred> ...

For each <name>=<pred>: reads <verifyOutDir>/<name>/ parquet, which
graft.Verify must have written WITH the same slice applied
(GRAFT_VERIFY_SLICE="<name>=<pred>"), runs the query's oracle SQL in
DuckDB wrapped as `SELECT * FROM (<oracle>) WHERE <pred>`, and
compares exactly — sorted by ALL columns, so the wrapper's loss of
the oracle's ORDER BY is immaterial. Strict dtype equality, like
tools/check.py.

This gives sf10 correctness rows to queries whose FULL output is too
wide to dump (q_target_encoding ~150M rows at sf10): the slice is a
deterministic key predicate (e.g. "o_orderkey % 128 = 7"), so the
gate still hashes real engine output end to end — scan, shuffle,
broadcast arithmetic all run at full sf10 scale; only the final
write is sliced.
"""
import json
import os
import sys
import tempfile

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    specs = []
    for a in sys.argv[3:]:
        i = a.index("=")
        specs.append((a[:i].strip(), a[i + 1:].strip()))
    con = duckdb.connect()
    if os.environ.get("GRAFT_ORACLE_MEM"):
        con.sql(f"SET memory_limit='{os.environ['GRAFT_ORACLE_MEM']}'")
        con.sql("SET temp_directory="
                f"'{tempfile.mkdtemp(prefix='graft_duck_spill_')}'")
    if os.environ.get("GRAFT_ORACLE_THREADS"):
        con.sql(f"SET threads={int(os.environ['GRAFT_ORACLE_THREADS'])}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p += "/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, pred in specs:
        s = con.sql(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        d = con.sql(
            f"SELECT * FROM ({oracle[name]}) WHERE {pred}").df()
        s = s[sorted(s.columns)].sort_values(
            by=sorted(s.columns)).reset_index(drop=True)
        d = d[sorted(d.columns)].sort_values(
            by=sorted(d.columns)).reset_index(drop=True)
        ok = list(s.columns) == list(d.columns) and len(s) == len(d)
        if ok:
            for c in s.columns:
                if s[c].dtype != d[c].dtype:
                    ok = False
                    print(f"  {name}.{c}: dtype {s[c].dtype} vs {d[c].dtype}")
                    break
                neq = ~((s[c] == d[c]) | (s[c].isna() & d[c].isna()))
                if neq.any():
                    ok = False
                    i = neq.idxmax()
                    print(f"  {name}.{c} row {i}: {s[c][i]} vs {d[c][i]}")
                    break
        else:
            print(f"  {name}: shape {list(s.columns)}x{len(s)}"
                  f" vs {list(d.columns)}x{len(d)}")
        print(f"{'PASS' if ok else 'FAIL'} {name} "
              f"[{pred}] ({len(s)} sliced rows)")
        n_pass += ok
        n_fail += not ok
    print(f"== sampled_gate {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
