#!/usr/bin/env python3
"""Local correctness harness mirroring the driver's DuckDB oracle gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name>/ parquet (Spark output) and compares it
to the DuckDB result of <verifyOutDir>/oracle_sql.json[name] executed
over <sfDir>'s tables. Exact value comparison after sorting columns by
name (like the driver). Prints per-query PASS/FAIL + first diffs.
"""
import json
import sys
import tempfile

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

import os

DAG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "airflow")

# every deployment artifact and the dag_id it must declare
EXPECTED_DAGS = {
    "weatherflow_spark_dag.py": "weatherflow_spark_etl",
    "graft_curation_dag.py": "graft_curation",
    "graft_storage_dag.py": "graft_storage",
}


def check_dag():
    """Validate the Airflow deployment artifacts without an Airflow
    runtime: byte-compile each (syntax), then EXECUTE it against a stub
    `airflow` module tree (catches NameErrors, bad imports, and
    operator-kwarg drift at module level — the failures a py_compile
    alone would miss)."""
    import glob
    import py_compile
    import types

    captured = {}

    class _Stub:
        # accepts any constructor/kwargs, supports `with` blocks and
        # `a >> b` dependency chaining
        def __init__(self, *a, **kw):
            captured.setdefault(type(self).__name__, []).append(kw)
        def __enter__(self):
            return self
        def __exit__(self, *a):
            return False
        def __rshift__(self, other):
            return other
        def __lshift__(self, other):
            return other

    mods = {
        "airflow": {"DAG": type("DAG", (_Stub,), {})},
        "airflow.providers": {},
        "airflow.providers.apache": {},
        "airflow.providers.apache.spark": {},
        "airflow.providers.apache.spark.operators": {},
        "airflow.providers.apache.spark.operators.spark_submit":
            {"SparkSubmitOperator": type("SparkSubmitOperator", (_Stub,), {})},
    }
    saved = {k: sys.modules.get(k) for k in mods}
    try:
        # every airflow/*.py must be a declared, validated artifact —
        # a stray file would deploy an unreviewed DAG
        files = sorted(os.path.basename(p)
                       for p in glob.glob(os.path.join(DAG_DIR, "*.py")))
        assert files == sorted(EXPECTED_DAGS), \
            f"airflow/ files {files} != expected {sorted(EXPECTED_DAGS)}"
        for name, attrs in mods.items():
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m
        for fname, dag_id in EXPECTED_DAGS.items():
            captured.clear()
            path = os.path.join(DAG_DIR, fname)
            # inside the try: a syntax error (the exact failure class
            # this check exists to catch) must FAIL the check, not
            # crash main
            py_compile.compile(path, doraise=True)
            ns = {"__name__": fname[:-3], "__file__": path}
            with open(path) as f:
                exec(compile(f.read(), path, "exec"), ns)
            # the module must actually declare the DAG and its task(s)
            # — EVERY constructed operator is validated, not just the
            # last
            assert "DAG" in captured, f"{fname}: DAG never constructed"
            assert any(d.get("dag_id") == dag_id
                       for d in captured["DAG"]), (fname, captured)
            assert "SparkSubmitOperator" in captured, \
                f"{fname}: no SparkSubmitOperator task"
            for op in captured["SparkSubmitOperator"]:
                assert op.get("java_class", "").startswith("graft."), op
        print(f"PASS airflow_dag ({len(EXPECTED_DAGS)} DAG files parse + "
              "declare DAG/tasks against stubbed providers)")
        return True
    except Exception as e:
        print(f"FAIL airflow_dag: {e}")
        return False
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    dag_ok = check_dag() if not only else True
    con = duckdb.connect()
    # resource caps for large sfDirs: DuckDB's default memory limit is
    # 80% of RAM with no spill path, so a heavy oracle at sf1 can OOM
    # the whole box. Opt-in via env so the driver's sf0.01 gate is
    # untouched.
    if os.environ.get("GRAFT_ORACLE_MEM"):
        con.sql(f"SET memory_limit='{os.environ['GRAFT_ORACLE_MEM']}'")
        # per-process spill dir: concurrent oracle runs (e.g. sf1 and
        # sf0.01 gates side by side) must not clobber each other's
        # temp blocks in a shared directory. GRAFT_SPILL_ROOT (set by
        # sf1_gate.py per invocation) parents the dir so each gate run
        # reaps ONLY its own spill subtree — two parallel gate halves
        # must never rmtree each other's live spill mid-query.
        spill_parent = os.environ.get("GRAFT_SPILL_ROOT") or None
        if spill_parent:
            os.makedirs(spill_parent, exist_ok=True)
        con.sql("SET temp_directory='{}'".format(
            tempfile.mkdtemp(prefix="graft_duck_spill_", dir=spill_parent)))
    if os.environ.get("GRAFT_ORACLE_THREADS"):
        con.sql(f"SET threads={int(os.environ['GRAFT_ORACLE_THREADS'])}")
    for t in TABLES:
        # driver testdata is one file per table; Spark-written dirs
        # (e.g. tools.ScaleUp output) are directories of part files
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p += "/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_df = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        s = spark_df[sorted(spark_df.columns)]
        d = duck_df[sorted(duck_df.columns)]
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}")
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows {len(s)} vs {len(d)}")
            n_fail += 1
            continue
        import pandas as pd
        bad = []
        for c in s.columns:
            sv, dv = s[c], d[c]
            if len(sv) and (isinstance(sv.iloc[0], (list, tuple))
                            or "ndarray" in type(sv.iloc[0]).__name__):
                # array-typed columns: elementwise == is ambiguous;
                # compare stringified
                sv = sv.map(lambda x: str(list(x)))
                dv = dv.map(lambda x: str(list(x)))
            if sv.dtype != dv.dtype:
                # The external driver hashes the materialized frames
                # dtype-sensitively (observed: int64 123 vs float64
                # 123.0 hash-mismatch on q_stl_outliers in round 7
                # while this gate silently astype'd them equal). A
                # dtype mismatch is therefore a FAIL here too — the
                # oracle SQL must CAST its output columns so DuckDB
                # materializes the same pandas dtype Spark writes
                # (HUGEINT -> float64 is the usual culprit: any
                # un-cast SUM(...) OVER or // result).
                bad.append((c, "dtype", str(s[c].dtype), str(d[c].dtype)))
                continue
            neq = ~((sv == dv) | (sv.isna() & dv.isna()))
            if neq.any():
                i = neq.idxmax()
                bad.append((c, f"row {i}", sv[i], dv[i],
                            int(neq.sum())))
        if bad:
            print(f"FAIL {name}: {len(s)} rows; diffs: {bad[:4]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
    if not dag_ok:
        n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
