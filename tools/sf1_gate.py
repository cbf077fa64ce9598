#!/usr/bin/env python3
"""Scripted full-surface oracle gate for large scale factors (sf1+).

Usage: python3 tools/sf1_gate.py <sfDir> <verifyOutDir> [logFile]

Runs tools/check.py ONE QUERY AT A TIME (fresh DuckDB process per
query) over every entry in <verifyOutDir>/oracle_sql.json, with:
  - a memory cap + per-process spill dir (GRAFT_ORACLE_MEM, default
    48GB) so a heavy oracle can never OOM the box,
  - spill-dir cleanup after every query (a killed DuckDB leaks
    graft_duck_spill_* dirs; a 60 GB one once filled the disk),
  - the known iterative/recursive-CTE oracle heavies ordered LAST so
    the bulk of the surface confirms early,
  - an incremental, crash-safe log (one line per query with wall
    seconds) and a final markdown table for PLANS.md.

This exists so the "200/200 at sf1" claim is one scripted run with
zero skips, not a union of recorded passes across sessions.
"""
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

# Oracle-side heavies: recursive/iterative CTE chains and pair-join
# replays whose DuckDB cost dwarfs the engine's (the engine side is
# sub-second for most of these). Kept explicit so the cheap ~90% of
# the surface lands first and a crash mid-heavies loses nothing.
HEAVIES = [
    "q_bpe_encode", "q_bpe_train", "q_itemset_pairs", "q_bfs_hops",
    "q_lsh_eval", "q_dedup_agreement", "q_neardup_jaccard", "q_dbscan",
    "q_hard_negatives", "q_mutual_knn", "q_triangle_count", "q_kcore",
    "q_knn_graph", "q_mmr_rerank", "q_containment_neardup",
    "q_entity_resolution", "q_semantic_dedup", "q_curation_funnel",
    "q_dedup_clusters",
]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    log_path = sys.argv[3] if len(sys.argv) > 3 else "sf1_gate_log.md"
    names = sorted(json.load(open(f"{out_dir}/oracle_sql.json")))
    # optional trailing query names: gate only that subset (lets the
    # heavy tail split across parallel invocations — each process has
    # its own DuckDB, mem cap, and spill dir, so two halves at half
    # the threads each halve the wall)
    only = set(sys.argv[4:])
    if only:
        names = [n for n in names if n in only]
    order = [n for n in names if n not in HEAVIES] + \
        [n for n in HEAVIES if n in names]
    env = dict(os.environ)
    env.setdefault("GRAFT_ORACLE_MEM", "48GB")
    env.setdefault("GRAFT_ORACLE_THREADS", "24")
    # per-invocation spill root: check.py mkdtemps its spill dir UNDER
    # this, so the reap below touches only dirs THIS gate run created —
    # the documented parallel-halves mode (trailing query-name args)
    # previously rmtree'd the sibling invocation's live spill mid-query
    spill_root = tempfile.mkdtemp(prefix="graft_gate_spill_")
    env["GRAFT_SPILL_ROOT"] = spill_root
    check = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "check.py")
    results = []
    with open(log_path, "a") as log:
        log.write(f"\n## sf1 gate: {sf_dir} vs {out_dir} "
                  f"(mem={env['GRAFT_ORACLE_MEM']}, "
                  f"threads={env['GRAFT_ORACLE_THREADS']})\n\n")
        log.write("| query | result | sec |\n|---|---|---|\n")
        log.flush()
        for i, name in enumerate(order):
            t0 = time.time()
            p = subprocess.run(
                [sys.executable, check, sf_dir, out_dir, name],
                env=env, capture_output=True, text=True)
            dt = time.time() - t0
            ok = f"PASS {name}" in p.stdout
            results.append((name, ok, dt))
            log.write(f"| {name} | {'PASS' if ok else 'FAIL'} | {dt:.1f} |\n")
            log.flush()
            if not ok:
                sys.stderr.write(f"[sf1_gate] FAIL {name}:\n{p.stdout}\n")
            sys.stderr.write(
                f"[sf1_gate] {i + 1}/{len(order)} {name} "
                f"{'ok' if ok else 'FAIL'} {dt:.1f}s\n")
            # reap this query's spill dir — ONLY under this
            # invocation's own root, never the shared tmpdir, so a
            # concurrent gate half's live spill is untouchable
            for d in os.listdir(spill_root):
                shutil.rmtree(os.path.join(spill_root, d),
                              ignore_errors=True)
        n_pass = sum(1 for _, ok, _ in results if ok)
        log.write(f"\n**{n_pass}/{len(results)} pass**, "
                  f"total {sum(d for _, _, d in results):.0f}s\n")
    shutil.rmtree(spill_root, ignore_errors=True)
    print(f"== sf1_gate {n_pass}/{len(results)} pass ==")
    sys.exit(0 if n_pass == len(results) else 1)


if __name__ == "__main__":
    main()
