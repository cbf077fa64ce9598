#!/usr/bin/env python3
"""Standing per-round sf10 bench ratio (the scale-regression tripwire).

The r7 sf10 probe caught the AQE pair-join fan-out collapse that no
sf0.1 number showed; this makes that probe a per-round artifact instead
of something someone has to think to run. Protocol is the same-VM
worktree A/B that settled q_pagerank (r8) and the vector family (r9):
cross-round ABSOLUTE numbers on shared hosts drift with the machine
epoch, so the base snapshot is re-run TODAY next to HEAD rather than
compared against its recorded round numbers.

usage: python3 tools/sf10_ratio.py <base-rev> [--runs 2] [--cpus 32]
       [--sf-dir target/testdata-sf10]

- builds the sf10 replica via graft.tools.ScaleUp (100x over sf0.1) if
  the dir is missing;
- runs graft.Bench (full harness: warmup, page-cache prime, contention
  probes + auto-rerun) at sf10 on HEAD, then on <base-rev> in a
  throwaway worktree, same VM, back to back;
- prints a markdown ratio table (base vs HEAD per query, totals,
  contended stamps) ready to paste into PLANS.md. Ratios > 1.3x on
  queries the round's diff didn't touch mean HOST drift or a real
  regression — adjudicate with the diff before believing either.

Queries present on one side only (added this round) print with an
empty base cell, never silently dropped.
"""
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, cwd, env=None):
    print(f"[sf10_ratio] $ {' '.join(cmd)}  (cwd={cwd})", file=sys.stderr)
    e = dict(os.environ)
    if env:
        e.update(env)
    subprocess.run(cmd, cwd=cwd, env=e, check=True)


def ensure_replica(sf_dir):
    if os.path.isdir(sf_dir) and any(
            f.endswith("lineitem") or f == "lineitem.parquet"
            for f in os.listdir(sf_dir)):
        print(f"[sf10_ratio] replica present: {sf_dir}", file=sys.stderr)
        return
    run(["sbt", "-batch",
         f"runMain graft.tools.ScaleUp /root/testdata/sf0.1 {sf_dir} 100"],
        cwd=REPO)


def bench(workdir, sf_dir, runs, cpus, tag):
    out = os.path.join(tempfile.gettempdir(), f"bench_sf10_{tag}.json")
    run(["sbt", "-batch", "runMain graft.Bench"], cwd=workdir, env={
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SPARK_GRAFT_CPUS": str(cpus),
        "SPARK_GRAFT_BENCH_RUNS": str(runs),
        "SPARK_GRAFT_BENCH_OUT": out,
        "SPARK_GRAFT_BENCH_METRICS":
            os.path.join(tempfile.gettempdir(), f"bench_sf10_{tag}_m.json"),
    })
    with open(out) as f:
        lines = [json.loads(l) for l in f if l.strip()]
    total = next(l for l in lines if l.get("metric") == "total")
    return total


def main():
    args = sys.argv[1:]
    if not args:
        print(__doc__)
        sys.exit(2)
    base_rev = args[0]
    opts = dict(zip(args[1::2], args[2::2]))
    runs = int(opts.get("--runs", "2"))
    cpus = int(opts.get("--cpus", "32"))
    sf_dir = os.path.abspath(opts.get("--sf-dir", "target/testdata-sf10"))

    ensure_replica(sf_dir)

    head = bench(REPO, sf_dir, runs, cpus, "head")

    wt = tempfile.mkdtemp(prefix="graft_base_")
    run(["git", "worktree", "add", "--detach", wt, base_rev], cwd=REPO)
    try:
        base = bench(wt, sf_dir, runs, cpus, "base")
    finally:
        run(["git", "worktree", "remove", "--force", wt], cwd=REPO)

    hq, bq = head["queries"], base["queries"]
    print(f"\n### sf10 ratio: {base_rev} (base) vs HEAD — same VM, "
          f"back to back, BENCH_RUNS={runs}\n")
    # older snapshots predate the contended/reruns fields — .get()
    for tag, t in (("base", base), ("HEAD", head)):
        print(f"{tag}: total {t['value']} s, "
              f"contended={t.get('contended')}, reruns={t.get('reruns')}, "
              f"calib={t.get('calib_sec')}")
    print()
    print("| query | base s | HEAD s | HEAD/base |")
    print("|---|---|---|---|")
    flagged = []
    for q in sorted(set(hq) | set(bq)):
        b, h = bq.get(q), hq.get(q)
        if b is None or b <= 0 or h is None or h <= 0:
            ratio = ""
        else:
            r = h / b
            ratio = f"{r:.2f}"
            if r > 1.3:
                flagged.append((q, r))
        bs = "" if b is None else f"{b:.3f}"
        hs = "" if h is None else f"{h:.3f}"
        print(f"| {q} | {bs} | {hs} | {ratio} |")
    bt = sum(v for v in bq.values() if v > 0)
    ht_common = sum(v for k, v in hq.items() if v > 0 and k in bq)
    print(f"| **total (common)** | **{bt:.2f}** | **{ht_common:.2f}** | "
          f"**{ht_common / bt:.2f}** |")
    if flagged:
        print("\nflagged (>1.3x): "
              + ", ".join(f"{q} {r:.2f}x" for q, r in flagged))
    else:
        print("\nno query over the 1.3x flag line")


if __name__ == "__main__":
    main()
