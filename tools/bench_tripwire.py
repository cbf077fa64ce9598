#!/usr/bin/env python3
"""Round-close bench tripwire: fresh sf0.1 run vs the previous round's
clean artifact, per query.

The r9 verdict found four queries 17-29% slower than r8 on code paths
the round never touched — drift that went unflagged until the judge
read the artifacts. This makes the check a one-command gate in the
round-close checklist: any query over the flag line gets named the
session it appears, and the named queries then go to the same-VM
worktree A/B (tools/sf10_ratio.py <base-rev> --sf-dir ...) for
host-vs-code adjudication — a cross-round ABSOLUTE comparison on a
shared host can never adjudicate by itself, it can only flag.

usage: python3 tools/bench_tripwire.py BENCH_r09.json fresh.json
       [--flag 1.5]

Exit 1 when any common query exceeds the flag ratio (new queries and
removed queries are listed, never flagged). `fresh.json` is the file
SPARK_GRAFT_BENCH_OUT wrote, or any file whose last JSON line with
metric=total carries the per-query map.
"""
import json
import sys


def load_total(path):
    with open(path) as f:
        text = f.read()
    try:
        # driver round artifact: one wrapper object, metric under "parsed"
        doc = json.loads(text)
        if isinstance(doc, dict) and doc.get("parsed"):
            return doc["parsed"]
        if isinstance(doc, dict) and doc.get("metric") == "total":
            return doc
    except json.JSONDecodeError:
        pass
    # raw SPARK_GRAFT_BENCH_OUT file: one JSON object per line
    lines = [json.loads(l) for l in text.splitlines() if l.strip()]
    totals = [l for l in lines if l.get("metric") == "total"]
    if not totals:
        sys.exit(f"{path}: no metric=total line")
    return totals[-1]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(zip(sys.argv[1::1], sys.argv[2::1]))
    flag = float(opts.get("--flag", "1.5"))
    if len(args) != 2:
        print(__doc__)
        sys.exit(2)
    prev, fresh = load_total(args[0]), load_total(args[1])
    pq, fq = prev["queries"], fresh["queries"]
    for tag, t in (("prev", prev), ("fresh", fresh)):
        print(f"{tag}: total {t['value']} s, contended={t.get('contended')}, "
              f"reruns={t.get('reruns')}")
    flagged = []
    print(f"\n| query | prev s | fresh s | ratio (flag >{flag}x) |")
    print("|---|---|---|---|")
    for q in sorted(set(pq) | set(fq)):
        p, f = pq.get(q), fq.get(q)
        if p is None:
            print(f"| {q} | (new) | {f:.3f} | |")
            continue
        if f is None:
            print(f"| {q} | {p:.3f} | (gone) | |")
            continue
        r = f / p if p > 0 else float("inf")
        mark = " **FLAG**" if r > flag else ""
        print(f"| {q} | {p:.3f} | {f:.3f} | {r:.2f}{mark} |")
        if r > flag:
            flagged.append((q, r))
    common_p = sum(v for k, v in pq.items() if k in fq)
    common_f = sum(v for k, v in fq.items() if k in pq)
    print(f"| **total (common)** | **{common_p:.2f}** | **{common_f:.2f}** | "
          f"**{common_f / common_p:.2f}** |")
    if flagged:
        print("\nFLAGGED: " + ", ".join(f"{q} {r:.2f}x" for q, r in flagged))
        print("adjudicate host-vs-code with: "
              "python3 tools/sf10_ratio.py <prev-round-rev> "
              "--sf-dir /root/testdata/sf0.1")
        sys.exit(1)
    print("\nclean: no common query over the flag line")


if __name__ == "__main__":
    main()
