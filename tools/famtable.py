#!/usr/bin/env python3
"""Regenerate the SCALE.md per-family sf0.1 <-> sf1 table from two
Bench JSON lines.

Usage: python3 tools/famtable.py <bench_sf01.json> <bench_sf1.json>
"""
import sys, json


def family(q):
    if q.startswith("q_rdf"):
        return "rdf"
    if q.startswith("q_doc"):
        return "docs"
    if q.startswith("q_emb"):
        return "emb"
    if q.startswith("q_mm"):
        return "mm"
    if q.startswith("q_events"):
        return "events"
    return "tpch/misc"


def main(p01, p1):
    a = json.load(open(p01))
    b = json.load(open(p1))
    fams = {}
    for q, sec in a["queries"].items():
        f = fams.setdefault(family(q), dict(n=0, s01=0.0, s1=0.0, j01=0, j1=0))
        f["n"] += 1
        f["s01"] += sec
        f["s1"] += b["queries"].get(q, 0.0)
        f["j01"] += a["jobs"].get(q, 0)
        f["j1"] += b["jobs"].get(q, 0)
    order = ["rdf", "docs", "emb", "mm", "events", "tpch/misc"]
    print("| family | queries | sf0.1 sec | sf1 sec | time x (10x data) | jobs sf0.1 | jobs sf1 |")
    print("|---|---|---|---|---|---|---|")
    t01 = t1 = tn = 0
    for f in order:
        d = fams[f]
        print(f"| {f} | {d['n']} | {d['s01']:.2f} | {d['s1']:.2f} | "
              f"{d['s1']/d['s01']:.1f}x | {d['j01']} | {d['j1']} |")
        t01 += d["s01"]; t1 += d["s1"]; tn += d["n"]
    print(f"| **total** | **{tn}** | **{t01:.2f}** | **{t1:.2f}** | "
          f"**{t1/t01:.1f}x** | | |")
    # per-query job-count drift (the scale-invariance claim)
    drift = [(q, a["jobs"].get(q), b["jobs"].get(q))
             for q in a["queries"] if a["jobs"].get(q) != b["jobs"].get(q)]
    print("\njob-count drift sf0.1 vs sf1:", drift if drift else "none")
    growth = sorted(b["queries"][q] / a["queries"][q]
                    for q in a["queries"] if a["queries"][q] > 0)
    print(f"median per-query growth: {growth[len(growth)//2]:.2f}x")
    print(f"floors: sf0.1 {a['floor_sec']:.4f}  sf1 {b['floor_sec']:.4f}")


if __name__ == "__main__":
    main(*sys.argv[1:])
