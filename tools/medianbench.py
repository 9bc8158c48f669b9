#!/usr/bin/env python3
"""Merge N Bench JSON artifacts into one median-of-N artifact.

Per-query seconds become the ACROSS-RUN median (each run's value is
already a within-run median-of-5, so the merged cell is a median of
run-medians — robust to the single-run box stalls SCALE.md documents
swinging row-local cells ~30x between same-day sf1 runs). Job counts
are plan properties, not timings: they must agree across runs and are
copied through after an equality check (a drift aborts the merge — it
means the runs were not like-for-like). floor_sec and warmup_build_sec
take the median; `value` is recomputed as the sum of merged medians.

Usage: python3 tools/medianbench.py <out.json> <in1.json> <in2.json> [...]
"""
import json
import os
import statistics
import sys


def main(out, *ins):
    assert len(ins) >= 2, "need at least two runs to merge"
    runs = [json.load(open(p)) for p in ins]
    qs = set(runs[0]["queries"])
    for p, r in zip(ins, runs):
        assert set(r["queries"]) == qs, f"query set differs in {p}"
    merged = dict(runs[0])
    merged["queries"] = {
        q: statistics.median(r["queries"][q] for r in runs) for q in sorted(qs)}
    if all("jobs" in r for r in runs):
        jobs = {}
        for q in sorted(qs):
            vals = {r["jobs"].get(q) for r in runs}
            assert len(vals) == 1, f"job count drifts across runs for {q}: {vals}"
            jobs[q] = vals.pop()
        merged["jobs"] = jobs
    else:
        missing = [p for p, r in zip(ins, runs) if "jobs" not in r]
        assert not missing, f"runs missing a 'jobs' map: {missing}"
    have_floor = [r for r in runs if "floor_sec" in r]
    assert len(have_floor) == len(runs), (
        "runs missing 'floor_sec': "
        f"{[p for p, r in zip(ins, runs) if 'floor_sec' not in r]}")
    merged["floor_sec"] = statistics.median(r["floor_sec"] for r in runs)
    if all("warmup_build_sec" in r for r in runs):
        merged["warmup_build_sec"] = statistics.median(
            r["warmup_build_sec"] for r in runs)
    merged["value"] = round(sum(merged["queries"].values()), 3)
    # basenames only: the committed artifact should not embed local paths
    labels = ", ".join(os.path.basename(p) for p in ins)
    merged["notes"] = (f"median-of-{len(runs)} across solo runs "
                       f"({labels}); " + str(runs[0].get("notes", "")))
    json.dump(merged, open(out, "w"))
    floors = [r["floor_sec"] for r in runs]
    print(f"wrote {out}: {len(qs)} queries, total {merged['value']} s, "
          f"floors {['%.4f' % f for f in floors]}")


if __name__ == "__main__":
    main(*sys.argv[1:])
