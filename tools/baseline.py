#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB over the sf parquet (the judge's
baseline side) and compare with a Bench JSON line.

Usage: python3 tools/baseline.py <sfDir> <verifyOutDir-with-oracle_sql.json> [bench.json]
"""
import sys, os, json, time
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(sf_dir, out_dir, bench_path=None):
    con = duckdb.connect()
    for tb in TABLES:
        p = os.path.join(sf_dir, tb + ".parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {tb} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    bench = {}
    if bench_path:
        bench = json.load(open(bench_path)).get("queries", {})
    rows = []
    for name in sorted(oracles):
        t0 = time.time()
        try:
            con.execute(oracles[name]).fetchall()
            dt = time.time() - t0
        except Exception as e:
            dt = None
        rows.append((name, dt, bench.get(name)))
    total_d = sum(d for _, d, _ in rows if d)
    total_s = sum(s for _, _, s in rows if s)
    print(f"{'query':32s} {'duckdb':>8s} {'spark':>8s} {'ratio':>7s}")
    for name, d, s in rows:
        ds = f"{d:.3f}" if d is not None else "ERR"
        ss = f"{s:.3f}" if s is not None else "-"
        ratio = f"{s/d:.1f}x" if (d and s) else "-"
        print(f"{name:32s} {ds:>8s} {ss:>8s} {ratio:>7s}")
    print(f"{'TOTAL (oracle-checked)':32s} {total_d:8.3f} {total_s:8.3f} "
          f"{(total_s/total_d if total_d else 0):6.1f}x")

if __name__ == "__main__":
    main(*sys.argv[1:])
