#!/usr/bin/env python3
"""Synthetic scale-up of a testdata sfDir for scaling MEASUREMENTS.

Replicates the fact tables N times with per-replica key offsets (FKs
shifted consistently so each replica is a self-contained TPC-H-ish
sub-population joined to the shared region/nation dimensions, exactly
like a larger scale factor) and a distinct-name suffix on entity name
columns so literal cardinality grows like real data instead of
collapsing into the dictionary. Dimension tables (region, nation) stay
fixed, as TPC-H does across scale factors. All other parquet files are
copied unchanged so the output dir is a complete, valid sfDir.

This is instrumentation for the RDF_BASELINE.md box-size experiment —
NOT a replacement for the driver's testdata (correctness gates keep
reading /root/testdata).

Usage: python3 tools/scaleup.py <srcSfDir> <dstDir> <replicas>
"""
import os
import shutil
import sys

import duckdb

# (table, pk, fk shifts as {col: fk_table}, name-suffix columns)
SCALED = [
    ("customer", "c_custkey", {}, ["c_name"]),
    ("supplier", "s_suppkey", {}, ["s_name"]),
    ("orders", "o_orderkey", {"o_custkey": "customer"}, []),
    ("part", "p_partkey", {}, ["p_name"]),
]


def main(src, dst, replicas):
    replicas = int(replicas)
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    strides = {}
    for t, pk, _, _ in SCALED:
        strides[t] = con.execute(
            f"SELECT max({pk}) + 1 FROM read_parquet('{src}/{t}.parquet')"
        ).fetchone()[0]
    for f in sorted(os.listdir(src)):
        if not f.endswith(".parquet"):
            continue
        name = f[: -len(".parquet")]
        scaled = next((s for s in SCALED if s[0] == name), None)
        if scaled is None:
            shutil.copyfile(os.path.join(src, f), os.path.join(dst, f))
            print(f"copied   {name}")
            continue
        t, pk, fks, namecols = scaled
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{f}')"
            ).fetchall()
        ]
        selects = []
        for r in range(replicas):
            exprs = []
            for c in cols:
                if c == pk:
                    exprs.append(f"{c} + {r * strides[t]} AS {c}")
                elif c in fks and fks[c]:
                    exprs.append(f"{c} + {r * strides[fks[c]]} AS {c}")
                elif c in namecols and r > 0:
                    exprs.append(f"{c} || '_r{r}' AS {c}")
                else:
                    exprs.append(c)
            selects.append(
                f"SELECT {', '.join(exprs)} FROM read_parquet('{src}/{f}')"
            )
        union = " UNION ALL ".join(selects)
        con.execute(
            f"COPY ({union}) TO '{dst}/{f}' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{f}')").fetchone()[0]
        print(f"scaled   {name}: x{replicas} -> {n} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
