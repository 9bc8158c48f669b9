#!/usr/bin/env python3
"""Synthetic scale-up of a testdata sfDir for scaling MEASUREMENTS.

Replicates the fact tables N times with per-replica key offsets (FKs
shifted consistently so each replica is a self-contained TPC-H-ish
sub-population joined to the shared region/nation dimensions, exactly
like a larger scale factor) and a distinct-name suffix on entity name
columns so literal cardinality grows like real data instead of
collapsing into the dictionary. Dimension tables (region, nation) stay
fixed, as TPC-H does across scale factors.

The pipeline tables are scaled with workload-PRESERVING transforms so
per-replica structure matches the base corpus while cross-replica
similarity stays negligible (otherwise replication would plant
replica-clique near-duplicates and the dedup workload would grow
quadratically instead of like real corpus growth):

- documents: every whitespace token gets a per-replica salt suffix —
  within-replica token/shingle relations (Jaccard, MinHash, winnowing)
  are preserved EXACTLY, cross-replica overlap drops to zero.
- embeddings: a per-replica signed permutation of the dimensions — an
  orthogonal transform, so every within-replica cosine/dot/norm is
  preserved EXACTLY, while cross-replica cosines decorrelate.
- events: user/event ids offset per replica; timestamps unchanged, so
  the window count stays fixed and per-window load grows like traffic.

This is instrumentation for the RDF_BASELINE.md / SCALE.md box-size
experiments — NOT a replacement for the driver's testdata (correctness
gates keep reading /root/testdata).

Usage: python3 tools/scaleup.py <srcSfDir> <dstDir> <replicas> [tables]
  [tables] — optional comma-list restricting which tables scale (the
  rest copy unchanged). E.g. `documents,embeddings,events` builds a
  pipeline-only scale point whose rdf warehouse stays base-sized, so
  the one-time rdfize warmup does not dominate a x100 measurement run.
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
    # composite natural key: (l_orderkey, l_linenumber) — the shifted
    # l_orderkey keeps it unique per replica, no pk column of its own
    ("lineitem", None, {"l_orderkey": "orders", "l_partkey": "part",
                        "l_suppkey": "supplier"}, []),
    ("documents", "doc_id", {}, []),
    ("events", "event_id", {"user_id": "__events_user"}, []),
]


def scale_embeddings(src, dst, replicas):
    """Per-replica signed permutation (orthogonal): within-replica
    cosines exact, cross-replica decorrelated. numpy-side because
    DuckDB 1.0 lambdas can't index-permute a list column."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(src, "embeddings.parquet"))
    vec_id = tbl.column("vec_id").to_numpy()
    label = tbl.column("label").to_numpy()
    emb = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float32)
    n, dim = emb.shape
    stride = int(vec_id.max()) + 1
    ids, labels, vecs = [], [], []
    for r in range(replicas):
        rng = np.random.RandomState(1234 + r)
        perm = rng.permutation(dim) if r else np.arange(dim)
        signs = (rng.randint(0, 2, dim) * 2 - 1).astype(np.float32) \
            if r else np.ones(dim, dtype=np.float32)
        ids.append(vec_id + r * stride)
        labels.append(label)
        vecs.append(emb[:, perm] * signs)
    out = pa.table({
        "vec_id": pa.array(np.concatenate(ids), type=pa.int64()),
        "embedding": pa.array(
            [v.tolist() for v in np.concatenate(vecs)],
            type=pa.list_(pa.float32())),
        "label": pa.array(np.concatenate(labels), type=pa.int32()),
    })
    pq.write_table(out, os.path.join(dst, "embeddings.parquet"))
    print(f"scaled   embeddings: x{replicas} -> {out.num_rows} rows (signed-perm)")


def main(src, dst, replicas, tables=None):
    replicas = int(replicas)
    only = set(tables.split(",")) if tables else None
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    strides = {}
    for t, pk, _, _ in SCALED:
        if pk is not None:
            strides[t] = con.execute(
                f"SELECT max({pk}) + 1 FROM read_parquet('{src}/{t}.parquet')"
            ).fetchone()[0]
    strides["__events_user"] = con.execute(
        f"SELECT max(user_id) + 1 FROM read_parquet('{src}/events.parquet')"
    ).fetchone()[0]
    for f in sorted(os.listdir(src)):
        if not f.endswith(".parquet"):
            continue
        name = f[: -len(".parquet")]
        if only is not None and name not in only:
            shutil.copyfile(os.path.join(src, f), os.path.join(dst, f))
            print(f"copied   {name}")
            continue
        if name == "embeddings":
            scale_embeddings(src, dst, replicas)
            continue
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
                if pk is not None and c == pk:
                    exprs.append(f"{c} + {r * strides[t]} AS {c}")
                elif c in fks and fks[c]:
                    exprs.append(f"{c} + {r * strides[fks[c]]} AS {c}")
                elif c in namecols and r > 0:
                    exprs.append(f"{c} || '_r{r}' AS {c}")
                elif t == "documents" and c == "text" and r > 0:
                    # salt every token: within-replica set/shingle
                    # relations exact, cross-replica overlap zero
                    exprs.append(
                        rf"regexp_replace({c}, '(\S+)', '\1#r{r}', 'g') AS {c}")
                elif t == "documents" and c == "n_chars" and r > 0:
                    exprs.append(
                        rf"length(regexp_replace(text, '(\S+)', '\1#r{r}', 'g'))"
                        f" AS {c}")
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
