#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB over the sf parquet (the judge's
baseline side) and compare with a Bench JSON line.

Usage:
  python3 tools/baseline.py <sfDir> <verifyOutDir-with-oracle_sql.json> [bench.json]
  python3 tools/baseline.py --rdf <sfDir> [bench.json]

The default mode times the RELATIONAL oracle SQL on base tables — a
structural shortcut no RDF engine gets. `--rdf` is the engine-vs-engine
baseline: DuckDB executes the reference's own SQL shapes (q_to_sql,
query.py:120-218) over the SAME hash-encoded triples/iris/literals
parquet the Spark engine queries (the rdfize warehouse cache). Hash
constants come from dictionary scalar subqueries (no xxhash module
needed; DuckDB folds them once). fts/semantic queries are skipped: the
DuckDB fts extension cannot load offline and the embedder is JVM-side.
"""
import sys, os, json, time
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

PARENT = "<urn:p:parent>"
LABEL = "<http://www.w3.org/2000/01/rdf-schema#label>"

def H(term):
    sq = term.replace("'", "''")
    return f"(SELECT hash FROM dict WHERE value = '{sq}')"

def P(table, col):
    return H(f"<urn:c:{table}:{col}>")

def G(table):
    return H(f"<urn:g:{table}>")

def decode_s(subq):
    return f"SELECT i.value AS s FROM ({subq}) q JOIN iris i ON q.s = i.hash ORDER BY s"

def rdf_queries():
    """Reference-shaped SQL per gate query (mirrors RdfQueries filters)."""
    po = f"SELECT DISTINCT s FROM triples WHERE p = {P('customer','c_mktsegment')} AND o = {H(chr(34)+'BUILDING'+chr(34))}"
    parent7 = f"SELECT DISTINCT s FROM triples WHERE p = {H(PARENT)} AND o = {H('<urn:t:nation:7>')}"
    parent3 = f"SELECT DISTINCT s FROM triples WHERE p = {H(PARENT)} AND o = {H('<urn:t:nation:3>')}"
    auto = f"SELECT DISTINCT s FROM triples WHERE p = {P('customer','c_mktsegment')} AND o = {H(chr(34)+'AUTOMOBILE'+chr(34))}"
    return {
        "q_rdf_filter_po": decode_s(po),
        "q_rdf_filter_p": decode_s(f"SELECT DISTINCT s FROM triples WHERE p = {H(PARENT)}"),
        "q_rdf_filter_o": decode_s(f"SELECT DISTINCT s FROM triples WHERE o = {H('<urn:t:nation:7>')}"),
        "q_rdf_and": decode_s(f"({po}) INTERSECT ({parent7})"),
        "q_rdf_or": decode_s(f"({po}) UNION ({auto})"),
        "q_rdf_not": decode_s(f"(({parent7}) UNION ({parent3})) EXCEPT ({po})"),
        "q_rdf_multi_o": decode_s(
            f"SELECT DISTINCT s FROM triples WHERE p = {H(PARENT)} AND o IN ({H('<urn:t:nation:3>')}, {H('<urn:t:nation:7>')})"),
        "q_rdf_hop": decode_s(
            f"SELECT DISTINCT T1.s FROM triples T0 JOIN triples T1 ON T1.o = T0.s "
            f"WHERE T0.p = {P('nation','n_regionkey')} AND T0.o = {H('<urn:t:region:2>')}"),
        "q_rdf_graph": decode_s(
            f"SELECT DISTINCT s FROM triples WHERE p = {H(LABEL)} AND g IN ({G('nation')})"),
        "q_rdf_multi_graph": decode_s(
            f"SELECT DISTINCT s FROM triples WHERE p = {H(LABEL)} AND g IN ({G('nation')}, {G('region')})"),
        "q_rdf_regex": decode_s(
            "SELECT DISTINCT T0.s FROM triples T0 JOIN literals L ON T0.o = L.hash "
            "WHERE L.value SIMILAR TO '\"NATION_1.\"'"),
        "q_rdf_regex_prop": decode_s(
            f"SELECT DISTINCT T0.s FROM triples T0 JOIN literals L ON T0.o = L.hash "
            f"WHERE L.value SIMILAR TO '\"red .*\"' AND T0.p = {P('part','p_name')}"),
        "q_rdf_facet": (
            f"SELECT count(*) AS count, d.value AS val FROM triples t "
            f"JOIN ({parent3}) ss ON t.s = ss.s JOIN dict d ON t.o = d.hash "
            f"WHERE t.p = {P('customer','c_mktsegment')} "
            f"GROUP BY d.value ORDER BY count DESC, val"),
        "q_rdf_facet_properties": (
            f"SELECT count(*) AS count, i.value AS val FROM triples t "
            f"JOIN (SELECT DISTINCT s FROM triples WHERE p = {P('nation','n_name')}) ss ON t.s = ss.s "
            f"JOIN iris i ON t.p = i.hash GROUP BY i.value ORDER BY val"),
        "q_rdf_facet_graphs": (
            # same subject set as the gate (n_name properties), not parent3
            f"SELECT count(*) AS count, i.value AS val FROM triples t "
            f"JOIN (SELECT DISTINCT s FROM triples WHERE p = {P('nation','n_name')}) ss ON t.s = ss.s "
            f"JOIN iris i ON t.g = i.hash GROUP BY i.value ORDER BY val"),
        "q_rdf_agg_properties": (
            "SELECT i.value, c.count FROM (SELECT p, count(*) AS count FROM triples GROUP BY p) c "
            "JOIN iris i ON c.p = i.hash ORDER BY i.value"),
        "q_rdf_total": "SELECT count(DISTINCT s) AS total FROM triples",
        "q_rdf_count_by_property": (
            f"SELECT d.value, c.count FROM (SELECT o, count(*) AS count FROM triples "
            f"WHERE p = {H(PARENT)} GROUP BY o) c JOIN dict d ON c.o = d.hash ORDER BY d.value"),
        "q_rdf_spo": (
            f"SELECT si.value AS s, pi.value AS p, coalesce(oi.value, ol.value) AS o "
            f"FROM triples t JOIN iris si ON t.s = si.hash JOIN iris pi ON t.p = pi.hash "
            f"LEFT JOIN iris oi ON t.o = oi.hash LEFT JOIN literals ol ON t.o = ol.hash "
            f"WHERE t.p = {H(LABEL)} AND t.o = {H(chr(34)+'NATION_3'+chr(34))} ORDER BY s"),
        "q_rdf_paths": (
            f"WITH RECURSIVE walk(source, node, path) AS ("
            f"  SELECT s, s, [s] FROM ({parent3})"
            f"  UNION ALL"
            f"  SELECT w.source, t.o, list_append(w.path, t.o) FROM walk w"
            f"  JOIN triples t ON t.s = w.node AND t.p = {H(PARENT)}"
            f"  WHERE len(w.path) < 50)"
            f"SELECT si.value AS s, string_agg(di.value, '/' ORDER BY ord) AS path FROM ("
            f"  SELECT source, u.node AS anc, u.ord FROM walk w,"
            f"    LATERAL (SELECT unnest(path) AS node, generate_subscripts(path, 1) AS ord) u"
            f"  WHERE NOT EXISTS (SELECT 1 FROM triples t WHERE t.s = w.node AND t.p = {H(PARENT)})"
            f"    AND u.node != w.source) x "
            f"JOIN iris si ON x.source = si.hash JOIN iris di ON x.anc = di.hash "
            f"GROUP BY si.value ORDER BY s"),
    }

def rdf_warehouse_dir(sf_dir):
    base = os.environ.get("GRAFT_RDFIZE_CACHE", "/tmp/graft_rdfize_cache")
    import re
    # _v3 = tiered multi-file layout (keep in sync with Rdfize.cacheDir)
    return os.path.join(base, re.sub(r"[^A-Za-z0-9.]", "_", sf_dir) + "_v3")

def main_rdf(sf_dir, bench_path=None):
    wh = rdf_warehouse_dir(sf_dir)
    if not os.path.isdir(os.path.join(wh, "triples")):
        print(f"no rdfize warehouse cache at {wh} — run Verify/Bench first")
        return 1
    con = duckdb.connect()
    for tb in ("triples", "iris", "literals"):
        con.execute(f"CREATE VIEW {tb} AS SELECT * FROM read_parquet('{wh}/{tb}/*.parquet')")
    con.execute("CREATE VIEW dict AS SELECT * FROM iris UNION ALL SELECT * FROM literals")
    bench = {}
    floor = 0.0
    if bench_path:
        bj = json.load(open(bench_path))
        bench = bj.get("queries", {})
        floor = bj.get("floor_sec") or 0.0
    rows = []
    for name, sql in sorted(rdf_queries().items()):
        # steady-state like Bench: 1 untimed warm run, median of 3 timed
        # (this box shows intermittent multi-second stalls; a single
        # sample on either side would make the ratio a coin flip)
        try:
            con.execute(sql).fetchall()
            ts = []
            for _ in range(3):
                t0 = time.time()
                n = len(con.execute(sql).fetchall())
                ts.append(time.time() - t0)
            dt = sorted(ts)[1]
        except Exception as e:
            print(f"{name}: ERR {e}")
            dt, n = None, 0
        rows.append((name, dt, bench.get(name), n))
    # s > 0: Bench writes -1.0 for a query that threw — it must count
    # neither toward Spark time nor toward the per-query floor credit
    total_d = sum(d for _, d, _, _ in rows if d)
    total_s = sum(s for _, _, s, _ in rows if s and s > 0)
    print(f"{'query':28s} {'duckdb':>8s} {'spark':>8s} {'ratio':>7s} {'rows':>6s}")
    for name, d, s, n in rows:
        ds = f"{d:.3f}" if d is not None else "ERR"
        ss = f"{s:.3f}" if s is not None else "-"
        ratio = f"{s/d:.1f}x" if (d and s and s > 0) else "-"
        print(f"{name:28s} {ds:>8s} {ss:>8s} {ratio:>7s} {n:>6d}")
    print(f"{'TOTAL (rdf-side)':28s} {total_d:8.3f} {total_s:8.3f} "
          f"{(total_s/total_d if total_d else 0):6.1f}x")
    # floor-adjusted: subtract ONE per-job scheduling floor per query
    # (a lower bound — most plans run several jobs). The floor is pure
    # local[32] driver overhead a real cluster amortizes; see SCALE.md.
    n_timed = sum(1 for _, _, s, _ in rows if s and s > 0)
    total_s_adj = max(0.0, total_s - n_timed * floor)
    out = {"rdf_duckdb_sec": round(total_d, 3),
           "rdf_spark_sec": round(total_s, 3),
           "rdf_ratio": round(total_s / total_d, 2) if total_d else None,
           "skipped": "fts/semantic (fts ext offline; embedder JVM-side)"}
    if floor:
        out["floor_sec"] = floor
        out["rdf_spark_sec_floor_adjusted"] = round(total_s_adj, 3)
        out["rdf_ratio_floor_adjusted"] = (
            round(total_s_adj / total_d, 2) if total_d else None)
    # job-exact adjustment: Bench measures each query's Spark JOB count
    # on a steady-state run, and sequential jobs within one action chain
    # each pay the floor — jobs x floor is the exact scheduling overhead,
    # where the 1-floor adjustment above is only a lower bound.
    jobs = bj.get("jobs") or {} if bench_path else {}
    if floor and jobs:
        n_jobs = sum(jobs.get(name, 1) for name, _, s, _ in rows if s and s > 0)
        total_s_jadj = max(0.0, total_s - n_jobs * floor)
        out["jobs_total"] = n_jobs
        out["rdf_spark_sec_job_adjusted"] = round(total_s_jadj, 3)
        out["rdf_ratio_job_adjusted"] = (
            round(total_s_jadj / total_d, 2) if total_d else None)
    print(json.dumps(out))
    return 0

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
    total_s = sum(s for _, _, s in rows if s and s > 0)
    print(f"{'query':32s} {'duckdb':>8s} {'spark':>8s} {'ratio':>7s}")
    for name, d, s in rows:
        ds = f"{d:.3f}" if d is not None else "ERR"
        ss = f"{s:.3f}" if s is not None else "-"
        ratio = f"{s/d:.1f}x" if (d and s and s > 0) else "-"
        print(f"{name:32s} {ds:>8s} {ss:>8s} {ratio:>7s}")
    print(f"{'TOTAL (oracle-checked)':32s} {total_d:8.3f} {total_s:8.3f} "
          f"{(total_s/total_d if total_d else 0):6.1f}x")

if __name__ == "__main__":
    if sys.argv[1] == "--rdf":
        sys.exit(main_rdf(*sys.argv[2:]))
    main(*sys.argv[1:])
