#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run DuckDB oracle SQL
against the testdata parquet and diff with the Verify parquet dumps.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    import decimal, datetime, math
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for tb in TABLES:
        p = os.path.join(sf_dir, tb + ".parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {tb} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark result dir"); n_fail += 1; continue
        try:
            cur = con.execute(sql)
            ora_cols = [d[0] for d in cur.description]
            ora_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        try:
            files = glob.glob(os.path.join(res_dir, "*.parquet"))
            cur2 = con.execute(f"SELECT * FROM read_parquet({files!r})")
            sp_cols = [d[0] for d in cur2.description]
            sp_rows = cur2.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark read error: {e}"); n_fail += 1; continue
        if sorted(ora_cols) != sorted(sp_cols):
            print(f"FAIL {name}: cols oracle={sorted(ora_cols)} spark={sorted(sp_cols)}")
            n_fail += 1; continue
        a, b = canon(ora_rows, ora_cols), canon(sp_rows, sp_cols)
        if a == b:
            print(f"PASS {name} ({len(b)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: oracle {len(a)} rows vs spark {len(b)} rows")
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"  first diff at row {i}:\n    oracle: {x}\n    spark : {y}")
                    break
            else:
                la, lb = len(a), len(b)
                if la != lb:
                    longer, tag = (a, "oracle") if la > lb else (b, "spark")
                    print(f"  extra {tag} row: {longer[min(la,lb)]}")
            n_fail += 1
    # queries without oracle => rows-only check
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if os.path.isdir(d) and name not in oracles:
            files = glob.glob(os.path.join(d, "*.parquet"))
            n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
            status = "PASS" if n > 0 else "FAIL"
            print(f"{status} {name} (rows-only: {n} rows)")
            if n > 0: n_pass += 1
            else: n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
