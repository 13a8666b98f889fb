#!/usr/bin/env python3
"""Local approximation of the driver's t2 correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Registers the testdata parquet tables as DuckDB views, runs every SQL in
<verifyOutDir>/oracle_sql.json, reads the Spark result parquet written by
graft.Verify, sorts columns by name on both sides (like the driver), and
compares row-for-row with exact value equality. NOT part of the shipped
library — developer tooling only (python/duckdb are driver-side deps).
"""
import duckdb, sys, json, os, math

def canon(rows, cols):
    # sort columns by name; values exact (floats compared bitwise-ish)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(r[i] for i in order) for r in rows], [cols[i] for i in order]

def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    # Decimal vs float / int cross-type numeric compare
    try:
        import decimal
        if isinstance(a, decimal.Decimal) or isinstance(b, decimal.Decimal):
            return type(a) == type(b) and a == b  # type mismatch = fail (schema parity)
    except Exception:
        pass
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    return a == b

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            gdir = f"{outdir}/{name}"
            got_rel = con.execute(f"SELECT * FROM read_parquet('{gdir}/*.parquet')")
            got_cols = [d[0] for d in got_rel.description]
            got = got_rel.fetchall()
            exp_rel = con.execute(sql)
            exp_cols = [d[0] for d in exp_rel.description]
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        g, gc = canon(got, got_cols)
        e_, ec = canon(exp, exp_cols)
        if gc != ec:
            print(f"FAIL {name}: columns differ spark={gc} duckdb={ec}")
            n_fail += 1
            continue
        if len(g) != len(e_):
            print(f"FAIL {name}: rowcount spark={len(g)} duckdb={len(e_)}")
            n_fail += 1
            continue
        bad = None
        for i, (rg, re_) in enumerate(zip(g, e_)):
            if not all(eq(x, y) for x, y in zip(rg, re_)):
                bad = (i, rg, re_)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} spark={bad[1]} duckdb={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
