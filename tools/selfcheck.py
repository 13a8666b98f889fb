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

def canon(rows, cols, types=None):
    # sort columns by name; values exact (floats compared bitwise-ish)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    ts = [types[i] for i in order] if types is not None else None
    return [tuple(r[i] for i in order) for r in rows], [cols[i] for i in order], ts

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

INT_WIDTHS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
              "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}

def tclass(t):
    """Equivalence class of a DuckDB type string for driver-hash parity.
    Plain int widths collapse to one class; HUGEINT, DECIMAL, and
    FLOAT-vs-DOUBLE stay distinct. List types classify element-wise."""
    t = t.strip()
    if t.endswith("[]"):
        return tclass(t[:-2]) + "[]"
    u = t.upper()
    if u in INT_WIDTHS:
        return "INT"
    return u

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            # stage_scale.py writes <table>.parquet as a DIRECTORY of
            # per-copy files (Spark reads it transparently); DuckDB
            # needs an explicit glob for the directory case.
            src = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            gdir = f"{outdir}/{name}"
            got_rel = con.sql(f"SELECT * FROM read_parquet('{gdir}/*.parquet')")
            got_cols = list(got_rel.columns)
            got_types = [str(t) for t in got_rel.types]
            got = got_rel.fetchall()
            exp_rel = con.sql(sql)
            exp_cols = list(exp_rel.columns)
            exp_types = [str(t) for t in exp_rel.types]
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        # Driver-parity guard (r5 lesson): the driver canonicalizes with
        # pandas sort_values, which dies on unhashable cells — any raw
        # ARRAY/LIST (numpy.ndarray), STRUCT, or MAP column in an
        # oracle-able result is a guaranteed driver ERR even though this
        # script's exact-compare handles lists fine. Fail it HERE so the
        # local gate matches the driver: serialize such columns to
        # delimited strings (array_join / array_to_string) on both sides.
        nested = sorted({c for cols, typs in ((got_cols, got_types),
                                              (exp_cols, exp_types))
                         for c, t in zip(cols, typs)
                         if t.strip().endswith("]]") or t.strip().endswith("[]")
                         or t.strip().upper().startswith(("STRUCT(", "MAP("))})
        if nested:
            print(f"FAIL {name}: nested result column(s) {nested} — the "
                  "driver's pandas canonicalization cannot hash them; "
                  "serialize to a delimited string on both sides")
            n_fail += 1
            continue
        g, gc, gt = canon(got, got_cols, got_types)
        e_, ec, et = canon(exp, exp_cols, exp_types)
        if gc != ec:
            print(f"FAIL {name}: columns differ spark={gc} duckdb={ec}")
            n_fail += 1
            continue
        # Result-type parity: the driver hashes typed values, so a DuckDB
        # widening (sum(BIGINT)->HUGEINT, avg(DECIMAL)->DECIMAL vs DOUBLE)
        # fails the driver even when Python-converted values are equal.
        # Granularity matches the driver's observed behavior (r4): plain
        # int widths canonicalize (22 INTEGER-vs-BIGINT keys passed its
        # hash), but HUGEINT and DECIMAL do NOT collapse to int/float
        # (llm_quality_classifier's BIGINT-vs-HUGEINT failed it).
        if [tclass(t) for t in gt] != [tclass(t) for t in et]:
            diffs = [f"{c}: spark={a} duckdb={b}"
                     for c, a, b in zip(gc, gt, et)
                     if tclass(a) != tclass(b)]
            print(f"FAIL {name}: result types differ ({'; '.join(diffs)})")
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
