#!/usr/bin/env python3
"""Stage an Nx-volume keyed-scaling corpus from a testdata SF dir.

Usage: python3 tools/stage_scale.py <srcSfDir> <outDir> [copies=8]

Grows data the way real SF growth behaves: each copy gets a DISJOINT
key space (order/cust/supp/part/event/doc/vec keys shifted by
copy * (max_key + 1)), so join fan-out stays 1:1 instead of
multiplying (a naive verbatim x8 clone sent q_flagship to 531x in the
round-5 negative control). Document tokens are prefixed per copy so
the near-dup/shingle structure REPLICATES instead of every doc
gaining 7 exact cross-copy clones; embedding signs are rotated per
copy (deterministic +-1 mask keyed by copy) so ANN neighborhoods
replicate instead of collapsing onto one point cloud. region/nation
stay single-copy (fixed dimensions, like TPC-H).

Dev tooling only (python/duckdb are driver-side deps) - the shipped
library never reads this.
"""
import duckdb, sys, os

def main():
    src, out = sys.argv[1], sys.argv[2]
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{src}/{t}.parquet')")
    shift = {}
    for t, k in [("customer", "c_custkey"), ("supplier", "s_suppkey"),
                 ("part", "p_partkey"), ("orders", "o_orderkey"),
                 ("events", "event_id"), ("events", "user_id"),
                 ("documents", "doc_id"), ("embeddings", "vec_id")]:
        shift[k] = con.sql(f"SELECT max({k}) + 1 FROM {t}").fetchone()[0]

    def stage(table, select_per_copy):
        # one FILE PER COPY inside a <table>.parquet DIRECTORY (Spark
        # reads a dir of parquet transparently): the previous
        # single-file layout put the whole xN table in 1-2 row groups,
        # so every scan at x64 ran as one or two tasks — the r11 IVF
        # assignment measured 20.7 s single-task vs <1 s wide purely
        # from that artifact. A real corpus at any N arrives as many
        # files; per-copy files make the scale corpus representative.
        d = f"{out}/{table}.parquet"
        os.makedirs(d, exist_ok=True)
        for c in range(copies):
            con.execute(f"COPY ({select_per_copy(c)}) "
                        f"TO '{d}/copy{c:03d}.parquet' (FORMAT PARQUET)")
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{d}/*.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows in {copies} files")

    # fixed dimensions: single copy
    for t in ["region", "nation"]:
        con.execute(f"COPY (SELECT * FROM {t}) TO '{out}/{t}.parquet' "
                    "(FORMAT PARQUET)")
        print(f"{t}: unchanged")

    # c_name is a KEY-DERIVED identity ('Customer#' + 9-digit key) that
    # downstream entity-resolution keys join on — it must be
    # regenerated from the shifted key, exactly as real SF growth names
    # customers. Leaving it verbatim gives every name 8 copies and the
    # true fuzzy-match pair set grows 64x (measured: the round-6
    # segment-blocked fuzzy join at 194 s against duplicated names vs
    # 6 s against properly shifted ones - the same lesson as the r5
    # duplicate-key negative control, one column over).
    stage("customer", lambda c:
          f"""SELECT c_custkey + {c * shift['c_custkey']} AS c_custkey,
                     'Customer#' || lpad(CAST(c_custkey
                       + {c * shift['c_custkey']} AS VARCHAR), 9, '0')
                       AS c_name,
                     c_nationkey, c_acctbal, c_mktsegment
              FROM customer""")
    stage("supplier", lambda c:
          f"""SELECT s_suppkey + {c * shift['s_suppkey']} AS s_suppkey,
                     s_name, s_nationkey, s_acctbal FROM supplier""")
    stage("part", lambda c:
          f"""SELECT p_partkey + {c * shift['p_partkey']} AS p_partkey,
                     p_name, p_brand, p_type, p_size, p_retailprice
              FROM part""")
    stage("orders", lambda c:
          f"""SELECT o_orderkey + {c * shift['o_orderkey']} AS o_orderkey,
                     o_custkey + {c * shift['c_custkey']} AS o_custkey,
                     o_orderstatus, o_totalprice, o_orderdate,
                     o_orderpriority FROM orders""")
    stage("lineitem", lambda c:
          f"""SELECT l_orderkey + {c * shift['o_orderkey']} AS l_orderkey,
                     l_partkey + {c * shift['p_partkey']} AS l_partkey,
                     l_suppkey + {c * shift['s_suppkey']} AS l_suppkey,
                     l_linenumber, l_quantity, l_extendedprice, l_discount,
                     l_tax, l_returnflag, l_linestatus, l_shipdate
              FROM lineitem""")
    stage("events", lambda c:
          f"""SELECT event_id + {c * shift['event_id']} AS event_id, ts,
                     user_id + {c * shift['user_id']} AS user_id,
                     event_type, value, props FROM events""")
    # per-copy token prefix: shingle/minhash similarity replicates
    # within each copy, never across copies
    stage("documents", lambda c:
          f"""SELECT doc_id + {c * shift['doc_id']} AS doc_id,
                     CASE WHEN {c} = 0 THEN text
                          ELSE array_to_string(
                            list_transform(string_split(text, ' '),
                                           w -> 'c{c}' || w), ' ') END
                       AS text,
                     lang, source,
                     CAST(len(CASE WHEN {c} = 0 THEN text
                          ELSE array_to_string(
                            list_transform(string_split(text, ' '),
                                           w -> 'c{c}' || w), ' ') END)
                          AS BIGINT) AS n_chars
              FROM documents""")
    # deterministic PER-DIMENSION sign mask keyed by (copy, dim) via md5
    # parity: one shared mask per copy is an exact isometry (float * +-1
    # is exact, so all within-copy dot products are preserved bit-for-
    # bit), while cross-copy pairs disagree on ~half the dims, so
    # neighborhoods replicate per copy instead of every copy landing on
    # the same point cloud. copy 0 is the original.
    #
    # r12 fix: the previous arithmetic mask ((i*31 + c*2654435761)
    # % 1000003 % 2) was DEGENERATE - 31 is odd and the modulus never
    # wraps for i <= 64 at most offsets, so the mask collapsed to
    # parity(i + c*K) = parity(i) or its complement: across 64 copies
    # there were exactly 2 distinct masks up to global negation
    # (measured), i.e. every copy was ONE point cloud and cross-copy
    # bucket collisions were maximal. Roughly half of the r11 x64 LSH
    # occupancy skew (max 199 vs design 8) was this staging artifact,
    # the other half the correlated +-1 planes fixed in-engine the same
    # round. md5 parity gives 64 genuinely distinct masks.
    stage("embeddings", lambda c:
          f"""SELECT vec_id + {c * shift['vec_id']} AS vec_id,
                     CASE WHEN {c} = 0 THEN embedding ELSE
                       list_transform(range(1, len(embedding) + 1),
                         i -> CAST(embedding[i] *
                              (CASE WHEN (strpos('0123456789abcdef',
                                    substring(md5('m{c}_' || (i - 1)),
                                              1, 1)) - 1) % 2 = 0
                               THEN 1.0 ELSE -1.0 END) AS FLOAT))
                     END AS embedding,
                     label FROM embeddings""")

if __name__ == "__main__":
    main()
