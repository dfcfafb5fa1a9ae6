#!/usr/bin/env python3
"""Deterministic scale-up generator: replicate an existing sf dir N times
with FK-consistent key offsets, producing a drop-in sf directory (one
parquet FILE per table, same schemas) for sweeps at scale factors the
driver did not ship (TESTDATA.md caps at sf0.1; VERDICT r13 task #1
asks for the sf1 sweep).

Replica 0 is a byte-identical copy of the source rows. Replica i>0
offsets every primary/foreign key by i*span (spans = the source key
cardinality, keys are dense 0..N-1) and perturbs continuous measures
ADDITIVELY by + i*1e-4 so cross-replica top-k ties cannot arise;
integer, date, and string columns are unchanged, so distributions (and
the dedup cluster shape: each document appears once per replica) scale
exactly linearly. The perturbation must be additive and 4dp-aligned: a
multiplicative (1+i*1e-6) factor lands 2dp money/gridded values on
exact 5e-7 tails — the 6dp HALF_UP-vs-double-round midpoint class
(SURVEY #12) — and broke 7 fill/sum rows at sf1; a 4dp-grid shift can
never create a 6dp midpoint. Every value is a pure function of
(source row, i) and each COPY is ordered by (replica, primary key),
so the output ROW SET is deterministic and both engines read the same
parquet — the perturbation never has to agree across engines. (Byte
identity of the files is NOT guaranteed: parquet metadata and row-
group packing may vary across duckdb versions.)

Key spans are derived from the SOURCE tables (max key + 1), so a
src_sfdir other than the default cannot silently produce colliding
keys or broken FKs (advisory r14).

usage: gen_sf.py [src_sfdir] [dst_dir] [replicas]
(defaults: /root/testdata/sf0.1 /tmp/graft_sf1 10)
"""
import sys, os
import duckdb

EPS = "1e-4"

def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(f"SET threads={os.cpu_count()}")

    # key spans = max(source key) + 1 (keys are dense 0..N-1; the +1
    # keeps replicas disjoint even if a source ever had gaps below max)
    def span(table, col):
        s = con.execute(
            f"SELECT max({col}) + 1 FROM read_parquet('{src}/{table}.parquet')"
        ).fetchone()[0]
        # max() of zero rows is NULL -> fail loudly naming the table
        # instead of a TypeError in the f-string arithmetic later
        assert s is not None, f"{table} is empty in {src} — bad src sfdir?"
        return s
    CK, SK, PK, OK = (span("customer", "c_custkey"), span("supplier", "s_suppkey"),
                      span("part", "p_partkey"), span("orders", "o_orderkey"))
    EV, UV = span("events", "event_id"), span("events", "user_id")
    DC, VE = span("documents", "doc_id"), span("embeddings", "vec_id")

    def gen(table, select, order):
        q = (f"COPY (SELECT {select} FROM read_parquet('{src}/{table}.parquet')"
             f" CROSS JOIN range({n}) r(i) ORDER BY i, {order}) TO"
             f" '{dst}/{table}.parquet' (FORMAT PARQUET)")
        con.execute(q)
        rows = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')").fetchone()[0]
        print(f"  {table}: {rows} rows")

    # Fixed dimensions: copy once, no replication.
    for t in ("region", "nation"):
        con.execute(f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet'))"
                    f" TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(f"  {t}: copied")

    gen("customer",
        f"c_custkey + i*{CK} AS c_custkey, c_name, c_nationkey,"
        f" c_acctbal + i*{EPS} AS c_acctbal, c_mktsegment",
        "c_custkey")
    gen("supplier",
        f"s_suppkey + i*{SK} AS s_suppkey, s_name, s_nationkey,"
        f" s_acctbal + i*{EPS} AS s_acctbal",
        "s_suppkey")
    gen("part",
        f"p_partkey + i*{PK} AS p_partkey, p_name, p_brand, p_type, p_size,"
        f" p_retailprice + i*{EPS} AS p_retailprice",
        "p_partkey")
    gen("orders",
        f"o_orderkey + i*{OK} AS o_orderkey, o_custkey + i*{CK} AS o_custkey,"
        f" o_orderstatus, o_totalprice + i*{EPS} AS o_totalprice,"
        f" o_orderdate, o_orderpriority",
        "o_orderkey")
    gen("lineitem",
        f"l_orderkey + i*{OK} AS l_orderkey, l_partkey + i*{PK} AS l_partkey,"
        f" l_suppkey + i*{SK} AS l_suppkey, l_linenumber, l_quantity,"
        f" l_extendedprice + i*{EPS} AS l_extendedprice,"
        f" l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate",
        "l_orderkey, l_linenumber")
    gen("events",
        f"event_id + i*{EV} AS event_id, ts, user_id + i*{UV} AS user_id,"
        f" event_type, value + i*{EPS} AS value, props",
        "event_id")
    gen("documents",
        f"doc_id + i*{DC} AS doc_id, text, lang, source, n_chars",
        "doc_id")
    gen("embeddings",
        f"vec_id + i*{VE} AS vec_id,"
        f" [CAST(embedding[1] + i*0.0001 AS FLOAT)] || embedding[2:]"
        f" AS embedding, label",
        "vec_id")

if __name__ == "__main__":
    main()
