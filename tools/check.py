#!/usr/bin/env python3
"""Local pre-commit correctness check, mirroring the driver's protocol:
run each oracle SQL in DuckDB against the sf tables, compare with the
Spark result parquet that graft.Verify dumped.

usage: check.py [sfdir] [outdir] [query ...]
(defaults: /root/testdata/sf0.01 /tmp/verify, all queries)
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify"
    only = set(sys.argv[3:])

    # SURVEY<->registry consistency guard (runs whenever Verify dumped the
    # key list): every registered query key — oracled or bench-only — must
    # appear in a SURVEY §2 row. Two rounds of manual sweeps missed
    # operators (7 orphans green-but-undocumented since r8); this makes
    # the contract self-enforcing.
    n_orphan = survey_guard(outdir)

    def new_con():
        c = duckdb.connect()
        c.execute("SET TimeZone='UTC'")
        # cap DuckDB's thread pool when sharing the box with a live Spark
        # sweep (GRAFT_CHECK_THREADS; default = all cores, driver behavior)
        n_threads = os.environ.get("GRAFT_CHECK_THREADS")
        if n_threads:
            c.execute(f"SET threads={int(n_threads)}")
        for t in TABLES:
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
        return c

    shared_con = new_con()
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    # GRAFT_CHECK_JSON=path: record a per-query verdict artifact (the
    # big-SF gate file VERDICT r14 #4 asks for) — pass/fail/slow_skip
    # per key plus the run parameters, so a completed sweep is citable
    results = {}
    for name in sorted(oracles):
        if only and name not in only:
            continue
        spark_glob = os.path.join(outdir, name, "*.parquet")
        if not glob.glob(spark_glob):
            print(f"  MISSING spark output: {name}")
            n_fail += 1
            results[name] = "missing"
            continue
        # opt-in per-oracle timeout for big-SF sweeps (GRAFT_CHECK_TIMEOUT
        # seconds): a timed-out oracle is reported as SLOW-SKIP, never a
        # silent pass — the driver's own runs leave this unset
        timeout_s = float(os.environ.get("GRAFT_CHECK_TIMEOUT", "0"))
        import threading, time as _time
        # timed mode gets a FRESH connection per query: a timer that fires
        # after the query completes but before cancel() would otherwise
        # interrupt the NEXT query on the shared connection and misreport
        # it as an unrelated ERROR (advisory r14); a late interrupt on a
        # per-query connection hits an idle one and is harmless
        con = new_con() if timeout_s > 0 else shared_con
        timer = (threading.Timer(timeout_s, con.interrupt)
                 if timeout_s > 0 else None)
        if timer:
            timer.start()
        t0 = _time.monotonic()
        try:
            got_types = duck_types(con, f"SELECT * FROM read_parquet('{spark_glob}')")
            want_types = duck_types(con, oracles[name])
            # GRAFT_CHECK_HASH=1: compare an order-free multiset hash
            # computed INSIDE DuckDB instead of shipping every row
            # through pandas — the big-SF mode (a 6M-row pandas compare
            # costs minutes in the harness itself). Types are still
            # class-checked first; VARCHAR casts happen in ONE engine
            # for both sides, so formatting cannot diverge, and no
            # pandas int->float upcast artifacts exist to tolerate.
            if os.environ.get("GRAFT_CHECK_HASH") == "1":
                if sorted(got_types) != sorted(want_types):
                    print(f"  FAIL {name}: schema mismatch: "
                          f"spark={sorted(got_types)} oracle={sorted(want_types)}")
                    n_fail += 1
                    results[name] = "fail"
                    continue
                ok, msg = compare_types(got_types, want_types)
                if not ok:
                    print(f"  FAIL {name}: {msg}")
                    n_fail += 1
                    results[name] = "fail"
                    continue
                cols = sorted(set(got_types) & set(want_types))
                # hash a STRUCT of the VARCHAR-cast columns: field
                # boundaries are part of the struct encoding, so a value
                # containing '|' (or equal to a sentinel) cannot shift
                # columns the way a concat_ws signature could, and NULL
                # hashes distinctly from any string (advisory r14). The
                # multiset signature is (count, sum, xor, min, max) of the
                # row hashes — sum alone is forgeable by compensating
                # pairs; xor+extrema close that.
                rh = ("hash(ROW(" + ", ".join(
                    f"(\"{c}\")::VARCHAR" for c in cols) + "))")
                def msig(src):
                    return con.execute(
                        f"SELECT count(*), sum(h::HUGEINT), bit_xor(h), "
                        f"min(h), max(h) FROM "
                        f"(SELECT {rh} AS h FROM ({src}) s) t").fetchone()
                g = msig(f"SELECT * FROM read_parquet('{spark_glob}')")
                w = msig(oracles[name])
                if g == w:
                    n_pass += 1
                    results[name] = "pass"
                    print(f"  ok   {name} ({g[0]} rows, multiset hash)")
                else:
                    n_fail += 1
                    results[name] = "fail"
                    print(f"  FAIL {name}: multiset hash mismatch "
                          f"spark={g} oracle={w}")
                continue
            got = con.execute(f"SELECT * FROM read_parquet('{spark_glob}')").fetch_df()
            want = con.execute(oracles[name]).fetch_df()
        except Exception as e:
            if timeout_s > 0 and _time.monotonic() - t0 >= timeout_s:
                print(f"  SLOW-SKIP {name}: oracle exceeded {timeout_s}s")
                n_skip += 1
                results[name] = "slow_skip"
            else:
                print(f"  ERROR {name}: {e}")
                n_fail += 1
                results[name] = "error"
            continue
        finally:
            if timer:
                timer.cancel()
            if con is not shared_con:
                con.close()
        ok, msg = compare_types(got_types, want_types)
        if ok:
            ok, msg = compare(got, want)
        if ok:
            n_pass += 1
            results[name] = "pass"
            print(f"  ok   {name} ({len(want)} rows)")
        else:
            n_fail += 1
            results[name] = "fail"
            print(f"  FAIL {name}: {msg}")
    out_json = os.environ.get("GRAFT_CHECK_JSON")
    if out_json:
        json.dump({"sfdir": sfdir, "outdir": outdir,
                   "mode": ("hash" if os.environ.get("GRAFT_CHECK_HASH") == "1"
                            else "rows"),
                   "timeout_s": float(os.environ.get("GRAFT_CHECK_TIMEOUT", "0")),
                   "n_pass": n_pass, "n_fail": n_fail, "n_slow_skip": n_skip,
                   "queries": results}, open(out_json, "w"), indent=1)
    n_py = python_smoke(sfdir, outdir) if not only else 0
    print(f"[check] pass={n_pass} fail={n_fail} slow_skip={n_skip}"
          f" survey_orphans={n_orphan} python_smoke_failures={n_py}")
    sys.exit(1 if (n_fail or n_orphan or n_py) else 0)

def python_smoke(sfdir, outdir):
    """Run the python/tests pytest suite (the PySpark wrapper smoke:
    extensions, Preprocessor round trip, registry-vs-oracle, and the
    byte-for-byte compare against the Verify dump in `outdir`).
    Returns the number of failures; 0 when the python deps are absent
    (the Scala engine does not depend on them) or GRAFT_SKIP_PY=1."""
    if os.environ.get("GRAFT_SKIP_PY") == "1":
        return 0
    try:
        import pyspark, pytest  # noqa: F401
    except ImportError:
        print("  [py] pyspark/pytest not installed — python smoke skipped")
        return 0
    import subprocess
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, GRAFT_SF_DIR=sfdir, GRAFT_VERIFY_DIR=outdir)
    r = subprocess.run(
        [sys.executable, "-m", "pytest", os.path.join(root, "python", "tests"),
         "-q", "--no-header"], env=env, cwd=root,
        capture_output=True, text=True)
    tail = (r.stdout or "").strip().splitlines()
    print("  [py] " + (tail[-1] if tail else f"exit={r.returncode}"))
    if r.returncode != 0:
        print(r.stdout[-4000:])
        print(r.stderr[-2000:])
    return 1 if r.returncode != 0 else 0

def survey_guard(outdir):
    """Return the number of registry keys with no SURVEY §2 row."""
    keys_path = os.path.join(outdir, "registry_keys.json")
    survey_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SURVEY.md")
    if not (os.path.exists(keys_path) and os.path.exists(survey_path)):
        return 0  # older Verify output: guard is a no-op, compare still runs
    keys = json.load(open(keys_path))
    text = open(survey_path).read()
    s2 = text.split("## §2 ", 1)[-1].split("\n## §3 ", 1)[0]
    orphans = [k for k in keys if f"`{k}`" not in s2]
    for k in orphans:
        print(f"  ORPHAN (no SURVEY §2 row): {k}")
    return len(orphans)

def duck_types(con, sql):
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: r[1] for r in rows}

# The driver's hash is TYPE-SENSITIVE: DuckDB HUGEINT (sum of ints) or DOUBLE
# (floor(), int/int) where Spark emits BIGINT hash-mismatches even when every
# value is equal (round-2 lesson: 4 rows red for two driver rounds while the
# value-blind local check said green). Plain int-width diffs (INT32 vs INT64)
# occur in passing queries, so only cross-CLASS diffs are lethal.
def type_class(t):
    t = t.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("HUGEINT", "UHUGEINT"):
        return "hugeint"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    return t

def compare_types(got_types, want_types):
    for c in sorted(set(got_types) & set(want_types)):
        gcls, wcls = type_class(got_types[c]), type_class(want_types[c])
        if gcls != wcls:
            return False, (f"dtype mismatch col {c}: spark={got_types[c]} "
                           f"oracle={want_types[c]} (driver hash is type-sensitive)")
    return True, ""

def compare(got, want):
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        return False, f"schema mismatch: spark={gc} oracle={wc}"
    if len(got) != len(want):
        return False, f"rowcount mismatch: spark={len(got)} oracle={len(want)}"
    got = got[gc].sort_values(gc).reset_index(drop=True)
    want = want[wc].sort_values(wc).reset_index(drop=True)
    for c in gc:
        for i, (a, b) in enumerate(zip(got[c], want[c])):
            if not cell_eq(a, b):
                return False, f"col {c} row {i}: spark={a!r} oracle={b!r}"
    return True, ""

def cell_eq(a, b):
    if a is None and b is None:
        return True
    import numbers
    a_int = isinstance(a, numbers.Integral) and not isinstance(a, bool)
    b_int = isinstance(b, numbers.Integral) and not isinstance(b, bool)
    if a_int and b_int:
        return int(a) == int(b)
    # one side integer, the other an INTEGRAL float (pandas upcasts
    # nullable int columns to float64): compare exactly as integers —
    # a float(a) == float(b) round-trip would collapse distinct int64s
    # above 2^53 into "equal" and let a local green lie about a
    # type-sensitive driver hash
    if a_int and isinstance(b, float) and not math.isnan(b) and b.is_integer():
        return int(a) == int(b)
    if b_int and isinstance(a, float) and not math.isnan(a) and a.is_integer():
        return int(a) == int(b)
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            # BIT-EXACT compare — the driver hash is representation-
            # sensitive, so float == is not enough: +0.0 == -0.0 yet they
            # hash differently (round-11 lesson: ts_friedrich red for two
            # driver rounds on one -0.0 cell this check called passing).
            import struct
            return struct.pack("<d", fa) == struct.pack("<d", fb)
    except (TypeError, ValueError):
        pass
    if (a is None) != (b is None):
        # pandas NaN for missing
        fa = isinstance(a, float) and math.isnan(a)
        fb = isinstance(b, float) and math.isnan(b)
        return (a is None or fa) and (b is None or fb)
    return str(a) == str(b)

if __name__ == "__main__":
    main()
