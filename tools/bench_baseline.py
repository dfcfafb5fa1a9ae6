#!/usr/bin/env python3
"""Measure the single-node baseline empirically: time each headline
query's DuckDB oracle SQL on the same parquet, same machine, and
compare with the Spark times from the round bench.

BASELINE.json defines the bar ("BENCH within 2x of BASELINE at the
same scale factor") but the reference is a single-node Polars library
with no benchmark suite, so the DuckDB oracle engine — which computes
the IDENTICAL result from the identical input — is the credible
single-node stand-in. This makes bench_vs_baseline a measured number.

usage: bench_baseline.py [sfdir] [verify_outdir] [bench_json] [--all]
(defaults: /root/testdata/sf0.1 /tmp/verify bench_out.json)

--all measures EVERY oracled key instead of the headline set, skipping
the stream_* twins (their DuckDB SQL is the batch equivalent — the
honest comparison is the batch row) and interrupting any single oracle
after BASELINE_TIMEOUT_S (default 120 s; recorded as timed out, never
silently dropped). Writes BASELINE_MEASURED_ALL.json in that mode so
the curated headline file stays stable.

Writes BASELINE_MEASURED.json {query: {spark, duckdb, ratio}} and
prints a markdown table for SURVEY §12h. Streaming rows are included
but flagged: DuckDB runs the batch-equivalent SQL while Spark pays the
real micro-batch machinery (checkpointing, state stores, drains) —
the honest comparison for those is the batch twin where one exists.
"""
import sys, os, json, glob, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# graft.Bench's stdout headline set (one representative per family)
HEADLINE = [
    "q_agg", "q_join_agg", "q_window", "q_topk",
    "prep_pipeline", "scale_quantile_normal",
    "dedup_exact", "dedup_minhash", "dedup_pipeline",
    "knn_bruteforce", "knn_lsh", "knn_ivf",
    "text_pipeline", "text_tokens",
    "ts_features_extract", "ts_features_multi", "ts_resample",
    "multimodal_frames",
    "stream_window", "stream_sessionize", "stream_interval_join",
    "q_kmeans_step",
    # the most expensive oracled rows from the round map — the ones a
    # 2x regression would actually hurt on
    "ts_features_relevant", "ts_matrix_profile", "knn_ivfpq",
    "dedup_incremental", "er_golden_record", "q_corr_matrix",
    "q_grouped_corr", "text_decontaminate", "q_bm25", "dedup_ngram_jaccard",
]


def main():
    args = [a for a in sys.argv[1:] if a != "--all"]
    full = "--all" in sys.argv[1:]
    sfdir = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    outdir = args[1] if len(args) > 1 else "/tmp/verify"
    bench_path = args[2] if len(args) > 2 else "bench_out.json"
    timeout_s = float(os.environ.get("BASELINE_TIMEOUT_S", "120"))

    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    spark_times = {}
    if os.path.exists(bench_path):
        spark_times = json.load(open(bench_path)).get("queries", {})

    names = (sorted(n for n in oracles if not n.startswith("stream_"))
             if full else HEADLINE)
    timed_out = []
    rows = []
    for name in names:
        sql = oracles.get(name)
        if not sql:
            print(f"  skip {name}: no oracle SQL (bench-only row)")
            continue
        # fresh connection per query: no cross-query caching, and the
        # per-query view setup cost is the same full-scan entry Spark
        # pays through its own reader
        import threading
        times = []
        for _ in range(2):
            con = duckdb.connect()
            con.execute("SET TimeZone='UTC'")
            for t in TABLES:
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                            f"read_parquet('{sfdir}/{t}.parquet')")
            timer = threading.Timer(timeout_s, con.interrupt)
            timer.start()
            t0 = time.monotonic()
            try:
                con.execute(sql).fetchall()
                times.append(time.monotonic() - t0)
            except Exception as e:
                el = time.monotonic() - t0
                if el >= timeout_s:
                    print(f"  TIMEOUT {name}: >{timeout_s}s")
                    timed_out.append(name)
                else:
                    print(f"  FAIL {name}: {e}")
                times = None
                break
            finally:
                timer.cancel()
                con.close()
        if not times:
            continue
        duck = min(times)
        spark = spark_times.get(name)
        ratio = (spark / duck) if (spark and spark > 0 and duck > 0) else None
        rows.append((name, spark, duck, ratio))
        print(f"  {name}: spark={spark} duckdb={duck:.3f}"
              f" ratio={ratio and round(ratio, 2)}")

    # two summaries over the non-streaming rows:
    # - geomean of per-query ratios: per-JOB comparison, dominated at
    #   sf0.1 by Spark's fixed ~0.1-0.2s scheduling/codegen cost on
    #   sub-second queries (a constant that amortizes at scale);
    # - total-time ratio: the WORKLOAD comparison — same queries, same
    #   data, sum of wall time — which is what "matches-or-beats
    #   single-node throughput" means.
    import math
    brows = [(n, s, d, r) for (n, s, d, r) in rows
             if r is not None and not n.startswith("stream_")]
    batch = [r for (_, _, _, r) in brows]
    geo = math.exp(sum(math.log(r) for r in batch) / len(batch)) if batch else None
    tot_s = sum(s for (_, s, _, _) in brows)
    tot_d = sum(d for (_, _, d, _) in brows)
    total_ratio = (tot_s / tot_d) if tot_d else None
    out = {
        "sf": sfdir,
        "geomean_spark_over_duckdb_batch": geo and round(geo, 3),
        "total_spark_sec_batch": round(tot_s, 2),
        "total_duckdb_sec_batch": round(tot_d, 2),
        "total_ratio_spark_over_duckdb": total_ratio and round(total_ratio, 3),
        "n_measured": len(rows),
        "timed_out": sorted(timed_out),
        "queries": {n: {"spark_sec": s, "duckdb_sec": round(d, 3),
                        "ratio": r and round(r, 2)}
                    for (n, s, d, r) in rows},
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fname = "BASELINE_MEASURED_ALL.json" if full else "BASELINE_MEASURED.json"
    with open(os.path.join(root, fname), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"[baseline] geomean spark/duckdb (batch rows) = {geo and round(geo, 3)}"
          f" over {len(batch)} rows; total {tot_s:.1f}s vs {tot_d:.1f}s"
          f" (ratio {total_ratio and round(total_ratio, 3)})"
          f" -> " + fname)

    # markdown table for SURVEY §12h
    print("\n| Query | Spark s | DuckDB s | Spark/DuckDB |")
    print("| --- | --- | --- | --- |")
    for (n, s, d, r) in sorted(rows, key=lambda x: -(x[3] or 0)):
        tag = " (streaming: batch-equivalent SQL)" if n.startswith("stream_") else ""
        print(f"| {n}{tag} | {s} | {d:.2f} | {r and round(r, 2)} |")


if __name__ == "__main__":
    main()
