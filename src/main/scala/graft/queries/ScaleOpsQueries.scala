package graft.queries

import org.apache.spark.sql.functions._
// (dynamic-partition-pruning demo lives at the bottom of this registry)
import graft.{Q, Tables}
import graft.operators.{AsofJoin, RangeJoin, Skew}

/** Scale-pattern operators: as-of join and skew-salted aggregation.
  * Both oracle-checked (DuckDB has a native ASOF JOIN; the salted agg
  * must equal the plain GROUP BY).
  */
object ScaleOpsQueries {

  /** For every click event: the most recent error event of the same
    * user at or before it. Timestamps emitted at microsecond precision
    * (DuckDB reads the nanos parquet at micros).
    */
  val qAsof: Q = Q(
    "q_asof_join",
    (s, dir) => {
      val e = Tables.events(s, dir)
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val errors = e.where(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("value"))
      AsofJoin.asof(clicks, errors, "user_id", "ts",
        leftCols = Seq("event_id"), rightCols = Seq("ts", "value"), prefix = "err_")
        .select(
          col("event_id"), col("user_id"),
          // integer division: `/` would cast the nanos Long (~2^60, above
          // double's 2^53 exact range) to double and land on the wrong µs
          expr("err_ts div 1000").as("err_ts_us"),
          round(col("err_value"), 6).as("err_value"))
    },
    Some("""
      SELECT l.event_id, l.user_id,
             epoch_us(r.ts) AS err_ts_us,
             round(r.value, 6) AS err_value
      FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') l
      ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'error') r
        ON l.user_id = r.user_id AND l.ts >= r.ts
    """),
  )

  /** The same backward as-of join through the NATIVE physical operator
    * ([[graft.plans.AsofJoinExec]] — custom LogicalPlan + Strategy +
    * SparkPlan): identical semantics and oracle as `q_asof_join`, but
    * the plan is two key-clustered exchanges into a streaming sorted
    * merge instead of the union+window device — no union row, no
    * window buffer, left partitioning/ordering preserved downstream.
    */
  val qAsofNative: Q = Q(
    "q_asof_native",
    (s, dir) => {
      val e = Tables.events(s, dir)
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val errors = e.where(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("value"))
      graft.plans.AsofExec.asof(clicks, errors, "user_id", "ts",
        leftCols = Seq("event_id"), rightCols = Seq("ts", "value"), prefix = "err_")
        .select(
          col("event_id"), col("user_id"),
          expr("err_ts div 1000").as("err_ts_us"),
          round(col("err_value"), 6).as("err_value"))
    },
    Some("""
      SELECT l.event_id, l.user_id,
             epoch_us(r.ts) AS err_ts_us,
             round(r.value, 6) AS err_value
      FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') l
      ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'error') r
        ON l.user_id = r.user_id AND l.ts >= r.ts
    """),
  )

  /** Forward as-of: for every click, the EARLIEST error at or after it
    * (same user). DuckDB's ASOF JOIN takes the mirrored inequality
    * natively.
    */
  val qAsofForward: Q = Q(
    "q_asof_forward",
    (s, dir) => {
      val e = Tables.events(s, dir)
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val errors = e.where(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("value"))
      AsofJoin.asofForward(clicks, errors, "user_id", "ts",
        leftCols = Seq("event_id"), rightCols = Seq("ts", "value"), prefix = "err_")
        .select(
          col("event_id"), col("user_id"),
          expr("err_ts div 1000").as("err_ts_us"),
          round(col("err_value"), 6).as("err_value"))
    },
    Some("""
      SELECT l.event_id, l.user_id,
             epoch_us(r.ts) AS err_ts_us,
             round(r.value, 6) AS err_value
      FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') l
      ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'error') r
        ON l.user_id = r.user_id AND l.ts <= r.ts
    """),
  )

  /** The forward as-of through the native operator (the
    * direction-generalized [[graft.plans.AsofJoinExec]]): earliest
    * right at or after, same oracle as `q_asof_forward`; the forward
    * merge needs NO held row at all — the right head after advancing
    * strictly-before rows IS the candidate.
    */
  val qAsofForwardNative: Q = Q(
    "q_asof_forward_native",
    (s, dir) => {
      val e = Tables.events(s, dir)
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val errors = e.where(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("value"))
      graft.plans.AsofExec.asofForward(clicks, errors, "user_id", "ts",
        leftCols = Seq("event_id"), rightCols = Seq("ts", "value"), prefix = "err_")
        .select(
          col("event_id"), col("user_id"),
          expr("err_ts div 1000").as("err_ts_us"),
          round(col("err_value"), 6).as("err_value"))
    },
    Some("""
      SELECT l.event_id, l.user_id,
             epoch_us(r.ts) AS err_ts_us,
             round(r.value, 6) AS err_value
      FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') l
      ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'error') r
        ON l.user_id = r.user_id AND l.ts <= r.ts
    """),
  )

  /** NEAREST as-of: for every click, the error of the same user
    * closest in time, either direction; exact distance ties resolve
    * backward. DuckDB has no nearest ASOF, so the oracle ranks the
    * per-user candidates by (|Δts|, direction) explicitly.
    */
  val qAsofNearest: Q = Q(
    "q_asof_nearest",
    (s, dir) => {
      val e = Tables.events(s, dir)
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val errors = e.where(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("value"))
      AsofJoin.asofNearest(clicks, errors, "user_id", "ts",
        leftCols = Seq("event_id"), rightCols = Seq("ts", "value"), prefix = "err_")
        .select(
          col("event_id"), col("user_id"),
          expr("err_ts div 1000").as("err_ts_us"),
          round(col("err_value"), 6).as("err_value"))
    },
    Some("""
      WITH l AS (SELECT user_id, epoch_ns(ts) AS lts, event_id
                 FROM events WHERE event_type = 'click'),
      r AS (SELECT user_id, epoch_ns(ts) AS rts, value
            FROM events WHERE event_type = 'error'),
      cand AS (
        SELECT l.event_id, l.user_id, l.lts, r.rts, r.value,
               row_number() OVER (PARTITION BY l.event_id
                 ORDER BY abs(r.rts - l.lts),
                          CASE WHEN r.rts <= l.lts THEN 0 ELSE 1 END) AS rk
        FROM l JOIN r ON l.user_id = r.user_id)
      SELECT l.event_id, l.user_id,
             c.rts // 1000 AS err_ts_us,
             round(c.value, 6) AS err_value
      FROM l LEFT JOIN (SELECT * FROM cand WHERE rk = 1) c
        ON l.event_id = c.event_id
    """),
  )

  /** Tolerance-bounded as-of join (pandas `merge_asof(tolerance=...)`
    * parity): the backward match is kept only when it lies within 1
    * hour of the click — farther matches null out, exactly pandas'
    * semantics. Same one-Exchange asof plan; the tolerance is a pure
    * post-projection.
    */
  val qAsofTolerance: Q = Q(
    "q_asof_tolerance",
    (s, dir) => {
      val tol = 3600000000000L
      val e = Tables.events(s, dir)
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val errors = e.where(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("value"))
      AsofJoin.asof(clicks, errors, "user_id", "ts",
        leftCols = Seq("event_id"), rightCols = Seq("ts", "value"), prefix = "err_")
        .select(col("event_id"), col("user_id"),
          when(col("ts") - col("err_ts") <= tol, expr("err_ts div 1000")).as("err_ts_us"),
          when(col("ts") - col("err_ts") <= tol, round(col("err_value"), 6)).as("err_value"))
    },
    Some("""
      SELECT l.event_id, l.user_id,
             CASE WHEN epoch_ns(l.ts) - epoch_ns(r.ts) <= 3600000000000
                  THEN epoch_ns(r.ts) // 1000 END AS err_ts_us,
             CASE WHEN epoch_ns(l.ts) - epoch_ns(r.ts) <= 3600000000000
                  THEN round(r.value, 6) END AS err_value
      FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') l
      ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'error') r
        ON l.user_id = r.user_id AND l.ts >= r.ts
    """),
  )

  /** Q1-style aggregation over the 6-key l_returnflag/l_linestatus
    * space, two-stage salted — identical result to the plain groupBy,
    * but the first shuffle fans each hot key over 64 salt buckets.
    */
  val qAggSalted: Q = Q(
    "q_agg_salted",
    (s, dir) => {
      val l = Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity"), col("l_extendedprice"),
          (col("l_orderkey") * 8 + col("l_linenumber")).as("uk"))
      Skew.saltedAgg(l, Seq("l_returnflag", "l_linestatus"),
        Seq("l_quantity", "l_extendedprice"), uniqueCol = "uk")
        .select(col("l_returnflag"), col("l_linestatus"),
          round(col("sum_l_quantity"), 4).as("sum_qty"),
          col("cnt_l_quantity").as("n_qty"),
          round(col("min_l_quantity"), 4).as("min_qty"),
          round(col("max_l_quantity"), 4).as("max_qty"),
          round(col("avg_l_extendedprice"), 4).as("avg_price"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 4) AS sum_qty,
             count(l_quantity) AS n_qty,
             round(min(l_quantity), 4) AS min_qty,
             round(max(l_quantity), 4) AS max_qty,
             round(avg(l_extendedprice), 4) AS avg_price
      FROM lineitem GROUP BY 1, 2
    """),
  )

  /** Range (point-in-interval) join with NO equi key: 50 overlapping
    * value intervals derived from the fit-time min/max; the registered
    * plan is the bucketed equi-join (one hash shuffle + residual), not
    * the broadcast-nested-loop Spark would pick for the bare range
    * predicate. Oracle: DuckDB's native non-equi join.
    */
  val qRangeJoin: Q = Q(
    "q_range_join",
    (s, dir) => {
      val e = Tables.events(s, dir).select(col("event_id"), col("value"))
      val r = e.agg(min(col("value")), max(col("value"))).head()
      val (mn, mx) = (r.getDouble(0), r.getDouble(1))
      val width = (mx - mn) / 50
      val iv = s.range(50).select(col("id").as("k"),
        (lit(mn) + col("id") * lit(width)).as("lo"),
        (lit(mn) + (col("id") + 2) * lit(width)).as("hi"))
      graft.operators.RangeJoin.pointInInterval(e, "value", iv, "lo", "hi", width)
        .select(col("event_id"), col("k"))
    },
    Some("""
      WITH st AS (SELECT min(value) AS mn, max(value) AS mx FROM events),
      iv AS (
        SELECT k, mn + k * ((mx - mn) / 50) AS lo,
               mn + (k + 2) * ((mx - mn) / 50) AS hi
        FROM range(50) t(k), st)
      SELECT e.event_id, iv.k
      FROM events e JOIN iv ON e.value >= iv.lo AND e.value < iv.hi
    """),
  )

  /** Bucketed-table co-located join: both sides written bucketed on the
    * join key (16 buckets), so the sort-merge join runs with NO shuffle
    * exchange on either side — the pre-partitioning pattern for a fact
    * table joined repeatedly on the same key at 100 TB. Oracle: the
    * plain join + aggregation.
    */
  /** Write the two bucketed tables (idempotent per session+dir): the
    * bench row `bucketed_tables_write` times THIS step separately so
    * `q_bucketed_join`'s min-of-two-runs bench time measures the
    * exchange-free join, not the table writes it used to charge to a
    * row named "join".
    */
  @volatile private var bucketedFor: Option[String] = None

  private[graft] def writeBucketedTables(s: org.apache.spark.sql.SparkSession,
                                         dir: String): Unit = {
    val wh = s"/tmp/graft_bucketed_${math.abs(dir.hashCode)}"
    s.sql("DROP TABLE IF EXISTS g_lineitem_b")
    s.sql("DROP TABLE IF EXISTS g_orders_b")
    // repartition ON the bucket key into bucket-count partitions
    // before the bucketed write (guide §6): one writer task per
    // bucket producing exactly one file per bucket — without it the
    // single-row-group scan writes all 16 buckets from 1-2 tasks
    // (serialized sort + 16 files per task)
    Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_quantity"))
      .repartition(16, col("l_orderkey"))
      .write.mode("overwrite").option("path", s"$wh/l")
      .bucketBy(16, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("g_lineitem_b")
    Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
      .repartition(16, col("o_orderkey"))
      .write.mode("overwrite").option("path", s"$wh/o")
      .bucketBy(16, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("g_orders_b")
    // the memo lives HERE so a direct bench-row call can never leave a
    // stale dir recorded against freshly written tables
    bucketedFor = Some(dir)
  }

  val qBucketedJoin: Q = Q(
    "q_bucketed_join",
    (s, dir) => {
      // memoized within the session PER SOURCE DIR (the in-memory
      // catalog dies with the JVM, so a fresh Verify/Bench run always
      // rewrites): bench's second timed run skips the writes and
      // measures the join alone
      if (!bucketedFor.contains(dir) ||
        !s.catalog.tableExists("g_lineitem_b") ||
        !s.catalog.tableExists("g_orders_b"))
        writeBucketedTables(s, dir)
      s.table("g_lineitem_b")
        .join(s.table("g_orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy((col("o_custkey") % 100).as("cust_bucket"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 4).as("sum_qty"))
    },
    Some("""
      SELECT o_custkey % 100 AS cust_bucket, count(*) AS n,
             round(sum(l_quantity), 4) AS sum_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1
    """),
  )

  /** Skew-salted join on the 3-value l_returnflag key: probe side
    * salted 64 ways, 3-row dim replicated per salt — result equals the
    * plain join (the oracle).
    */
  val qJoinSalted: Q = Q(
    "q_join_salted",
    (s, dir) => {
      val l = Tables.lineitem(s, dir).select(col("l_returnflag"), col("l_quantity"),
        (col("l_orderkey") * 8 + col("l_linenumber")).as("uk"))
      val dim = l.select(col("l_returnflag")).distinct()
        .withColumn("flag_code", ascii(col("l_returnflag")))
      Skew.saltedJoin(l, dim, "l_returnflag", "uk")
        .groupBy(col("l_returnflag"), col("flag_code"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 4).as("sum_qty"))
    },
    Some("""
      WITH dim AS (
        SELECT DISTINCT l_returnflag, ascii(l_returnflag) AS flag_code FROM lineitem)
      SELECT l.l_returnflag, d.flag_code, count(*) AS n,
             round(sum(l.l_quantity), 4) AS sum_qty
      FROM lineitem l JOIN dim d ON l.l_returnflag = d.l_returnflag
      GROUP BY 1, 2
    """),
  )

  /** Dynamic partition pruning: the fact table is PARTITIONED on the
    * join key; joining a small filtered dim makes Spark push a runtime
    * subquery filter into the fact scan's PartitionFilters — only the
    * dim-surviving partitions are read. At 100 TB this is the
    * difference between scanning 2 event types and all of them, with
    * zero query-author effort once the layout partitions on the key.
    * The spec asserts `dynamicpruning` in the fact scan.
    */
  val qDppJoin: Q = Q(
    "q_dpp_join",
    (s, dir) => {
      val path = "/tmp/graft_dpp_fact"
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          expr("cast(ts as long)").as("ts"), col("value"), col("event_type"))
        .write.mode("overwrite").partitionBy("event_type").parquet(path)
      val fact = s.read.parquet(path)
      // the dim must be a FILE source carrying a selective filter —
      // DPP's PartitionPruning rule needs a surviving Filter node on
      // the build side (a filtered LocalRelation constant-folds to
      // nothing and never triggers the runtime subquery)
      val dimPath = "/tmp/graft_dpp_dim"
      s.createDataFrame(Seq(("click", 1.0), ("purchase", 5.0), ("error", -1.0)))
        .toDF("etype", "weight")
        .write.mode("overwrite").parquet(dimPath)
      val dim = s.read.parquet(dimPath).where(col("weight") > 0)
      fact.join(dim, col("event_type") === col("etype"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          graft.operators.ExactAgg.decSum(col("value") * col("weight"))
            .as("weighted_v"))
    },
    Some(s"""
      SELECT event_type, count(*) AS n,
             ${OracleExact.decSumSql(
               "value * CASE event_type WHEN 'click' THEN 1.0 ELSE 5.0 END")}
               AS weighted_v
      FROM events
      WHERE event_type IN ('click', 'purchase')
      GROUP BY 1
    """),
  )

  /** Key-skew diagnostic ([[Skew.skewReport]]): the top-10 heaviest
    * event keys with share and skew-vs-mean factor — the measurement
    * that decides whether a 100 TB run needs the salted agg/join
    * variants (§12's ~16× trigger).
    */
  val qSkewReport: Q = Q(
    "q_skew_report",
    (s, dir) => Skew.skewReport(
      Tables.events(s, dir).select(col("user_id")), "user_id", topK = 10)
      .select(col("user_id"), col("cnt"),
        round(col("share"), 6).as("share"),
        round(col("skew_vs_mean"), 6).as("skew_vs_mean")),
    Some("""
      WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
      t AS (SELECT sum(cnt)::DOUBLE AS total, count(*)::DOUBLE AS nk FROM c)
      SELECT user_id, cnt,
             round(cnt / t.total, 6) AS share,
             round(cnt * t.nk / t.total, 6) AS skew_vs_mean
      FROM c CROSS JOIN t
      ORDER BY cnt DESC, user_id LIMIT 10
    """),
  )

  /** Z-order locality report ([[graft.operators.ZOrder]]): Morton-
    * interleave (user_id, ts) into the layout clustering key and emit
    * each key-range bucket's row count + min/max rank envelope in
    * both dimensions — the OPTIMIZE-ZORDER-class measurement showing
    * two-sided file pruning would work. Exact integer arithmetic end
    * to end; the oracle replays the quantization, the shift/mask
    * spread ladder, and the bucket report bit-for-bit.
    */
  val qZorder: Q = Q(
    "q_zorder",
    (s, dir) => graft.operators.ZOrder.localityReport(
      Tables.events(s, dir).select(col("user_id"), col("ts")),
      "user_id", "ts", buckets = 64),
    Some("""
      WITH st AS (
        SELECT min(user_id) AS mna, max(user_id) AS mxa,
               min(epoch_ns(ts)) AS mnb, max(epoch_ns(ts)) AS mxb
        FROM events),
      q AS (
        SELECT (user_id - st.mna) // ((st.mxa - st.mna) // 65536 + 1) AS qa,
               (epoch_ns(ts) - st.mnb) // ((st.mxb - st.mnb) // 65536 + 1) AS qb
        FROM events CROSS JOIN st),
      s1 AS (SELECT qa, qb, (qa | (qa << 8)) & 16711935 AS a1,
                            (qb | (qb << 8)) & 16711935 AS b1 FROM q),
      s2 AS (SELECT qa, qb, (a1 | (a1 << 4)) & 252645135 AS a2,
                            (b1 | (b1 << 4)) & 252645135 AS b2 FROM s1),
      s3 AS (SELECT qa, qb, (a2 | (a2 << 2)) & 858993459 AS a3,
                            (b2 | (b2 << 2)) & 858993459 AS b3 FROM s2),
      s4 AS (SELECT qa, qb, (a3 | (a3 << 1)) & 1431655765 AS a4,
                            (b3 | (b3 << 1)) & 1431655765 AS b4 FROM s3)
      SELECT (a4 | (b4 << 1)) // 67108864 AS bucket,
             count(*) AS n,
             min(qa) AS qa_min, max(qa) AS qa_max,
             min(qb) AS qb_min, max(qb) AS qb_max
      FROM s4 GROUP BY 1
    """),
  )

  /** Runtime bloom-filter join (Catalyst `InjectRuntimeFilter`): the
    * selective dimension-side predicate (`o_orderpriority='1-URGENT'`,
    * ~20% of orders) builds a bloom filter that is pushed into the
    * FACT side's scan as `bloom_filter_might_contain(l_orderkey)`, so
    * most lineitem rows die before the shuffle — the shuffle-join
    * analog of DPP, and the mechanism that matters when BOTH sides
    * are too big to broadcast at 100 TB. The size thresholds are
    * tuned for real clusters (probe ≥ 10 GB by default); the query
    * lowers them to exercise the injection at test SF — the PLAN is
    * the product here (ScaleOpsSpec asserts the might_contain
    * predicate and result equality with the filter off), the result
    * itself is an ordinary oracled join-agg.
    */
  /** Builds the bloom-join frame under the CURRENT session confs —
    * the spec drives this directly to assert the injected
    * `bloom_filter_might_contain` predicate in the executed plan.
    */
  def bloomJoinFrame(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val urgent = Tables.orders(s, dir).where(col("o_orderpriority") === "1-URGENT")
    Tables.lineitem(s, dir).hint("merge")
      .join(urgent.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,6)")).cast("double").as("sum_qty"))
      .select(col("o_orderpriority"), col("n"), round(col("sum_qty"), 6).as("sum_qty"))
  }

  /** The bloom-filter confs are session-global and the injection rule
    * reads them at OPTIMIZATION time (i.e. when the caller finally
    * executes a lazy frame) — so the query executes eagerly inside a
    * set/restore scope and returns the materialized 1-row result.
    * Leaving the lowered thresholds set would silently inject bloom
    * filters into every later query optimized in the same session.
    */
  val qBloomJoin: Q = Q(
    "q_bloom_join",
    (s, dir) => {
      val keys = Seq(
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        // the injection rule skips joins it expects to broadcast
        // (isProbablyShuffleJoin); at 100 TB neither side broadcasts,
        // which is exactly the regime bloom joins exist for — simulate
        // it by disabling size-based broadcast inside the scope
        "spark.sql.autoBroadcastJoinThreshold")
      val saved = keys.map(k => k -> s.conf.getOption(k))
      s.conf.set(keys(0), "true")
      s.conf.set(keys(1), "0")
      s.conf.set(keys(2), "-1")
      try {
        val df = bloomJoinFrame(s, dir)
        val rows = df.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
      } finally saved.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None)    => s.conf.unset(k)
      }
    },
    Some("""
      SELECT o_orderpriority, count(*) AS n,
             round(sum(l_quantity::DECIMAL(18,6))::DOUBLE, 6) AS sum_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT'
      GROUP BY 1
    """),
  )

  /** Interval×interval overlap join ([[RangeJoin.intervalOverlap]]):
    * click windows overlapping error windows of the same user (1-hour half-open activity windows) — the two-sided sibling of
    * `q_range_join`, deduplicated by canonical-bucket attribution
    * instead of a distinct pass; equi-join on (user, bucket), never a
    * nested loop.
    */
  val qIntervalOverlap: Q = Q(
    "q_interval_overlap",
    (s, dir) => {
      val w = 3600000000000L // 1 h in ns
      val e = Tables.events(s, dir)
      def side(tpe: String, idAs: String) = e
        .where(col("event_type") === tpe)
        .select(col("user_id"), col("event_id").as(idAs),
          expr("cast(ts as long)").as(s"${idAs}_lo"),
          (expr("cast(ts as long)") + lit(w)).as(s"${idAs}_hi"))
      RangeJoin.intervalOverlap(
        side("click", "l_id"), "l_id_lo", "l_id_hi",
        side("error", "r_id"), "r_id_lo", "r_id_hi",
        bucketWidth = w, keys = Seq("user_id"))
        .select(col("user_id"), col("l_id"), col("r_id"))
    },
    Some("""
      WITH c AS (SELECT user_id, event_id AS l_id, epoch_ns(ts) AS lo,
                        epoch_ns(ts) + 3600000000000 AS hi
                 FROM events WHERE event_type = 'click'),
      e AS (SELECT user_id, event_id AS r_id, epoch_ns(ts) AS lo,
                   epoch_ns(ts) + 3600000000000 AS hi
            FROM events WHERE event_type = 'error')
      SELECT c.user_id, c.l_id, e.r_id
      FROM c JOIN e ON c.user_id = e.user_id AND c.lo < e.hi AND e.lo < c.hi
    """),
  )

  /** Fact-to-versioned-dimension temporal join — the warehouse join
    * every SCD2 dimension exists FOR ("which attribute version was in
    * force when this event happened"): events equi-join their user's
    * version list with the half-open validity residual
    * `valid_from ≤ ts < valid_to` (open version's valid_to = +∞), so
    * candidates are bounded by per-key version count — the standard
    * versioned-dim shape (an as-of join is the keyless alternative;
    * range-bucketing takes over when one key's history is huge). The
    * dim is built inline from the same q_scd2 chain, which makes the
    * join SELF-VERIFYING: the (attr, event_type) rollup must be purely
    * diagonal, because each event's in-force version is by
    * construction the run that contains it.
    */
  val qDimAsofEnrich: Q = Q(
    "q_dim_asof_enrich",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, dir)
        .withColumn("ts", expr("ts div 1000 * 1000"))
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val dim = e.withColumn("prev", lag(col("event_type"), 1).over(w))
        .where(col("prev").isNull || col("prev") =!= col("event_type"))
        .select(col("user_id").as("d_user"), col("event_type").as("attr"),
          col("ts").as("valid_from"),
          coalesce(lead(col("ts"), 1).over(w), lit(Long.MaxValue)).as("valid_to"))
      e.join(dim, col("user_id") === col("d_user") &&
          col("ts") >= col("valid_from") && col("ts") < col("valid_to"))
        .groupBy(col("attr"), col("event_type"))
        .agg(count(lit(1)).as("n"))
    },
    Some("""
      WITH s AS (SELECT user_id, epoch_ns(ts) AS ts, event_id, event_type FROM events),
      m AS (SELECT user_id, ts, event_id, event_type,
                   lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
            FROM s),
      f AS (SELECT * FROM m WHERE prev IS NULL OR prev <> event_type),
      dim AS (SELECT user_id AS d_user, event_type AS attr, ts AS valid_from,
                coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                         9223372036854775807) AS valid_to
              FROM f)
      SELECT dim.attr, s.event_type, count(*)::BIGINT AS n
      FROM s JOIN dim ON s.user_id = dim.d_user
       AND s.ts >= dim.valid_from AND s.ts < dim.valid_to
      GROUP BY 1, 2
    """),
  )

  /** Small-file compaction planner — the lakehouse maintenance op a
    * 100 TB table needs nightly (the OPTIMIZE/bin-pack planning step):
    * the file grain is a (day, bucket) rollup standing in for the
    * table's physical files (bytes = 64·rows), and within each DAY the
    * files next-fit into target-size groups by cumulative bytes over
    * the (bytes DESC, bucket) order — group = cum_before div target,
    * so a group exceeds the target by at most one file, and the
    * cumsum window is PARTITIONED by day (never a global sort; a day
    * with a pathological file count salts on a bucket prefix). Output
    * is the rewrite plan (day, bucket, bytes, group_id) a compactor
    * executes group-by-group.
    */
  val qCompactionPlan: Q = Q(
    "q_compaction_plan",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val files = Tables.events(s, dir)
        .groupBy(expr("ts div 86400000000000").as("day"),
          pmod(col("user_id"), lit(8)).as("bucket"))
        .agg((count(lit(1)) * 64).as("bytes"))
      val w = Window.partitionBy(col("day"))
        .orderBy(col("bytes").desc, col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      files
        .withColumn("cum_before", coalesce(sum(col("bytes")).over(w), lit(0L)))
        .select(col("day"), col("bucket"), col("bytes"),
          expr("cum_before div 8192").as("group_id"))
    },
    Some("""
      WITH f AS (
        SELECT epoch_ns(ts) // 86400000000000 AS day, user_id % 8 AS bucket,
               count(*) * 64 AS bytes
        FROM events GROUP BY 1, 2),
      c AS (
        SELECT day, bucket, bytes,
               coalesce(sum(bytes) OVER (PARTITION BY day
                 ORDER BY bytes DESC, bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        FROM f)
      SELECT day, bucket, bytes, (cb // 8192)::BIGINT AS group_id FROM c
    """),
  )

  val all: Seq[Q] = Seq(qAsof, qAsofNative, qAsofForward, qAsofForwardNative,
    qAsofNearest, qAsofTolerance, qAggSalted, qRangeJoin, qBucketedJoin,
    qJoinSalted, qDppJoin, qSkewReport, qZorder, qBloomJoin, qIntervalOverlap,
    qDimAsofEnrich, qCompactionPlan)
}
