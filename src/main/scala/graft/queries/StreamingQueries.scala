package graft.queries

import graft.Q
import graft.streaming.StreamOps

/** Streaming coverage (SURVEY §2.4 row 46): the driver gets the final
  * materialized result of the streaming window aggregation, which must
  * equal the batch aggregation (and the DuckDB oracle).
  */
object StreamingQueries {

  val streamWindow: Q = Q(
    "stream_window",
    (s, dir) => StreamOps.runToBatch(s, StreamOps.windowAgg(StreamOps.eventsStream(s, dir))),
    Some(s"""
      SELECT floor(epoch_ns(ts) / 3600000000000)::BIGINT AS bucket,
             event_type,
             count(*) AS n,
             ${OracleExact.decSumSql("value")} AS sum_v
      FROM events GROUP BY 1, 2
    """),
  )

  /** Stateful sessionization (30-min gap): streaming append mode emits
    * the gap-CLOSED sessions plus sessions closed by EVENT-TIME TIMEOUT
    * — after the data is drained the watermark settles at
    * max(event time) - 1h, and any open session with end + gap strictly
    * below it times out, emits, and evicts its state. The oracle
    * reproduces gap/cumsum sessionization and applies the identical
    * closed-or-timed-out predicate.
    */
  val streamSessionize: Q = Q(
    "stream_sessionize",
    (s, dir) => {
      val gap = 30L * 60 * 1000 * 1000 * 1000
      import org.apache.spark.sql.functions._
      // DuckDB reads the nanos timestamps at microsecond precision;
      // truncate for hash parity (session semantics unchanged)
      val events = StreamOps.eventsStream(s, dir)
        .withColumn("ts", expr("ts div 1000 * 1000"))
      StreamOps.runToBatch(s, StreamOps.sessionize(events, gap).toDF(),
        mode = "append")
        .select(col("user_id"), col("start_ns"), col("end_ns"), col("n"),
          col("sum_v"))
    },
    Some(s"""
      WITH s AS (SELECT user_id, epoch_ns(ts) AS ts_ns, value FROM events),
      m AS (
        SELECT user_id, ts_ns, value,
               CASE WHEN ts_ns - lag(ts_ns) OVER (PARTITION BY user_id ORDER BY ts_ns)
                         > 1800000000000 THEN 1 ELSE 0 END AS new_sess
        FROM s),
      c AS (
        SELECT user_id, ts_ns, value,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ns
                                   ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM m),
      g AS (
        SELECT user_id, sess_id, min(ts_ns) AS start_ns, max(ts_ns) AS end_ns,
               count(*) AS n, ${OracleExact.decSumSql("value")} AS sum_v
        FROM c GROUP BY 1, 2),
      mx AS (SELECT user_id, max(end_ns) AS max_end FROM g GROUP BY 1),
      wm AS (SELECT max(ts_ns) // 1000000 - 3600000 AS wm_ms FROM s)
      SELECT g.user_id, g.start_ns, g.end_ns, g.n, g.sum_v
      FROM g JOIN mx ON g.user_id = mx.user_id CROSS JOIN wm
      WHERE g.end_ns < mx.max_end
         OR g.end_ns // 1000000 + 1800000 < wm.wm_ms
    """),
  )

  /** Streaming exact dedup on (user_id, event_type): append mode emits
    * each key's first occurrence — the emitted KEY SET equals batch
    * DISTINCT (the survivor row itself would depend on arrival order,
    * so only keys are emitted).
    */
  val streamDedup: Q = Q(
    "stream_dedup",
    (s, dir) => StreamOps.runToBatch(s,
      StreamOps.dedupStream(StreamOps.eventsStream(s, dir),
        Seq("user_id", "event_type")),
      mode = "append",
      // first occurrences emit on arrival; the no-data finalize batch
      // only evicts state (r18 attribution: ~0.3 s of pure commits)
      noDataBatch = Some(false)),
    Some("SELECT DISTINCT user_id, event_type FROM events"),
  )

  /** hex-nibble value of char `pos` (1-based SQL expr) of column h. */
  private def hv(pos: String) =
    s"(strpos('0123456789abcdef', substr(h, $pos, 1)) - 1)"

  /** Streaming NEAR-dup dedup: SimHash band keys through
    * `dropDuplicatesWithinWatermark` (bounded, watermark-evicted
    * state). The emitted key set equals the batch DISTINCT band keys;
    * the oracle replays the md5 signature construction bit-for-bit
    * (same CTE shape as dedup_simhash).
    */
  val streamNeardup: Q = Q(
    "stream_neardup",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      StreamOps.runToBatch(s,
        StreamOps.neardupStream(StreamOps.docsStream(s, dir), "doc_id", "text"),
        mode = "append")
        .select(col("band").cast("long").as("band"), col("band_val"))
    },
    Some(s"""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      tw AS (SELECT doc_id, md5(w) AS h FROM tok WHERE w <> ''),
      cnt AS (SELECT doc_id, count(*) AS n FROM tw GROUP BY 1),
      tb AS (
        SELECT doc_id, b.b AS band,
               ((${hv("4*b.b+1")}*16 + ${hv("4*b.b+2")})*16 + ${hv("4*b.b+3")})*16
                 + ${hv("4*b.b+4")} AS v16
        FROM tw, range(4) b(b)),
      bits AS (
        SELECT doc_id, band, r.r AS bit, sum((v16 >> r.r) & 1) AS ones
        FROM tb, range(16) r(r) GROUP BY 1, 2, 3),
      sig AS (
        SELECT bits.doc_id, band,
               sum(CASE WHEN 2*ones >= cnt.n THEN (1::BIGINT << bit) ELSE 0 END) AS bv
        FROM bits JOIN cnt ON bits.doc_id = cnt.doc_id GROUP BY 1, 2)
      SELECT DISTINCT band, bv::BIGINT AS band_val FROM sig
    """),
  )

  /** Stream-static broadcast enrichment + windowed aggregation: events
    * enriched with the customer dimension, aggregated per (hour,
    * market segment). Equals the batch join+group oracle.
    */
  val streamEnrich: Q = Q(
    "stream_enrich",
    (s, dir) => {
      import graft.Tables
      StreamOps.runToBatch(s,
        StreamOps.enrichAgg(StreamOps.eventsStream(s, dir),
          Tables.customer(s, dir), "c_custkey", "c_mktsegment"))
    },
    Some(s"""
      SELECT floor(epoch_ns(ts) / 3600000000000)::BIGINT AS bucket,
             c_mktsegment,
             count(*) AS n,
             ${OracleExact.decSumSql("value")} AS sum_v
      FROM events JOIN customer ON user_id = c_custkey
      GROUP BY 1, 2
    """),
  )

  /** Stream-stream interval self-join: same-user event pairs within
    * 2 hours, both sides watermarked (bounded join state). Equals the
    * batch interval self-join oracle.
    */
  val streamIntervalJoin: Q = Q(
    "stream_interval_join",
    (s, dir) => StreamOps.runToBatch(s,
      StreamOps.intervalSelfJoin(StreamOps.eventsStream(s, dir),
        StreamOps.eventsStream(s, dir)),
      mode = "append",
      // 4 state stores per partition (2 per join side); size the state
      // partitioning to the drained state (~10^5 rows), not core count
      statePartitions = Some(8),
      // INNER join: every match emits in the data batch; the no-data
      // finalize batch only evicts state (r18 attribution: ~0.95 s —
      // 28% of the drain — of pure state-store commits)
      noDataBatch = Some(false)),
    Some("""
      SELECT a.user_id, a.event_id AS eid_a, b.event_id AS eid_b
      FROM events a JOIN events b ON a.user_id = b.user_id
       AND epoch_us(b.ts) > epoch_us(a.ts)
       AND epoch_us(b.ts) <= epoch_us(a.ts) + 7200000000::BIGINT
    """),
  )

  /** Unwindowed complete-mode keyed profile over the stream — state is
    * one row per user; equals the batch aggregation (and
    * ts_features_basic's oracle shape).
    */
  val streamProfile: Q = Q(
    "stream_ts_profile",
    (s, dir) => StreamOps.runToBatch(s,
      StreamOps.profileAgg(StreamOps.eventsStream(s, dir))),
    Some(s"""
      SELECT user_id, count(value) AS n,
             round(${OracleExact.microAvgSql("value")}, 6) AS mean_v,
             round(stddev_pop(value), 6) AS std_v,
             min(value) AS min_v,
             max(value) AS max_v,
             ${OracleExact.decSumSql("value")} AS sum_v
      FROM events GROUP BY user_id
    """),
  )

  /** Update-mode keyed profile (the 100 TB shape — see
    * StreamOps.profileUpdate): per-key Welford/exact-microunit state via
    * `mapGroupsWithState`, each micro-batch emitting only the touched
    * keys' refreshed snapshots. The memory sink accumulates one snapshot
    * per (key, batch); the final state per key is the max-n snapshot
    * (n strictly increases per update). Mean/sum ride the ExactAgg
    * integer-microunit mirrors, so the oracle replays them exactly;
    * std is 6-dp like every std row.
    */
  val streamProfileUpdate: Q = Q(
    "stream_profile_update",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val snap = StreamOps.runToBatch(s,
        StreamOps.profileUpdate(StreamOps.eventsStream(s, dir)).toDF(),
        mode = "update",
        // 1 store/partition; size state partitioning to the drained
        // state (~10^3 keys), not core count
        statePartitions = Some(8))
      val fields = snap.columns.filterNot(_ == "user_id").toIndexedSeq.map(col)
      snap.groupBy(col("user_id"))
        .agg(max_by(struct(fields: _*), col("n")).as("s"))
        .select(col("user_id") +: snap.columns.filterNot(_ == "user_id")
          .toIndexedSeq.map(c => col(s"s.$c").as(c)): _*)
    },
    Some(s"""
      SELECT user_id, count(value) AS n,
             round(${OracleExact.microAvgSql("value")}, 6) AS mean_v,
             round(stddev_pop(value), 6) AS std_v,
             min(value) AS min_v,
             max(value) AS max_v,
             ${OracleExact.decSumSql("value")} AS sum_v
      FROM events GROUP BY user_id
    """),
  )

  /** Streaming twin of `q_quantile_sketch`: update-mode per-key
    * quantile profile over the deterministic log-histogram sketch —
    * bounded per-key bucket-count state, O(touched keys) emission, and
    * the SAME oracle as the batch sketch because the bucketing is
    * order-free (the scale answer to "streaming p50/p95 per key",
    * which a t-digest could only give non-replayably).
    */
  val streamQuantileProfile: Q = Q(
    "stream_quantile_profile",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val snap = StreamOps.runToBatch(s,
        StreamOps.quantileProfileUpdate(StreamOps.eventsStream(s, dir)).toDF(),
        mode = "update", statePartitions = Some(8))
      val fields = snap.columns.filterNot(_ == "user_id").toIndexedSeq.map(col)
      snap.groupBy(col("user_id"))
        .agg(max_by(struct(fields: _*), col("n")).as("s"))
        .select(col("user_id"), col("s.n").as("n"),
          round(col("s.p50"), 6).as("p50"),
          round(col("s.p95"), 6).as("p95"))
    },
    Some(graft.queries.PipelineQueries.quantileSketchOracle),
  )

  /** Bench-only: `stream_sessionize` with the RocksDB state store —
    * the off-heap, incremental-checkpoint backend a long-running 100 TB
    * streaming job runs (HDFS-backed stores keep all state as JVM heap
    * objects and re-upload full snapshots; RocksDB spills to local SSD
    * and checkpoints deltas). Same query, same result — the bench row
    * exists so the backend claim carries a measured number next to the
    * default-store `stream_sessionize` row. The provider conf is read
    * at query START, so it is set for the duration of the drain and
    * restored afterwards.
    */
  def sessionizeRocksDB(s: org.apache.spark.sql.SparkSession,
                        dir: String): org.apache.spark.sql.DataFrame = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try streamSessionize.run(s, dir)
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  /** Streaming STATE observability (bench + spec row): drain the three
    * representative stateful shapes — flatMapGroupsWithState
    * sessionization, the stream-stream interval join (four state
    * stores per partition), and the mapGroupsWithState quantile-sketch
    * profile — and emit the engine's OWN state accounting per operator
    * (`StreamingQueryProgress.stateOperators`: rows held, rows
    * updated, bytes, final watermark). This turns the repo's "bounded
    * state" claims on the 60+ streaming rows into measured numbers:
    * StreamingSpec pins profile state == distinct keys, sessionize
    * state ≤ open sessions, and join state ≤ the within-horizon rows.
    * No oracle — the metrics are engine accounting, not table data.
    */
  def stateReport(s: org.apache.spark.sql.SparkSession,
                  dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.functions._
    val gap = 30L * 60 * 1000 * 1000 * 1000
    // the three stateful drains are INDEPENDENT streaming queries over
    // the same source — run them concurrently (guide §2.6: overlap
    // independent jobs; unlike the driver-bound HNSW hop loop, each
    // drain spends its time in micro-batch execution, which interleaves
    // cleanly). All three use the same state-partition setting, so the
    // drain-scoped conf set/restore commutes across threads; each
    // report's rows are deterministic engine metrics, and the final
    // order is fixed by the explicit concatenation below.
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration.Duration
    val sp = Some(StreamOps.defaultStatePartitions)
    // INVARIANT (ADVICE r17 #2): every concurrent drain below must pass
    // THIS one statePartitions value. The drain-scoped conf set/restore
    // inside StreamOps.drained mutates the shared session, which only
    // commutes across threads when all drains set the same value — a
    // future drain with a different setting must run sequentially or on
    // its own s.newSession().
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", sp.get)
    implicit val ec: scala.concurrent.ExecutionContextExecutorService =
      ExecutionContext.fromExecutorService(
        java.util.concurrent.Executors.newFixedThreadPool(3))
    val rows =
      try {
        val fSess = Future(StreamOps.stateReport(s, "sessionize",
          StreamOps.sessionize(StreamOps.eventsStream(s, dir)
            .withColumn("ts", expr("ts div 1000 * 1000")), gap).toDF(),
          mode = "append", statePartitions = sp))
        val fJoin = Future(StreamOps.stateReport(s, "interval_join",
          StreamOps.intervalSelfJoin(StreamOps.eventsStream(s, dir),
            StreamOps.eventsStream(s, dir)),
          mode = "append", statePartitions = sp))
        val fProf = Future(StreamOps.stateReport(s, "quantile_profile",
          StreamOps.quantileProfileUpdate(StreamOps.eventsStream(s, dir)).toDF(),
          mode = "update", statePartitions = sp))
        Await.result(fSess, Duration.Inf) ++
          Await.result(fJoin, Duration.Inf) ++
          Await.result(fProf, Duration.Inf)
      } finally {
        ec.shutdown()
        s.conf.set("spark.sql.shuffle.partitions", prev)
      }
    rows.toDS().toDF()
  }

  /** EVENT-TIME-SKEW bench of the stream-stream interval join (SURVEY
    * §7.13, open since round 4): one hot user carries ~5% of all
    * events (every event_id % 20 == 0 remapped), so one state-store
    * partition holds that share of the join state and the hot key's
    * quadratic in-horizon pair count dominates the batch. (A 10% share
    * measured 28.1s at sf0.1 — the quadratic OUTPUT explosion drowned
    * the state-store signal; 5% keeps the skew visible at ~¼ the pair
    * volume.) Bench-only — the output is the skewed join's pairs, a
    * fixture with no independent oracle value beyond the un-skewed
    * twin's (already oracled) semantics.
    */
  def intervalJoinSkew(s: org.apache.spark.sql.SparkSession,
                       dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    def hot(df: org.apache.spark.sql.DataFrame) = df.withColumn("user_id",
      when(col("event_id") % 20 === 0, lit(1L)).otherwise(col("user_id")))
    StreamOps.runToBatch(s,
      StreamOps.intervalSelfJoin(hot(StreamOps.eventsStream(s, dir)),
        hot(StreamOps.eventsStream(s, dir))),
      mode = "append", statePartitions = Some(8))
  }

  /** The HOT-KEY-MITIGATED stream-stream interval join (SURVEY §12's
    * one open scale-killer, closed): same pairs as
    * `stream_interval_join` — same oracle — via the time-slice-salted
    * equality key (uid, slice), which spreads a hot user's join state
    * across its live slices' state-store partitions instead of pinning
    * one. See [[StreamOps.intervalSelfJoinSalted]] for the exactness
    * argument (each pair matches in exactly one sub-bucket).
    */
  val streamIntervalJoinSalted: Q = Q(
    "stream_interval_join_salted",
    (s, dir) => StreamOps.runToBatch(s,
      StreamOps.intervalSelfJoinSalted(StreamOps.eventsStream(s, dir),
        StreamOps.eventsStream(s, dir)),
      mode = "append",
      statePartitions = Some(8),
      // INNER join (see stream_interval_join): finalize batch skipped
      noDataBatch = Some(false)),
    Some("""
      SELECT a.user_id, a.event_id AS eid_a, b.event_id AS eid_b
      FROM events a JOIN events b ON a.user_id = b.user_id
       AND epoch_us(b.ts) > epoch_us(a.ts)
       AND epoch_us(b.ts) <= epoch_us(a.ts) + 7200000000::BIGINT
    """),
  )

  /** The skew fixture of [[intervalJoinSkew]] through the SALTED join —
    * the bench pair that adjudicates the mitigation: same hot-user
    * remap, same pair output, state spread over (uid, slice) buckets.
    * Bench-only for the same reason as the un-salted skew row.
    */
  def intervalJoinSkewSalted(s: org.apache.spark.sql.SparkSession,
                             dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    def hot(df: org.apache.spark.sql.DataFrame) = df.withColumn("user_id",
      when(col("event_id") % 20 === 0, lit(1L)).otherwise(col("user_id")))
    StreamOps.runToBatch(s,
      StreamOps.intervalSelfJoinSalted(hot(StreamOps.eventsStream(s, dir)),
        hot(StreamOps.eventsStream(s, dir))),
      mode = "append", statePartitions = Some(8),
      // INNER join (see stream_interval_join): finalize batch skipped.
      // The UN-salted skew twin keeps its finalize batch untouched —
      // it is the unmitigated-skew measurement.
      noDataBatch = Some(false))
  }

  /** KEYED streaming top-k board: the top-10 words PER SOURCE — the
    * "top URLs per domain" dashboard shape, via
    * [[StreamOps.keyedTopKBoard]] (the vocab board's monotone-count
    * exactness argument applied per group). Streaming state is one
    * monotone (source, word) count with map-side combine; each batch's
    * touched slice reduces distributed to ≤ k rows per touched source
    * before reaching the O(#sources × k) driver board. Equals the
    * batch per-group top-k oracle.
    */
  val streamDomainTopk: Q = Q(
    "stream_domain_topk",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val docs = StreamOps.docsStream(s, dir)
        .select(col("source"),
          explode(split(lower(col("text")), " ", -1)).as("w"))
        .where(col("w") =!= "")
      val counts = StreamOps.cumulativeKeyedCounts(docs,
        col("source"), col("w"), "source", "w")
      val top = StreamOps.keyedTopKBoard(counts, 10, "source", "w", "n",
        statePartitions = Some(8))
      import s.implicits._
      top.toDF("source", "w", "n")
    },
    Some("""
      WITH t AS (
        SELECT source, unnest(string_split(lower(text), ' ')) AS w
        FROM documents),
      c AS (SELECT source, w, count(*) AS n FROM t WHERE w <> '' GROUP BY 1, 2),
      r AS (SELECT source, w, n,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY n DESC, w) AS rk
            FROM c)
      SELECT source, w, n FROM r WHERE rk <= 10
    """),
  )

  /** Streaming vocabulary top-k: UPDATE-mode word counts merged into a
    * bounded driver board ([[StreamOps.topKBoard]]) — the "live
    * vocabulary board" a tokenizer-training pipeline watches. Streaming
    * state = one monotone count per distinct word with map-side
    * combine; each batch ships only its TOUCHED words' new counts
    * through a per-batch TakeOrderedAndProject, so nothing ever
    * re-sorts the full vocabulary state (for raw web-text tokens that
    * state is an unbounded typo/URL tail — the scale-killer the
    * earlier complete-mode `orderBy.limit` shape paid every batch).
    * The k-entry board is exact, not approximate (monotonicity
    * argument in the scaladoc); the final table equals the batch
    * text_vocab oracle.
    */
  val streamVocab: Q = Q(
    "stream_vocab",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val counts = StreamOps.docsStream(s, dir)
        .select(explode(split(lower(col("text")), " ", -1)).as("w"))
        .where(col("w") =!= "")
        .groupBy(col("w")).agg(count(lit(1)).as("n"))
      val top = StreamOps.topKBoard(counts, 100, statePartitions = Some(8))
      import s.implicits._
      top.toDF("w", "n")
    },
    Some("""
      SELECT w, count(*) AS n
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
      WHERE w <> ''
      GROUP BY w ORDER BY n DESC, w LIMIT 100
    """),
  )

  /** LEFT-OUTER stream-stream interval join: the inner pairs plus a
    * null-padded row for every event that provably never got a
    * same-user follow-up within 2h — "provably" = the watermark passed
    * its join horizon (l + 2h < final watermark), which the oracle
    * replays as an explicit NOT EXISTS + horizon predicate. Unmatched
    * events still inside the horizon are withheld, the defining
    * semantics of a streaming outer join.
    */
  val streamIntervalJoinOuter: Q = Q(
    "stream_interval_join_outer",
    (s, dir) => StreamOps.runToBatch(s,
      StreamOps.intervalSelfJoin(StreamOps.eventsStream(s, dir),
        StreamOps.eventsStream(s, dir), joinType = "left_outer"),
      mode = "append",
      statePartitions = Some(8)),
    Some("""
      WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
      wm AS (SELECT max(us) - 3600000000 AS wm_us FROM e)
      SELECT a.user_id, a.event_id AS eid_a, b.event_id AS eid_b
      FROM e a JOIN e b ON a.user_id = b.user_id
       AND b.us > a.us AND b.us <= a.us + 7200000000
      UNION ALL
      SELECT a.user_id, a.event_id AS eid_a, NULL::BIGINT AS eid_b
      FROM e a CROSS JOIN wm
      WHERE a.us + 7200000000 < wm.wm_us
        AND NOT EXISTS (SELECT 1 FROM e b WHERE b.user_id = a.user_id
                        AND b.us > a.us AND b.us <= a.us + 7200000000)
    """),
  )

  /** Streaming CDC compaction (update-mode twin of `q_latest_by_key`):
    * per-key latest row via `mapGroupsWithState`, snapshots re-emitted
    * only for keys a batch touches. The memory sink accumulates one
    * snapshot per (key, batch); the final state is the max-(ts_ns,
    * event_id) snapshot per key — same oracle as the batch compaction.
    */
  val streamLatestByKey: Q = Q(
    "stream_latest_by_key",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val snap = StreamOps.runToBatch(s,
        StreamOps.latestByKey(StreamOps.eventsStream(s, dir)
          .withColumn("ts", expr("ts div 1000 * 1000"))).toDF(),
        mode = "update", statePartitions = Some(8))
      val fields = snap.columns.filterNot(_ == "user_id").toIndexedSeq.map(col)
      snap.groupBy(col("user_id"))
        .agg(max_by(struct(fields: _*),
          struct(col("ts_ns"), col("event_id"))).as("s"))
        .select(col("user_id"), col("s.ts_ns").as("ts_ns"),
          col("s.event_id").as("event_id"),
          col("s.event_type").as("event_type"),
          round(col("s.value"), 6).as("value"))
    },
    Some("""
      SELECT user_id, ts_ns, event_id, event_type, round(value, 6) AS value
      FROM (
        SELECT user_id, epoch_ns(ts) AS ts_ns, event_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rk
        FROM events)
      WHERE rk = 1
    """),
  )

  /** Streaming count-min sketch: the CM grid is a groupBy over a key
    * space BOUNDED by construction (depth·width = 2048 cells), so
    * complete-mode streaming aggregation is the honest shape — state
    * and sink traffic are O(sketch size) regardless of corpus or
    * vocabulary size, the whole point of sketching the stream. The
    * final grid snapshot equals the batch grid bit-exactly (integer
    * cell counts), so the batch oracle carries over unchanged.
    */
  val streamHeavyHitters: Q = Q(
    "stream_heavy_hitters",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      import graft.operators.FreqSketch
      val (depth, width) = (4, 512)
      val toks = StreamOps.docsStream(s, dir)
        .select(explode(split(lower(col("text")), " ", -1)).as("w"))
        .where(col("w") =!= "")
      val grid = StreamOps.runToBatch(s,
        FreqSketch.countMinGrid(toks, "w", depth, width),
        mode = "complete", statePartitions = Some(8))
      val batchToks = graft.Tables.documents(s, dir)
        .select(explode(split(lower(col("text")), " ", -1)).as("w"))
        .where(col("w") =!= "")
      val top = batchToks.groupBy("w").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w")).limit(20)
      FreqSketch.estimate(grid, top.select("w"), "w", depth, width)
        .join(top, "w")
        .select(col("w"), col("n"), col("est"),
          (col("est") - col("n")).as("overcount"))
    },
    graft.queries.TextQueries.heavyHitters.oracle,
  )

  /** Stateless streaming PII scrub: the [[TextQueries.piiEnrich]]
    * fixture + [[graft.operators.Pii.scan]] applied per micro-batch
    * (append mode, zero state) — the scrub-before-anything-persists
    * placement a streaming ingestion pipeline wants; output equals the
    * batch `text_pii` row, so it shares that oracle verbatim.
    */
  val streamPii: Q = Q(
    "stream_pii",
    (s, dir) => {
      import org.apache.spark.sql.functions.col
      StreamOps.runToBatch(s,
        graft.operators.Pii.scan(
          TextQueries.piiEnrich(
            StreamOps.docsStream(s, dir).select(col("doc_id"), col("text"))),
          "t")
          .select(col("doc_id"), col("n_email"), col("n_phone"),
            col("n_ip"), col("n_ssn"), col("redacted")),
        mode = "append")
    },
    TextQueries.textPii.oracle,
  )

  /** NATIVE session-window sessionization — the Spark-first twin of
    * [[streamSessionize]] (which exercises the flatMapGroupsWithState
    * escape hatch): `session_window(tse, gap)` merges events whose gap
    * is strictly below 30 min (native rule: an event extends a session
    * iff its time < session end = last + gap; the custom fold merges on
    * <=, so the two queries are deliberately NOT oracle-identical at
    * exact-gap boundaries), and append mode emits exactly the windows
    * the final watermark (max event time - 1h) has passed. State is
    * per-(user, open session) and watermark-evicted — the built-in
    * operator a production job should reach for first; the fMGWS twin
    * exists for session logic the native gap rule can't express.
    */
  val streamSessionWindow: Q = Q(
    "stream_session_window",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val ev = StreamOps.eventsStream(s, dir)
        // µs truncation for hash parity with DuckDB's timestamp reads
        .withColumn("tse", timestamp_micros(expr("cast(ts as long) div 1000")))
        .withWatermark("tse", "1 hour")
      val agg = ev
        .groupBy(session_window(col("tse"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"),
          graft.operators.ExactAgg.decSum(col("value")).as("sum_v"))
        .select(col("user_id"),
          (unix_micros(col("session_window.start")) * 1000).as("start_ns"),
          (unix_micros(col("session_window.end")) * 1000).as("end_ns"),
          col("n"), col("sum_v"))
      StreamOps.runToBatch(s, agg, mode = "append")
    },
    Some(s"""
      WITH s AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
      m AS (
        SELECT user_id, ts_us, value,
               CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
                         >= 1800000000 THEN 1 ELSE 0 END AS new_sess
        FROM s),
      c AS (
        SELECT user_id, ts_us, value,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
                                   ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM m),
      g AS (
        SELECT user_id, min(ts_us) AS start_us,
               max(ts_us) + 1800000000 AS end_us,
               count(*) AS n, ${OracleExact.decSumSql("value")} AS sum_v
        FROM c GROUP BY user_id, sess_id),
      wm AS (SELECT max(ts_us) - 3600000000 AS wm_us FROM s)
      SELECT user_id, start_us * 1000 AS start_ns, end_us * 1000 AS end_ns,
             n, sum_v
      FROM g CROSS JOIN wm WHERE end_us < wm.wm_us
    """),
  )

  /** Streaming anomaly monitor: the [[StreamOps.rollingZScores]]
    * per-key ring-buffer twin of the batch `ts_anomaly` — identical
    * integer arithmetic, so the drained stream equals the batch frame
    * row for row and SHARES its oracle verbatim (the stream_pii
    * pattern).
    */
  val streamAnomaly: Q = Q(
    "stream_anomaly",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      StreamOps.runToBatch(s,
        StreamOps.rollingZScores(StreamOps.eventsStream(s, dir)).toDF(),
        mode = "append")
        .select(col("user_id"), col("ts"), round(col("value"), 6).as("value"),
          round(col("z"), 6).as("z"), col("is_anomaly"))
    },
    TsQueries.tsAnomaly.oracle)

  /** Streaming Holt smoothing: [[StreamOps.holtSmooth]] carries the
    * (level, trend) integer pair across micro-batches — equals the
    * batch `ts_holt` row for row and shares its recursive-CTE oracle.
    */
  val streamHolt: Q = Q(
    "stream_holt",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val events = StreamOps.eventsStream(s, dir)
        .withColumn("ts", expr("ts div 1000 * 1000"))
      StreamOps.runToBatch(s, StreamOps.holtSmooth(events).toDF(), mode = "append")
        .select(col("user_id"), col("ts"), round(col("value"), 6).as("value"),
          round(col("level"), 6).as("level"), round(col("trend"), 6).as("trend"))
    },
    TsQueries.tsHolt.oracle)

  /** Streaming equi-width histogram under the FIT-OFFLINE /
    * APPLY-ONLINE contract: bin edges come from an exact batch
    * min/max fit (interpolated as literals, the q_histogram pattern —
    * a stream cannot know its global min/max), the bin-count
    * aggregation runs on the stream in complete mode with k-bounded
    * state. The drained result equals the batch histogram over the
    * same data, and the oracle is the batch formulation.
    */
  val streamHistogram: Q = Q(
    "stream_histogram",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val k = 20
      val r = graft.Tables.events(s, dir)
        .agg(min(col("value")).as("mn"), max(col("value")).as("mx")).head()
      val (mn, mx) = (r.getDouble(0), r.getDouble(1))
      val binned = StreamOps.eventsStream(s, dir)
        .select(least(floor((col("value") - lit(mn)) * lit(k.toDouble) / lit(mx - mn)),
          lit((k - 1).toDouble)).cast("int").as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
      StreamOps.runToBatch(s, binned, mode = "complete")
        .select(col("bin"),
          round(lit(mn) + col("bin") * lit(mx - mn) / lit(k.toDouble), 6).as("lo"),
          round(lit(mn) + (col("bin") + 1) * lit(mx - mn) / lit(k.toDouble), 6).as("hi"),
          col("cnt"))
    },
    Some("""
      WITH mm AS (SELECT min(value) AS mn, max(value) AS mx FROM events),
      b AS (SELECT least(floor((value - mn) * 20.0 / (mx - mn)), 19.0)::INT AS bin, mn, mx
            FROM events, mm)
      SELECT bin, round(mn + bin * (mx - mn) / 20.0, 6) AS lo,
             round(mn + (bin + 1) * (mx - mn) / 20.0, 6) AS hi,
             count(*) AS cnt
      FROM b GROUP BY bin, mn, mx
    """),
  )

  /** Streaming distinct-count sketch: the deterministic HLL register
    * file built ON the stream (m=512-key complete-mode groupBy —
    * bounded state on an unbounded stream, the whole point of the
    * sketch), estimate computed from the drained register table with
    * the same arithmetic as the batch `q_hll_distinct`; the oracle
    * replays registers + estimate for the same column.
    */
  val streamCountDistinct: Q = {
    val m = 512
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    Q(
      "stream_count_distinct",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        import graft.operators.HllSketch
        val h = HllSketch.h32(col("user_id"))
        val w = floor(h / lit(m)).cast("long")
        val rank = when(w === 0, lit(24)).otherwise(lit(24) - length(bin(w)))
        val reg = StreamOps.eventsStream(s, dir)
          .where(col("user_id").isNotNull)
          .select(pmod(h, lit(m)).as("j"), rank.as("r"))
          .groupBy(col("j")).agg(max(col("r")).as("mr"))
        val drained = StreamOps.runToBatch(s, reg, mode = "complete")
        HllSketch.estimate(drained, m).select(round(col("est"), 6).as("est"))
      },
      Some(s"""
        SELECT round(CASE WHEN ($alpha)::DOUBLE * $m * $m / s <= ${2.5 * m} AND v > 0
                          THEN $m * ln($m / v)
                          ELSE ($alpha)::DOUBLE * $m * $m / s END, 6) AS est
        FROM (
          SELECT sum(power(2.0, -mr)) + ($m - count(*)) AS s,
                 $m - count(*) AS v
          FROM (
            SELECT j, max(r) AS mr
            FROM (
              SELECT h % $m AS j,
                     CASE WHEN h // $m = 0 THEN 24
                          ELSE 24 - length(bin(h // $m)) END AS r
              FROM (SELECT ${OracleExact.h32Sql("md5((user_id)::VARCHAR)")} AS h
                    FROM events WHERE user_id IS NOT NULL))
            GROUP BY j))
      """),
    )
  }

  /** Streaming Markov transitions ([[StreamOps.eventTransitions]]):
    * O(1) last-event state per user emits (prev → cur) pairs; the
    * drained stream aggregates to exactly the batch lead() matrix and
    * shares `q_event_transitions`' oracle verbatim.
    */
  val streamEventTransitions: Q = Q(
    "stream_event_transitions",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val drained = StreamOps.runToBatch(s,
        StreamOps.eventTransitions(StreamOps.eventsStream(s, dir)).toDF(),
        mode = "append")
      val wf = Window.partitionBy(col("event_type"))
      drained.groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("prob", round(col("cnt") / sum(col("cnt")).over(wf), 6))
        .select(col("event_type"), col("next_type"), col("cnt"), col("prob"))
    },
    RelationalQueries.qEventTransitions.oracle)

  /** Streaming funnel ([[StreamOps.funnel]]): per-user O(1) state
    * machine; the funnel is monotone, so the most-advanced drained
    * snapshot per user (completeness rank) equals the batch
    * `q_funnel` row and shares its oracle verbatim.
    */
  val streamFunnel: Q = Q(
    "stream_funnel",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val drained = StreamOps.runToBatch(s,
        StreamOps.funnel(StreamOps.eventsStream(s, dir)).toDF(), mode = "append")
      val rank = Window.partitionBy(col("user_id")).orderBy(
        col("t3").desc_nulls_last, col("t2").desc_nulls_last,
        col("t1").desc_nulls_last)
      drained.withColumn("__rk", row_number().over(rank))
        .where(col("__rk") === 1)
        .select(col("user_id"),
          expr("t1 div 1000").as("t1_us"),
          expr("t2 div 1000").as("t2_us"),
          expr("t3 div 1000").as("t3_us"),
          col("t3").isNotNull.cast("int").as("converted"))
    },
    RelationalQueries.qFunnel.oracle)

  /** Streaming data-quality gate — the DISTRIBUTIVE subset of the
    * `q_expectations` suite as a complete-mode streaming aggregate
    * with O(#checks) state (a distinct-count uniqueness check is not
    * streamable; the batch gate or the HLL sketch covers it), the
    * stack() unpivot + verdicts applied to the drained snapshot. The
    * gate a continuous ingestion pipeline keeps live next to its sink.
    */
  val streamExpectations: Q = Q(
    "stream_expectations",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val schema = s.read.parquet(s"$dir/orders.parquet").schema
      val orders = s.readStream.schema(schema)
        .option("pathGlobFilter", "orders.parquet").parquet(dir)
      val agg = orders.agg(
        sum(when(col("o_orderkey") <= 0, 1L).otherwise(0L)).as("bad_key"),
        sum(when(col("o_totalprice") < 0, 1L).otherwise(0L)).as("neg_price"),
        (count(lit(1)) - count(col("o_custkey"))).as("null_cust"),
        sum(when(!col("o_orderstatus").isin("F", "O", "P"), 1L).otherwise(0L))
          .as("bad_status"))
      StreamOps.runToBatch(s, agg, mode = "complete")
        .select(expr(
          """stack(4,
             'orderkey_positive', bad_key,
             'totalprice_nonneg', neg_price,
             'custkey_not_null', null_cust,
             'status_in_domain', bad_status) AS (check_name, observed)"""))
        .select(col("check_name"), col("observed"),
          (col("observed") === 0).cast("int").as("passed"))
    },
    Some("""
      WITH a AS (SELECT
          sum(CASE WHEN o_orderkey <= 0 THEN 1 ELSE 0 END)::BIGINT AS bad_key,
          sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END)::BIGINT AS neg_price,
          count(*) - count(o_custkey) AS null_cust,
          sum(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END)::BIGINT AS bad_status
        FROM orders)
      SELECT 'orderkey_positive' AS check_name, bad_key AS observed, (bad_key = 0)::INT AS passed FROM a
      UNION ALL
      SELECT 'totalprice_nonneg', neg_price, (neg_price = 0)::INT FROM a
      UNION ALL
      SELECT 'custkey_not_null', null_cust, (null_cust = 0)::INT FROM a
      UNION ALL
      SELECT 'status_in_domain', bad_status, (bad_status = 0)::INT FROM a
    """))

  /** Streaming cohort retention ([[StreamOps.retention]]): each
    * (user, week-offset) pair is emitted exactly once from O(#weeks)
    * per-user state, so the drained stream aggregated by
    * (cohort, offset) equals the batch `q_retention_cohorts` matrix
    * and shares its oracle verbatim — the live product-analytics
    * rollup a continuous pipeline keeps next to the funnel gate.
    */
  val streamRetention: Q = Q(
    "stream_retention",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val drained = StreamOps.runToBatch(s,
        StreamOps.retention(StreamOps.eventsStream(s, dir)).toDF(),
        mode = "append")
      drained.groupBy(col("cohort_wk"), col("week_offset"))
        .agg(count(lit(1)).as("n_users"))
    },
    RelationalQueries.qRetentionCohorts.oracle)

  /** Streaming sequential-pattern mining ([[StreamOps.seqPatterns]]):
    * per-user O(2) last-two-events state completes one trigram per
    * arrival; the drained (user, path) rows, aggregated and ranked
    * identically to the batch query, equal `q_seq_patterns` and share
    * its oracle verbatim — live journey discovery with n-gram state.
    */
  val streamSeqPatterns: Q = Q(
    "stream_seq_patterns",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val drained = StreamOps.runToBatch(s,
        StreamOps.seqPatterns(StreamOps.eventsStream(s, dir)).toDF(),
        mode = "append")
      drained.groupBy(col("path"))
        .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_occ"))
        .orderBy(col("n_users").desc, col("path")).limit(10)
    },
    RelationalQueries.qSeqPatterns.oracle)

  /** Streaming last-touch attribution ([[StreamOps.attribution]]):
    * O(1) per-user state (the most recent click's ts+channel), credit
    * emitted per purchase as it arrives; drained rows aggregated by
    * channel equal the batch `q_attribution` rollup and share its
    * oracle verbatim — live marketing attribution with the smallest
    * state any attribution model admits.
    */
  val streamAttribution: Q = Q(
    "stream_attribution",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val drained = StreamOps.runToBatch(s,
        StreamOps.attribution(StreamOps.eventsStream(s, dir)).toDF(),
        mode = "append")
      drained.groupBy(col("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          round(sum(col("cents")) / lit(100.0), 2).as("revenue"))
    },
    RelationalQueries.qAttribution.oracle)

  /** Streaming cohort LTV ([[StreamOps.cohortLtv]]): additive revenue
    * contributions emitted once per event from O(1) per-user state
    * (just the cohort week), drained and summed into the batch
    * `q_cohort_ltv` matrix — cumulative column re-derived with the
    * same bounded window; shares the batch oracle verbatim.
    */
  val streamCohortLtv: Q = Q(
    "stream_cohort_ltv",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val drained = StreamOps.runToBatch(s,
        StreamOps.cohortLtv(StreamOps.eventsStream(s, dir)).toDF(),
        mode = "append")
      val g = drained.groupBy(col("cohort_wk"), col("week_offset"))
        .agg(sum(col("cents")).as("cents"))
      val wC = Window.partitionBy(col("cohort_wk")).orderBy(col("week_offset"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      g.select(col("cohort_wk"), col("week_offset"),
        round(col("cents") / lit(100.0), 2).as("revenue"),
        round(sum(col("cents")).over(wC) / lit(100.0), 2).as("cum_revenue"))
    },
    RelationalQueries.qCohortLtv.oracle)

  /** Streaming per-key model fitting — `q_grouped_linreg`'s live twin:
    * the five exact decimal normal-equation sums per user accumulate
    * in ONE complete-mode aggregate (O(d²) state per key, mergeable by
    * addition — the same property that makes the batch fit one pass),
    * and the closed-form slope/intercept/R² is a narrow projection on
    * the drained snapshot. This is "a million per-key models, updated
    * continuously" — the fit is always current without refitting from
    * scratch. Per-user value-vs-day trend over the event stream;
    * zero-variance users null out in both engines.
    */
  val streamGroupedLinreg: Q = Q(
    "stream_grouped_linreg",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val dayNs = 86400000000000L
      val g = StreamOps.eventsStream(s, dir)
        .select(col("user_id"), expr(s"ts div $dayNs").as("x"), col("value").as("y"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast("decimal(28,6)")).as("sxd"),
          sum(col("y").cast("decimal(28,6)")).as("syd"),
          sum((col("x") * col("x")).cast("decimal(28,6)")).as("sxxd"),
          sum((col("x") * col("y")).cast("decimal(28,6)")).as("sxyd"),
          sum((col("y") * col("y")).cast("decimal(28,6)")).as("syyd"))
      val d = StreamOps.runToBatch(s, g, mode = "complete")
        .select(col("user_id"), col("n"),
          col("sxd").cast("double").as("sx"), col("syd").cast("double").as("sy"),
          col("sxxd").cast("double").as("sxx"), col("sxyd").cast("double").as("sxy"),
          col("syyd").cast("double").as("syy"))
      val nd = col("n").cast("double")
      val vx = nd * col("sxx") - col("sx") * col("sx")
      val vy = nd * col("syy") - col("sy") * col("sy")
      val cov = nd * col("sxy") - col("sx") * col("sy")
      val slope = cov / vx
      d.select(col("user_id"), col("n"),
        round(when(vx === 0, lit(null)).otherwise(slope), 6).as("slope"),
        round(when(vx === 0, lit(null))
          .otherwise((col("sy") - slope * col("sx")) / nd), 6).as("intercept"),
        round(when(vx === 0 || vy === 0, lit(null))
          .otherwise(cov * cov / (vx * vy)), 6).as("r2"))
    },
    Some("""
      WITH g AS (
        SELECT user_id, count(*)::BIGINT AS n,
               sum((epoch_ns(ts) // 86400000000000)::DECIMAL(28,6))::DOUBLE AS sx,
               sum((value)::DECIMAL(28,6))::DOUBLE AS sy,
               sum(((epoch_ns(ts) // 86400000000000) * (epoch_ns(ts) // 86400000000000))::DECIMAL(28,6))::DOUBLE AS sxx,
               sum(((epoch_ns(ts) // 86400000000000) * value)::DECIMAL(28,6))::DOUBLE AS sxy,
               sum((value * value)::DECIMAL(28,6))::DOUBLE AS syy
        FROM events GROUP BY 1),
      c AS (SELECT user_id, n,
              n::DOUBLE * sxx - sx * sx AS vx,
              n::DOUBLE * syy - sy * sy AS vy,
              n::DOUBLE * sxy - sx * sy AS cov,
              sx, sy FROM g)
      SELECT user_id, n,
             round(CASE WHEN vx = 0 THEN NULL ELSE cov / vx END, 6) AS slope,
             round(CASE WHEN vx = 0 THEN NULL ELSE (sy - (cov / vx) * sx) / n::DOUBLE END, 6) AS intercept,
             round(CASE WHEN vx = 0 OR vy = 0 THEN NULL ELSE cov * cov / (vx * vy) END, 6) AS r2
      FROM c
    """),
  )

  /** Streaming SCD2 dimension build ([[StreamOps.scd2]]): closed
    * versions stream to the sink in append mode; the OPEN version per
    * key is O(1) state (servable as the "current row" — how a live
    * SCD2 ingestion actually splits current vs history). The drained
    * set equals the batch `q_scd2` rows with a non-null valid_to, so
    * the oracle is the batch chain restricted to closed versions.
    */
  val streamScd2: Q = Q(
    "stream_scd2",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val events = StreamOps.eventsStream(s, dir)
        .withColumn("ts", expr("ts div 1000 * 1000"))
      StreamOps.runToBatch(s, StreamOps.scd2(events).toDF(), mode = "append")
        .select(col("user_id"), col("version"), col("attr"),
          col("valid_from"), col("valid_to"))
    },
    Some("""
      WITH s AS (SELECT user_id, epoch_ns(ts) AS ts, event_id, event_type
                 FROM events),
      m AS (SELECT user_id, ts, event_id, event_type,
                   lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     AS prev
            FROM s),
      f AS (SELECT * FROM m WHERE prev IS NULL OR prev <> event_type),
      v AS (SELECT user_id,
              row_number() OVER w AS version,
              event_type AS attr,
              ts AS valid_from,
              lead(ts) OVER w AS valid_to
            FROM f
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT user_id, version, attr, valid_from, valid_to
      FROM v WHERE valid_to IS NOT NULL
    """),
  )

  /** Watermark-lateness report — the OBSERVABILITY measurement that
    * picks the `withWatermark` delay every stateful stream_* row
    * depends on: replay the corpus in ARRIVAL order (a deterministic
    * ±1 h md5 jitter on the event time — the corpus itself arrives
    * time-sorted, so out-of-orderness must be planted to measure
    * anything) and flag each event LATE iff its event time trails the
    * per-user running arrival-max by more than the candidate watermark
    * (30 min): exactly the events a stateful operator would drop.
    * Everything rides ONE hash(user) Exchange — the arrival-order
    * window and the per-user rollup share the key — and the lateness
    * magnitudes are exact integer seconds. A real deployment runs this
    * batch query over yesterday's ingest log to set tomorrow's
    * watermark; max_late_s tells you the delay that would have lost
    * nothing.
    */
  val qLatenessReport: Q = Q(
    "q_lateness_report",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val wmNs = 1800L * 1000000000L
      val jitter = (graft.operators.Sampling.hashBucket(col("event_id")) % 7200 - 3600)
        .cast("long") * lit(1000000000L)
      val ev = graft.Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          expr("cast(ts as long)").as("tsn"))
        .withColumn("arr", col("tsn") + jitter)
      val w = Window.partitionBy(col("user_id")).orderBy(col("arr"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val flagged = ev
        .withColumn("hwm", max(col("tsn")).over(w))
        .select(col("user_id"),
          when(col("hwm") - col("tsn") > wmNs, 1L).otherwise(0L).as("late"),
          when(col("hwm") - col("tsn") > wmNs,
            expr("(hwm - tsn) div 1000000000")).otherwise(lit(0L)).as("late_s"))
      flagged.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), sum(col("late")).as("n_late"),
          max(col("late_s")).as("max_late_s"))
    },
    Some(s"""
      WITH ev AS (
        SELECT user_id, event_id, epoch_ns(ts) AS tsn,
               epoch_ns(ts) + (${OracleExact.h16Sql("md5(event_id::VARCHAR)")} % 7200 - 3600)::BIGINT * 1000000000 AS arr
        FROM events),
      f AS (
        SELECT user_id,
               max(tsn) OVER (PARTITION BY user_id ORDER BY arr, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm,
               tsn
        FROM ev)
      SELECT user_id, count(*)::BIGINT AS n_events,
             sum(CASE WHEN hwm - tsn > 1800000000000 THEN 1 ELSE 0 END)::BIGINT AS n_late,
             max(CASE WHEN hwm - tsn > 1800000000000
                      THEN (hwm - tsn) // 1000000000 ELSE 0 END)::BIGINT AS max_late_s
      FROM f GROUP BY 1
    """),
  )

  /** Streaming PSI drift monitor — the live twin of the batch `q_psi`
    * report under the same FIT-OFFLINE / APPLY-ONLINE contract: the
    * period boundary and the 10 baseline-fitted bin edges arrive as
    * literals (a stream cannot know the corpus min/max), the per-bin
    * (baseline, current) counts run in complete mode with k-bounded
    * state, and the PSI arithmetic on the drained snapshot is the
    * identical pure-function-of-exact-counts driver fold — so the
    * result equals the batch report and SHARES its oracle verbatim.
    * This is the drift gate a continuous feature pipeline keeps live
    * next to its sink: state O(k), alert = psi_total threshold.
    */
  val streamPsi: Q = Q(
    "stream_psi",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val ev = graft.Tables.events(s, dir)
      val b = ev.agg(min(expr("cast(ts as long)")), max(expr("cast(ts as long)"))).head()
      val mid = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 2
      val fit = ev.where(expr(s"cast(ts as long) < ${mid}L"))
        .agg(min(col("value")), max(col("value"))).head()
      val (lo, hi) = (fit.getDouble(0), fit.getDouble(1))
      val width = (hi - lo) / 10.0
      val counts = StreamOps.eventsStream(s, dir)
        .select(
          least(greatest(floor((col("value") - lit(lo)) / lit(width)), lit(0.0)),
            lit(9.0)).cast("long").as("bin"),
          (col("ts") < lit(mid)).cast("long").as("isA"))
        .groupBy(col("bin"))
        .agg(sum(col("isA")).as("n_a"), sum(lit(1L) - col("isA")).as("n_b"))
      val rows = StreamOps.runToBatch(s, counts, mode = "complete")
        .orderBy(col("bin")).collect() // k-bounded (k <= 10)
      val (terms, total) = graft.operators.Eval.psiTerms(
        rows.toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
      import s.implicits._
      terms.map { case (bin, nA, nB, m) =>
        (bin, nA, nB, m / 1e6, total / 1e6)
      }.toDF("bin", "n_a", "n_b", "psi_term", "psi_total")
    },
    PipelineQueries.qPsi.oracle)

  /** Streaming Kaplan–Meier twin: per-user spans track live with O(1)
    * state (`StreamOps.userSpans` — each batch emits the widened
    * snapshot), the drained most-advanced snapshot per user equals
    * the batch min/max rollup, and the day-grain survival curve
    * finishes on it via the shared `kmCurve` tail — so the live
    * retention dashboard equals the batch `q_survival_km` row for
    * row and shares its oracle verbatim.
    */
  val streamSurvivalKm: Q = Q(
    "stream_survival_km",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val drained = StreamOps.runToBatch(s,
        StreamOps.userSpans(StreamOps.eventsStream(s, dir)).toDF(),
        mode = "append")
      val rank = Window.partitionBy(col("user_id"))
        .orderBy(col("l").desc, col("f"))
      StatsQueries.kmCurve(
        drained.withColumn("__rk", row_number().over(rank))
          .where(col("__rk") === 1)
          .select(col("user_id"), col("f"), col("l")))
    },
    StatsQueries.qSurvivalKm.oracle)

  /** Streaming A/B-lift twin: per-user purchase counters track live
    * with O(1) state; counts are monotone so the drained max per
    * user equals the batch rollup, and the shared z-test tail
    * (`RelationalQueries.abLiftFromCounts`) makes the live
    * experiment dashboard equal `q_ab_lift` — shared oracle.
    */
  val streamAbLift: Q = Q(
    "stream_ab_lift",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val drained = StreamOps.runToBatch(s,
        StreamOps.purchaseCounts(StreamOps.eventsStream(s, dir)).toDF(),
        mode = "append")
      RelationalQueries.abLiftFromCounts(
        drained.groupBy(col("user_id")).agg(max(col("np")).as("np")))
    },
    RelationalQueries.qAbLift.oracle)

  /** Streaming KS twin: the (cents × arm) rollup is a BOUNDED-grain
    * complete-mode aggregate (state = distinct purchase cents per
    * arm, the same grain the batch test rides), drained into the
    * shared KS tail — live distribution-drift monitoring that equals
    * `q_ks_test` and shares its oracle.
    */
  val streamKsTest: Q = Q(
    "stream_ks_test",
    (s, dir) => StatsQueries.ksFromRoll(
      StreamOps.runToBatch(s,
        StatsQueries.ksRoll(StreamOps.eventsStream(s, dir)),
        mode = "complete")),
    StatsQueries.qKsTest.oracle)

  /** Streaming trimmed-mean twin: same bounded value-grain
    * complete-mode rollup, shared exact rank-accounting tail — the
    * robust live KPI next to the streaming quantile sketch, equal to
    * `q_trimmed_mean` with a shared oracle.
    */
  val streamTrimmedMean: Q = Q(
    "stream_trimmed_mean",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val roll = StreamOps.eventsStream(s, dir)
        .where(col("event_type") === "purchase")
        .select(round(col("value") * 100).cast("long").as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("c"))
      StatsQueries.trimmedFromRoll(StreamOps.runToBatch(s, roll, mode = "complete"))
    },
    StatsQueries.qTrimmedMean.oracle)

  /** Streaming Markov-entropy twin: transitions stream live from the
    * O(1)-state `eventTransitions` machine, the drained rows roll up
    * to the k²-bounded grid, and the shared entropy tail makes the
    * live predictability scalar equal `q_markov_entropy` — shared
    * oracle.
    */
  val streamMarkovEntropy: Q = Q(
    "stream_markov_entropy",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val drained = StreamOps.runToBatch(s,
        StreamOps.eventTransitions(StreamOps.eventsStream(s, dir)).toDF(),
        mode = "append")
      StatsQueries.entropyFromCells(
        drained.groupBy(col("event_type").as("a"), col("next_type").as("b"))
          .agg(count(lit(1)).as("c")))
    },
    StatsQueries.qMarkovEntropy.oracle)

  /** Streaming gains-curve twin: live per-user activity snapshots
    * (`StreamOps.userActivity`, O(1) monotone state), drained
    * most-advanced snapshot per user → the shared exact-decile gains
    * tail — the live campaign-targeting table equals `q_gains_curve`
    * and shares its oracle.
    */
  val streamGainsCurve: Q = Q(
    "stream_gains_curve",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val drained = StreamOps.runToBatch(s,
        StreamOps.userActivity(StreamOps.eventsStream(s, dir)).toDF(),
        mode = "append")
      val rank = Window.partitionBy(col("user_id"))
        .orderBy(col("n_events").desc, col("np").desc)
      StatsQueries.gainsFromUsers(
        drained.withColumn("__rk", row_number().over(rank))
          .where(col("__rk") === 1)
          .select(col("user_id"), col("n_events").as("score"),
            when(col("np") >= 14, 1L).otherwise(0L).as("y")))
    },
    StatsQueries.qGainsCurve.oracle)

  /** Streaming WoE/IV twin: the same activity snapshots feed the
    * shared 10-bin tail — live feature-strength monitoring equal to
    * `q_woe_iv`, shared oracle.
    */
  val streamWoeIv: Q = Q(
    "stream_woe_iv",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val drained = StreamOps.runToBatch(s,
        StreamOps.userActivity(StreamOps.eventsStream(s, dir)).toDF(),
        mode = "append")
      val rank = Window.partitionBy(col("user_id"))
        .orderBy(col("n_events").desc, col("np").desc)
      StatsQueries.woeFromUsers(
        drained.withColumn("__rk", row_number().over(rank))
          .where(col("__rk") === 1)
          .select(col("n_events").as("score"),
            when(col("np") >= 14, 1L).otherwise(0L).as("y")))
    },
    StatsQueries.qWoeIv.oracle)

  /** Streaming Spearman twin: activity snapshots -> shared tie-exact
    * midrank tail, equal to `q_spearman`, shared oracle.
    */
  val streamSpearman: Q = Q(
    "stream_spearman",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val drained = StreamOps.runToBatch(s,
        StreamOps.userActivity(StreamOps.eventsStream(s, dir)).toDF(),
        mode = "append")
      val rank = Window.partitionBy(col("user_id"))
        .orderBy(col("n_events").desc, col("np").desc)
      StatsQueries.spearmanFromUsers(
        drained.withColumn("__rk", row_number().over(rank))
          .where(col("__rk") === 1)
          .select(col("n_events").as("x1"), col("np").as("x2")))
    },
    StatsQueries.qSpearman.oracle)

  /** Streaming Mann–Whitney twin: the SAME bounded purchase-cents
    * value-grain rollup as `stream_ks_test` (complete-mode, map-side
    * combined) drained into the shared tie-exact rank-sum tail —
    * the live nonparametric location monitor, equal to
    * `q_mann_whitney` with a shared oracle.
    */
  val streamMannWhitney: Q = Q(
    "stream_mann_whitney",
    (s, dir) => StatsQueries.mwFromRoll(
      StreamOps.runToBatch(s,
        StatsQueries.ksRoll(StreamOps.eventsStream(s, dir)),
        mode = "complete")),
    StatsQueries.qMannWhitney.oracle)

  /** Streaming CUSUM twin: the calendar-bounded daily purchase-cents
    * rollup in complete mode, drained into the shared exact
    * cumsum-minus-running-extremum fold — the live change-point
    * monitor, equal to `q_cusum_drift` with a shared oracle.
    */
  val streamCusum: Q = Q(
    "stream_cusum",
    (s, dir) => StatsQueries.cusumFromDays(
      StreamOps.runToBatch(s,
        StatsQueries.cusumDays(StreamOps.eventsStream(s, dir)),
        mode = "complete")),
    StatsQueries.qCusumDrift.oracle)

  /** Streaming Theil–Sen twin: the same calendar-bounded daily
    * rollup in complete mode through the shared robust-slope tail,
    * equal to `q_theil_sen` with a shared oracle.
    */
  val streamTheilSen: Q = Q(
    "stream_theil_sen",
    (s, dir) => StatsQueries.theilSenFromDays(
      StreamOps.runToBatch(s,
        StatsQueries.cusumDays(StreamOps.eventsStream(s, dir)),
        mode = "complete")),
    StatsQueries.qTheilSen.oracle)

  /** Streaming changepoint twin: daily rollup in complete mode
    * through the shared binary-segmentation tail — the live "where
    * did the level shift" locator, equal to `q_changepoint_binary`
    * with a shared oracle.
    */
  val streamChangepoint: Q = Q(
    "stream_changepoint",
    (s, dir) => StatsQueries.changepointFromDays(
      StreamOps.runToBatch(s,
        StatsQueries.cusumDays(StreamOps.eventsStream(s, dir)),
        mode = "complete")),
    StatsQueries.qChangepoint.oracle)

  /** Streaming Tukey-fence twin: the bounded (type, cents) rollup in
    * complete mode through the shared fence tail — live per-segment
    * outlier rates, equal to `q_outlier_fences` with a shared oracle.
    */
  val streamOutlierFences: Q = Q(
    "stream_outlier_fences",
    (s, dir) => StatsQueries.fencesFromRoll(
      StreamOps.runToBatch(s,
        StatsQueries.fencesRoll(StreamOps.eventsStream(s, dir)),
        mode = "complete")),
    StatsQueries.qOutlierFences.oracle)

  /** Streaming STL twin: the daily rollup in complete mode through
    * the shared decomposition tail — the live seasonality panel,
    * equal to `q_stl_decompose` with a shared oracle.
    */
  val streamStl: Q = Q(
    "stream_stl",
    (s, dir) => StatsQueries.stlFromDays(
      StreamOps.runToBatch(s,
        StatsQueries.cusumDays(StreamOps.eventsStream(s, dir)),
        mode = "complete")),
    StatsQueries.qStlDecompose.oracle)

  /** Streaming partial-correlation twin: live (events, purchases,
    * revenue) snapshots from `StreamOps.userRevActivity` (O(1)
    * monotone state), drained most-advanced snapshot per user →
    * the shared exact-sum tail, equal to `q_partial_corr` with a
    * shared oracle.
    */
  val streamPartialCorr: Q = Q(
    "stream_partial_corr",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val drained = StreamOps.runToBatch(s,
        StreamOps.userRevActivity(StreamOps.eventsStream(s, dir)).toDF(),
        mode = "append")
      val rank = Window.partitionBy(col("user_id"))
        .orderBy(col("ne").desc, col("np").desc, col("rc").desc)
      StatsQueries.partialCorrFromUsers(
        drained.withColumn("__rk", row_number().over(rank))
          .where(col("__rk") === 1)
          .select(col("ne").as("a"), col("np").as("b"), col("rc").as("c")))
    },
    StatsQueries.qPartialCorr.oracle)

  /** Streaming confusion-matrix twin: the 4-cell (tp, fp, fn, tn)
    * global rollup is a complete-mode aggregate with O(1) state, the
    * drained row feeds the shared classification-report tail — the
    * live model-QA report card equals `q_confusion_matrix` and shares
    * its oracle.
    */
  val streamConfusionMatrix: Q = Q(
    "stream_confusion_matrix",
    (s, dir) => MetricsQueries.confusionReport(
      StreamOps.runToBatch(s,
        MetricsQueries.confusionCounts(StreamOps.eventsStream(s, dir)),
        mode = "complete")),
    MetricsQueries.qConfusionMatrix.oracle)

  /** Streaming Welch-t twin: the per-arm (n, Σm, Σm²) exact moment
    * rollup is a 2-row complete-mode aggregate, the shared scalar
    * tail makes the live continuous-metric experiment readout equal
    * `q_welch_ttest` with a shared oracle.
    */
  val streamWelchTtest: Q = Q(
    "stream_welch_ttest",
    (s, dir) => MetricsQueries.welchFromMoments(
      StreamOps.runToBatch(s,
        MetricsQueries.armMoments(StreamOps.eventsStream(s, dir)),
        mode = "complete")),
    MetricsQueries.qWelchTtest.oracle)

  /** Streaming Jensen–Shannon twin: bin edges are fit-offline scalars
    * (the stream_psi discipline — same global min/max the batch query
    * fits), the (bin × arm) rollup is a 10-row complete-mode
    * aggregate, and the shared smoothed-term tail equals
    * `q_js_divergence` with a shared oracle.
    */
  val streamJsDivergence: Q = Q(
    "stream_js_divergence",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val mm = graft.Tables.events(s, dir)
        .where(col("event_type") === "purchase")
        .agg(min(col("value")), max(col("value"))).head()
      val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
      val width = (hi - lo) / 10.0
      val counts = StreamOps.eventsStream(s, dir)
        .where(col("event_type") === "purchase")
        .select(
          least(greatest(floor((col("value") - lit(lo)) / lit(width)),
            lit(0.0)), lit(9.0)).cast("long").as("bin"),
          StatsQueries.arm(col("user_id")).as("g"))
        .groupBy(col("bin"))
        .agg(sum(when(col("g") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("g") === 1, 1L).otherwise(0L)).as("n_b"))
      MetricsQueries.jsFromBins(StreamOps.runToBatch(s, counts, mode = "complete"))
    },
    MetricsQueries.qJsDivergence.oracle)

  /** Streaming Kendall-τ twin: the ≤550-cell (quantity × discount)
    * contingency rollup is a bounded complete-mode aggregate over the
    * lineitem stream (the generic `tableStream` source), the shared
    * grid tail equals `q_kendall_tau` with a shared oracle — live
    * ordinal-association monitoring with value-grain state.
    */
  val streamKendallTau: Q = Q(
    "stream_kendall_tau",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      MetricsQueries.tauFromCells(StreamOps.runToBatch(s,
        StreamOps.tableStream(s, dir, "lineitem")
          .groupBy(col("l_quantity").cast("long").as("x"),
            round(col("l_discount") * 100).cast("long").as("y"))
          .agg(count(lit(1)).as("c")),
        mode = "complete"))
    },
    MetricsQueries.qKendallTau.oracle)

  /** Streaming SPRT twin: the day-grain (n, x) rollup streams in
    * complete mode (bounded calendar-day state), the drained snapshot
    * re-aggregates per day (idempotent max — also the Aggregate the
    * bounded-grain window guard requires beneath the LLR window) and
    * feeds the shared SPRT tail — the live early-stopping monitor
    * equals `q_sprt` and shares its oracle.
    */
  val streamSprt: Q = Q(
    "stream_sprt",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val drained = StreamOps.runToBatch(s,
        MetricsQueries.sprtDays(StreamOps.eventsStream(s, dir)),
        mode = "complete")
      MetricsQueries.sprtReport(
        drained.groupBy(col("day"))
          .agg(max(col("n")).as("n"), max(col("x")).as("x")))
    },
    MetricsQueries.qSprt.oracle)

  /** Streaming TOST twin: same 2-row complete-mode moment rollup as
    * the Welch twin, shared equivalence tail — equals `q_tost`,
    * shared oracle.
    */
  val streamTost: Q = Q(
    "stream_tost",
    (s, dir) => MetricsQueries.tostFromMoments(
      StreamOps.runToBatch(s,
        MetricsQueries.armMoments(StreamOps.eventsStream(s, dir)),
        mode = "complete")),
    MetricsQueries.qTost.oracle)

  /** Streaming MCC/κ twin: the shared 4-cell complete-mode confusion
    * rollup into the chance-corrected-agreement tail — equals
    * `q_mcc_kappa`, shared oracle.
    */
  val streamMccKappa: Q = Q(
    "stream_mcc_kappa",
    (s, dir) => MetricsQueries.mccFromCounts(
      StreamOps.runToBatch(s,
        MetricsQueries.confusionCounts(StreamOps.eventsStream(s, dir)),
        mode = "complete")),
    MetricsQueries.qMccKappa.oracle)

  /** Streaming incremental near-dup ([[StreamOps.bandIndexProbe]]):
    * tonight's crawl STREAM probes the persisted MinHash band index
    * through stateless stream-static joins and emits exact-Jaccard-
    * verified (new, base) pairs in append mode; the drained batch
    * result dedups band-repeat copies. Oracle = full-recompute
    * equivalence restricted to CROSS pairs (the stream probes the
    * index only — within-batch pairs are dedup_incremental's job).
    */
  val streamDedupIncremental: Q = Q(
    "stream_dedup_incremental",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      import graft.Tables
      val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      // shared pid+sf-scoped standing index (write-if-absent): the
      // stream probes the same index the batch twin maintains — one
      // build per JVM, never a clobber across processes
      val idx = DedupQueries.standingBandIndex(s, dir)
      val index = s.read.parquet(idx)
      def docsS = StreamOps.docsStream(s, dir).select(col("doc_id"), col("text"))
      val fresh = docsS.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" tail marker words")).as("text"))
        .unionAll(docsS.where(col("doc_id") % 20 === 0)
          .select((col("doc_id") + 200000).as("doc_id"), col("text")))
      StreamOps.runToBatch(s,
        StreamOps.bandIndexProbe(fresh, "doc_id", "text", index, base),
        mode = "append")
        .dropDuplicates("id_a", "id_b")
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    },
    Some(s"""
      SELECT * FROM (${DedupQueries.exactJaccardSql(DedupQueries.incCorpusSql, 3, 0.8)})
      WHERE id_a < 100000 AND id_b >= 100000
    """),
  )

  /** Streaming URL dedup — the crawl-firehose twin of
    * `text_url_dedup`: canonicalize statelessly
    * ([[graft.operators.Urls.canonicalUrl]]) and pass each canonical
    * key's FIRST occurrence through `dropDuplicatesWithinWatermark`
    * (watermark-evicted state, bounded by the key rate within the
    * horizon — the stream_neardup discipline). Emitted key set equals
    * batch DISTINCT; the oracle replays the regex chain.
    */
  val streamUrlDedup: Q = Q(
    "stream_url_dedup",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val docsS = StreamOps.docsStream(s, dir).select(col("doc_id"))
        .withColumn("url", TextQueries.crawlUrl(col("doc_id")))
      StreamOps.runToBatch(s, docsS
        .withColumn("tse", timestamp_micros(col("doc_id").cast("long") + 1))
        .withColumn("canonical_url",
          graft.operators.Urls.canonicalUrl(col("url")))
        .withWatermark("tse", "1 hour")
        .dropDuplicatesWithinWatermark("canonical_url")
        .select(col("canonical_url")), mode = "append")
    },
    Some(s"""
      WITH u AS (${TextQueries.crawlUrlSql})
      SELECT DISTINCT ${TextQueries.canonicalUrlSql("url")} AS canonical_url
      FROM u
    """),
  )

  /** Streaming k-anonymity monitor — the release gate running
    * continuously over the ingest: complete-mode QI-grain counts
    * (bounded state: 25 nations × 5 segments), drained snapshot
    * re-aggregated idempotently (max), violation verdict and
    * table-level k from the bounded grain. Shares q_k_anonymity's
    * oracle.
    */
  val streamKAnonymity: Q = Q(
    "stream_k_anonymity",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val snap = StreamOps.runToBatch(s,
        StreamOps.tableStream(s, dir, "customer")
          .groupBy(col("c_nationkey"), col("c_mktsegment"))
          .agg(count(lit(1)).as("group_size")))
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(max(col("group_size")).as("group_size"))
      val kMin = snap.agg(min(col("group_size"))).head().getLong(0)
      snap.select(col("c_nationkey"), col("c_mktsegment"), col("group_size"),
        (col("group_size") < 10).cast("int").as("violates_k10"),
        lit(kMin).as("anonymity_k"))
    },
    RelationalQueries.qKAnonymity.oracle,
  )

  /** The exactly-once STREAMING SINK driven end-to-end: the events
    * stream lands in the transactional [[graft.sources.VersionedV2]]
    * table (one immutable version per micro-batch epoch, two-phase
    * commit, atomic pointer publish — SURVEY rows 419/424) and the
    * committed table is read back through the same connector. The
    * id,rawLongBits serialization makes the parquet→stream→sink→scan
    * round trip BIT-exact, so the oracle is simply the source table —
    * any lost, duplicated, or corrupted epoch hash-mismatches.
    */
  val streamVersionedSink: Q = Q(
    "stream_versioned_sink",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      // FIXED scratch paths, wiped per run: createTempDirectory here
      // would leak a full events-table copy + checkpoint state into
      // /tmp on every bench/verify execution (and VersionedV2 append
      // semantics need a fresh table per run for determinism anyway)
      val path = graft.sources.IO.freshScratchDir("versioned_stream") + "/t"
      val ckpt = graft.sources.IO.freshScratchDir("versioned_stream_ckpt")
      val q = StreamOps.eventsStream(s, dir)
        .select(col("event_id").cast("long").as("id"),
          col("value").cast("double").as("val"))
        .writeStream.format("graft.sources.VersionedV2")
        .option("path", path).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.format("graft.sources.VersionedV2").option("path", path).load()
    },
    Some("SELECT event_id AS id, value AS val FROM events"),
  )

  val all: Seq[Q] = Seq(streamVersionedSink,
    streamWindow, streamSessionize, streamDedup, streamNeardup,
    streamEnrich, streamIntervalJoin, streamIntervalJoinSalted, streamProfile,
    streamProfileUpdate, streamVocab, streamIntervalJoinOuter, streamLatestByKey,
    streamQuantileProfile, streamDomainTopk, streamHeavyHitters, streamPii,
    streamSessionWindow, streamAnomaly, streamHolt, streamHistogram,
    streamCountDistinct, streamEventTransitions, streamFunnel,
    streamExpectations, streamRetention, streamPsi, qLatenessReport, streamScd2,
    streamGroupedLinreg, streamCohortLtv, streamAttribution, streamSeqPatterns,
    streamSurvivalKm, streamAbLift, streamKsTest, streamTrimmedMean,
    streamMarkovEntropy, streamGainsCurve, streamWoeIv, streamSpearman,
    streamMannWhitney, streamCusum, streamTheilSen, streamChangepoint,
    streamOutlierFences, streamStl, streamPartialCorr, streamConfusionMatrix,
    streamWelchTtest, streamJsDivergence, streamKendallTau, streamSprt,
    streamTost, streamMccKappa, streamDedupIncremental, streamUrlDedup,
    streamKAnonymity)
}
