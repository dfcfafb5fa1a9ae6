package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY §2.3 rows 34-36).
  *
  * Scale design: brute-force top-k BROADCASTS the (small) query side —
  * the corpus streams once, no shuffle of the big side; per-query
  * ranking is a window over (query, sim). The LSH path replaces the
  * corpus scan with a bucket join on random-hyperplane signatures:
  * L tables x b bits, shuffle keyed on (table, bucket) — bounded
  * buckets, candidates verified exactly.
  */
object Ann {

  /** Σ a_i*b_i — the codegen'd [[graft.functions.DotProduct]]
    * expression (a fold via zip_with+aggregate evaluates interpreted
    * and boxes every element).
    */
  def dot(a: Column, b: Column): Column = graft.functions.GraftFunctions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** All pairs (id_a < id_b) with cosine >= threshold. Exact pairwise —
    * the oracle-parity path (broadcast nested-loop on the smaller side);
    * at 100 TB use the [[lshTopK]] bucket join instead.
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
                  threshold: Double): DataFrame = {
    // spread the pairwise compute across cores: single-row-group
    // parquet would otherwise pin the nested-loop join to one task
    val par = df.sparkSession.sparkContext.defaultParallelism
    val v = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v")).repartition(par, col("id"))
    val withNorm = v.select(col("id"), col("v"), norm(col("v")).as("nrm"))
    withNorm.as("a").join(withNorm.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** Exact top-k cosine neighbors for each query vector: broadcast the
    * query side, stream the corpus, window-rank per query.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val c = corpus.select(col(idCol).as("nn_id"),
      col(vecCol).cast("array<double>").as("cv")).repartition(par, col("nn_id"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"), cosine(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("nn_id"))
    scored.select(col("query_id"), col("nn_id"), col("cosine"),
      row_number().over(w).as("rank"))
      .where(col("rank") <= k)
  }

  /** Deterministic Rademacher (+-1) hyperplanes: sign(t,j,d) = parity
    * of the first hex char of md5("seed:t:j:d"). md5 (not a JVM PRNG)
    * so ANY engine can replay bucket assignment bit-for-bit — the
    * DuckDB oracles for knn_lsh / dedup_embedding regenerate these
    * planes in SQL.
    */
  private[graft] def planes(tables: Int, bits: Int, dims: Int, seed: Long): Array[Array[Array[Double]]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(tables, bits, dims) { (t, j, d) =>
      md.reset()
      val h = md.digest(s"$seed:$t:$j:$d".getBytes("UTF-8"))
      if (((h(0) >> 4) & 1) == 1) 1.0 else -1.0
    }
  }

  /** IVF-style ANN: a coarse quantizer of `nCells` centroids (sampled
    * deterministically from the corpus — every k-th vector by id
    * order), each corpus vector assigned to its nearest centroid (one
    * broadcast of the centroid table, cosine via the codegen dot);
    * queries probe their `nProbe` nearest cells and rank exactly
    * within them. Shuffle is one hash join on cell id; per-query cost
    * is ~nProbe/nCells of the corpus.
    */
  /** Deterministic coarse centroids: hash-sampled corpus vectors (no
    * global sort/window — a filter + small limit at any scale). The
    * sampling hash is the first 16 bits of md5(id-as-string) so an
    * external oracle can replay centroid selection exactly. Driver
    * state is bounded by nCells vectors.
    */
  /** `knownN`: caller-supplied row count when it already holds one (a
    * frame derived 1:1 from an already-counted frame) — skips the
    * count job, selection unchanged.
    */
  def sampleCentroids(c: DataFrame, idCol: String, vecCol: String,
                      nCells: Int, rem: Long = 0L,
                      knownN: Option[Long] = None): Array[Array[Double]] = {
    val n = knownN.getOrElse(c.count())
    val step = math.max(1L, n / nCells)
    val sel = conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10).cast("long")
    // rem selects the md5-h16 residue class — rem=0 is the historical
    // coarse-centroid selection; a NONZERO rem gives a deterministic
    // sample DISJOINT from it (ivfPqTopK seeds its residual codebooks
    // from rem=1: the rem=0 rows ARE the coarse centroids, so their
    // residuals are exactly the zero vector — degenerate seeds)
    val centroids = c.where(pmod(sel, lit(step)) === lit(rem))
      .orderBy(col(idCol)).limit(nCells)
      .select(col(vecCol)).collect().map(_.getSeq[Double](0).toArray)
    require(centroids.nonEmpty, "no centroids sampled")
    centroids
  }

  /** One Lloyd (k-means) iteration over an embedding column — the IVF
    * index TRAINING primitive: assign every vector to its nearest
    * centroid (one codegen [[graft.functions.TopCells]] pass — cosine
    * vs every centroid, ties to the higher cell), then recompute each
    * cell's centroid as the per-dimension mean in ONE groupBy carrying
    * `dims` sum columns. No explode: the shuffle moves nCells × (dims
    * + 1) aggregates, never n × dims element rows. Sums ride exact
    * decimal(18,6) so the distributed partial-agg order cannot drift
    * from a sequential engine at 6 dp (SURVEY §9).
    * Returns (cell, n, centroid array of per-dim means).
    */
  def kmeansStep(df: DataFrame, idCol: String, vecCol: String,
                 centroids: Array[Array[Double]], dims: Int,
                 repartitionInput: Boolean = true): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    // repartitionInput=false is the LOOP caller's contract
    // ([[kmeansTrain]]): the vectors were already spread + materialized
    // ONCE, so re-shuffling the full corpus every iteration (the one
    // genuinely expensive move at 100 TB — n×dims doubles) is skipped
    val spread = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val v = if (repartitionInput) spread.repartition(par, col("id")) else spread
    val assigned = v.withColumn("cell",
      element_at(graft.functions.GraftFunctions.topCells(col("v"), centroids, 1), 1)
        .getField("cell"))
    // round BEFORE the decimal cast: a bare double→decimal cast rounds
    // with engine-specific tie rules on full-precision floats (caught
    // at sf0.001); round(x, 6) resolves the digit identically on both
    // engines and the cast of the rounded double is then unambiguous
    val sums = (0 until dims).map(d =>
      sum(round(element_at(col("v"), d + 1), 6).cast("decimal(18,6)")).as(s"s$d"))
    val aggs = count(lit(1)).as("n") +: sums
    // ONE decimal expression per dim leaves the aggregate: the exact
    // int64 micro-unit sum (decimal(18,6)·1e6 is integral by
    // construction). The double views below derive from it with plain
    // long→double arithmetic — bit-identical to casting the decimal
    // (|sum|·1e6 < 2^53 at any realistic cell mass, /1e6 is correctly
    // rounded, so both paths yield nearest-double of the exact sum) —
    // instead of the r14 3×dims decimal projection whose generated
    // CheckOverflow code tripled q_kmeans_step's fixed cost. The wide
    // decimal array is aliased in its own Project; CollapseProject
    // keeps it separate (non-cheap, multiply-referenced), so the
    // decimals evaluate once per cell row.
    val micro = assigned.groupBy(col("cell"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("cell"), col("n"),
        array((0 until dims).map(d =>
          (col(s"s$d") * lit(1000000)).cast("long")): _*).as("sum_micro"))
    micro.select(col("cell"), col("n"),
      array((0 until dims).map(d =>
        element_at(col("sum_micro"), d + 1).cast("double") / lit(1e6)
          / col("n")): _*).as("centroid"),
      // the exact sums as doubles too: sums are tie-free (no division),
      // so an external check compares them exactly — a small-n cell's
      // MEAN can land exactly on a 5e-7 rounding tie where engines'
      // round() implementations disagree
      array((0 until dims).map(d =>
        element_at(col("sum_micro"), d + 1).cast("double") / lit(1e6)): _*)
        .as("sum_vec"),
      // the int64 micro-units verbatim: the loop caller derives the
      // fed-forward centroid means from THESE via half-up integer
      // division, never from a double division whose 5e-7 ties the
      // engines break differently
      col("sum_micro"))
  }

  /** Lloyd's k-means to CONVERGENCE (or `maxIter`) — [[kmeansStep]]
    * iterated the way IVF/PQ codebook training actually runs: each
    * iteration is one assignment pass + one `nCells × (dims+1)`
    * aggregate; the new centroids are the 6-dp-QUANTIZED per-dimension
    * means, computed as a half-up int64 micro-unit quotient of the
    * exact decimal sums ([[ExactAgg.microQuotient]] — the quantized
    * model update both engines resolve identically even on exact 5e-7
    * ties, so every iteration's INPUT is bit-identical under external
    * replay and the whole trajectory is oracle-checkable). Driver state per iteration is the bounded nCells ×
    * dims centroid table (a fit boundary, like the CC fast path); the
    * per-vector work stays distributed. Early stop when no centroid
    * coordinate moves more than `tol`; tol = 0 stops at the EXACT
    * fixed point (reachable, because centroids are quantized), so the
    * never-stop sentinel is tol < 0 — that pins exactly `maxIter`
    * iterations, the fixed-T shape a static oracle can replay (the
    * pagerankLoop tolMicro = −1 convention). Non-negative tol is the
    * production setting, spec-covered on a converged fixture.
    *
    * Returns the long-form trajectory (iter, cell, n, dim, m): every
    * iteration's occupancy and rounded centroid coordinates.
    */
  def kmeansTrain(df: DataFrame, idCol: String, vecCol: String,
                  dims: Int, nCells: Int = 16, maxIter: Int = 3,
                  tol: Double = 0.0): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    // spread + materialize the vectors ONCE: every iteration reads the
    // checkpointed partitions instead of re-shuffling the full corpus
    // (n×dims doubles — the dominant data motion at scale; the
    // per-iteration shuffle that remains is the nCells×(dims+1)
    // partial-agg rollup)
    val vecs = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .repartition(par, col("id")).localCheckpoint(eager = false)
    // the count doubles as the checkpoint's materializing job (lazy
    // checkpoint — one job where eager + count was two)
    val nVecs = vecs.count()
    var centroids = sampleCentroids(vecs, "id", "v", nCells,
      knownN = Some(nVecs))
    require(centroids.length == nCells,
      s"kmeansTrain: sampled ${centroids.length} centroids, need $nCells")
    // half-up micro-unit mean from the exact int64 sums, computed on
    // the DRIVER over the bounded nCells×dims fit boundary — the exact
    // Scala mirror of [[ExactAgg.microQuotient]] (pmod-based truncating
    // int64 division; + 0.0 normalizes a −0.0 mean, SURVEY §17
    // signed-zero rule: these doubles are both emitted AND fed back as
    // centroids). The quantized model update BOTH engines resolve
    // identically even on exact 5e-7 ties (round(sum/n, 6) on doubles
    // does not: Spark's BigDecimal HALF_UP and DuckDB's scaled-double
    // round() can disagree on a small-n cell's tie). Driver-side
    // arithmetic over 16×64 longs replaces the r14 per-iteration
    // 64-element CASE projection + localCheckpoint, whose generated
    // code (3 sum_micro references per element) was q_kmeans_train's
    // 2.15× fixed-cost regression — each iteration is now a single
    // collect of (cell, n, sum_micro).
    def microMean(s: Long, n: Long): Double = {
      def pm(a: Long, b: Long): Long = { val m = a % b; if (m < 0) m + b else m }
      def intDiv(a: Long, b: Long): Long = (a - pm(a, b)) / b
      val q = if (s >= 0) intDiv(s * 2 + n, n * 2) else -intDiv(-(s * 2) + n, n * 2)
      q / 1e6 + 0.0
    }
    val spark = df.sparkSession
    val trajectory = Seq.newBuilder[(Int, Int, Long, Int, Double)]
    // AQE splits each iteration's query into one job per stage to
    // re-plan the shuffle — but the loop's only exchange is the
    // nCells×(dims+1) rollup (16 rows): there is nothing to re-plan,
    // and on a job-floor-bound box the extra job per iteration IS the
    // loop's cost (§12m: ~0.3 s/job). Scoped off for the loop's own
    // actions, restored after; at 100 TB the assignment scan's
    // parallelism comes from the checkpointed input partitions either
    // way.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    var it = 1
    var converged = false
    while (it <= maxIter && !converged) {
      val fitted = kmeansStep(vecs, "id", "v", centroids, dims,
        repartitionInput = false)
        .select(col("cell"), col("n"), col("sum_micro"))
        .collect()
        .map(r => r.getInt(0) -> (r.getLong(1),
          r.getSeq[Long](2).map(s => microMean(s, r.getLong(1))).toArray))
        .toMap
      require(fitted.size == nCells,
        s"kmeansTrain: iteration $it left ${nCells - fitted.size} cells empty")
      val next = (0 until nCells).map(k => fitted(k)._2).toArray
      converged = tol >= 0 && (0 until nCells).forall(k =>
        (0 until dims).forall(d =>
          math.abs(next(k)(d) - centroids(k)(d)) <= tol))
      for (k <- 0 until nCells; d <- 0 until dims)
        trajectory += ((it, k, fitted(k)._1, d, next(k)(d)))
      centroids = next
      it += 1
    }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    spark.createDataFrame(trajectory.result())
      .toDF("iter", "cell", "n", "dim", "m")
  }

  /** IVF with the index ON DISK: the assignment table is written
    * `partitionBy(cell)`, and a probe batch reads ONLY its probed
    * cells via parquet partition pruning — at 100 TB the serving read
    * is nProbe/nCells of the index, enforced by storage layout rather
    * than a runtime filter. Probe cells collect on the driver
    * (bounded by nCells) to prune statically. Same output as
    * [[ivfTopK]]; only the physical access path differs.
    */
  def ivfTopKPartitioned(corpus: DataFrame, queries: DataFrame, idCol: String,
                         vecCol: String, indexPath: String, k: Int,
                         nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val c = corpus.select(col(idCol).as("nn_id"),
      col(vecCol).cast("array<double>").as("cv")).repartition(par, col("nn_id"))
    val centroids = sampleCentroids(c, "nn_id", "cv", nCells)
    def nearestCells(vec: Column, take: Int): Column =
      graft.functions.GraftFunctions.topCells(vec, centroids, take)
    // repartition ON the cell before writing: one writer task per cell
    // (16 files, not tasks × cells small files) — the layout a serving
    // read wants anyway
    c.withColumn("cell", element_at(nearestCells(col("cv"), 1), 1).getField("cell"))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(indexPath)
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
      .withColumn("probe", explode(nearestCells(col("qv"), nProbe)))
      .select(col("query_id"), col("qv"), col("probe.cell").as("cell"))
    // bounded collect (≤ nCells values) → static partition pruning
    val probedCells = q.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val stored = spark.read.parquet(indexPath)
      .where(col("cell").isin(probedCells: _*))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("nn_id"))
    // broadcast the bounded probe side: the stored index streams its
    // pruned cells with no exchange (guide §3.1). CONTRACT (ADVICE r17
    // #5): the query batch is serving-batch sized; a batch whose
    // exploded probe side outgrows Spark's broadcast caps (8 GB / 512M
    // rows) fails the broadcast LOUDLY instead of silently shuffling
    // the corpus by cell — split the batch at the caller.
    stored.join(broadcast(q), Seq("cell"))
      .where(col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"), cosine(col("qv"), col("cv")).as("cosine"))
      .select(col("query_id"), col("nn_id"), col("cosine"), row_number().over(w).as("rank"))
      .where(col("rank") <= k)
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val c = corpus.select(col(idCol).as("nn_id"),
      col(vecCol).cast("array<double>").as("cv")).repartition(par, col("nn_id"))

    val centroids = sampleCentroids(c, "nn_id", "cv", nCells)

    // one TopCells pass per vector (cosine vs every centroid, ranked
    // desc, ties to the higher cell) — not an interpreted `transform`
    def nearestCells(vec: Column, take: Int): Column =
      graft.functions.GraftFunctions.topCells(vec, centroids, take)

    val assigned = c.withColumn("cell",
      element_at(nearestCells(col("cv"), 1), 1).getField("cell"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
      .withColumn("probe", explode(nearestCells(col("qv"), nProbe)))
      .select(col("query_id"), col("qv"), col("probe.cell").as("cell"))

    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("nn_id"))
    // broadcast the bounded probe side (queries × nProbe rows): the
    // assigned corpus streams with no exchange — at 100 TB the corpus
    // must never shuffle by cell for a probe batch (guide §3.1).
    // CONTRACT (ADVICE r17 #5): the query batch is serving-batch
    // sized; a batch past Spark's broadcast caps (8 GB / 512M rows)
    // fails the broadcast LOUDLY instead of silently shuffling the
    // corpus — split the batch at the caller.
    assigned.join(broadcast(q), Seq("cell"))
      .where(col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"), cosine(col("qv"), col("cv")).as("cosine"))
      .select(col("query_id"), col("nn_id"), col("cosine"), row_number().over(w).as("rank"))
      .where(col("rank") <= k)
  }

  /** Product quantization ANN — the MEMORY-bound scale path for
    * similarity search (IVF/LSH bound compute; PQ bounds bytes): each
    * vector compresses to nSub code bytes (64 doubles → 8 bytes at the
    * defaults), and query scoring never touches a raw corpus vector.
    *
    * Training is deterministic end to end so the whole pipeline is
    * DuckDB-replayable: seed codebooks from the md5-h16-sampled rows
    * (the [[sampleCentroids]] selection), one Lloyd step per subspace
    * (L2 assignment with (distance, code) tie order, per-dim means on
    * exact decimal sums — the [[kmeansStep]] arithmetic), then final
    * code assignment against the refined codebooks.
    *
    * ADC scoring is the canonical shape: a (query × sub × code)
    * distance LUT — nQueries·nSub·nCodes rows, BROADCAST — joins the
    * code table on (sub, code), so the big side streams once carrying
    * only its byte codes; per-(query, vector) distances micro-quantize
    * before the exact integer sum (ExactAgg convention, order-free).
    * L2² distances expand through the codegen [[dot]] identity
    * (‖a‖² − 2a·b + ‖b‖²) — no interpreted array folds.
    */
  def pqAdcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int, nSub: Int = 8, subDim: Int = 8,
                nCodes: Int = 16): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    val v = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v")).repartition(par, col("id"))
    // per-(vector, subspace) rows; checkpointed so the two assignment
    // passes and the mean recompute read ONE materialization. EAGER
    // (ADVICE r17 #3): esub is referenced multiple times inside its
    // first consuming action (assign(cb0) + the cb1 mean join + codes),
    // so a lazy checkpoint would recompute the explode subtree per
    // reference before its blocks cache — the edges/ore rule.
    val esub = v.select(col("id"), explode(array((0 until nSub).map(s =>
        struct(lit(s).as("sub"),
          slice(col("v"), s * subDim + 1, subDim).as("sv"))): _*)).as("x"))
      .select(col("id"), col("x.sub").as("sub"), col("x.sv").as("sv"))
      .localCheckpoint()
    // seed codebooks: the sampleCentroids rows, sliced per subspace
    val seeds = sampleCentroids(v, "id", "v", nCodes)
    val cb0 = seeds.zipWithIndex.flatMap { case (vec, code) =>
      (0 until nSub).map(s =>
        (s, code, vec.slice(s * subDim, (s + 1) * subDim).toSeq))
    }.toSeq.toDF("sub", "code", "cv")
    def d2(a: Column, b: Column): Column =
      dot(a, a) - lit(2) * dot(a, b) + dot(b, b)
    // nearest code per (vector, subspace): min(struct) = (d2, code)
    // lexicographic order — ties to the LOWEST code, partition-free
    def assign(cb: DataFrame): DataFrame =
      esub.join(broadcast(cb), "sub")
        .withColumn("d", d2(col("sv"), col("cv")))
        .groupBy(col("id"), col("sub"))
        .agg(min(struct(col("d"), col("code"))).as("m"))
        .select(col("id"), col("sub"), col("m.code").as("code"))
    // one Lloyd step: refined per-subspace centroids on exact sums
    val sums = (0 until subDim).map(d =>
      sum(round(element_at(col("sv"), d + 1), 6).cast("decimal(18,6)")).as(s"s$d"))
    val aggs = count(lit(1)).as("n") +: sums
    val cb1 = assign(cb0).join(esub, Seq("id", "sub"))
      .groupBy(col("sub"), col("code"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("sub"), col("code"),
        array((0 until subDim).map(d =>
          col(s"s$d").cast("double") / col("n")): _*).as("cv"))
      // EAGER (ADVICE r17 #3): cb1 is read twice inside the final
      // action (the codes assignment and the broadcast LUT) — the
      // double-reference rule again
      .localCheckpoint()
    val codes = assign(cb1)
    // ADC: broadcast LUT of (query, sub, code) micro distances
    val qsub = queries.select(col(idCol).as("qid"),
        col(vecCol).cast("array<double>").as("qv"))
      .select(col("qid"), explode(array((0 until nSub).map(s =>
        struct(lit(s).as("sub"),
          slice(col("qv"), s * subDim + 1, subDim).as("sv"))): _*)).as("x"))
      .select(col("qid"), col("x.sub").as("sub"), col("x.sv").as("sv"))
    val lut = qsub.join(broadcast(cb1), "sub")
      .withColumn("micro",
        round(d2(col("sv"), col("cv")) * lit(1e6), 0).cast("long"))
      .select(col("qid"), col("sub"), col("code"), col("micro"))
    val w = Window.partitionBy(col("qid")).orderBy(col("ms"), col("id"))
    codes.join(broadcast(lut), Seq("sub", "code"))
      .where(col("id") =!= col("qid"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("micro")).as("ms"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid").as("query_id"), col("id").as("nn_id"),
        round(col("ms") / lit(1e6), 6).as("adc_dist"), col("rank"))
  }

  /** IVF + PQ composed ANN — the production serving shape (faiss
    * IndexIVFPQ): the coarse quantizer bounds COMPUTE (only nProbe of
    * nCells cells are scored per query) and the residual product
    * quantizer bounds BYTES (each corpus vector stores cell id + nSub
    * code bytes; raw vectors are never touched at query time).
    *
    * Composition of the two already-oracled primitives, deterministic
    * end to end: coarse centroids are the [[sampleCentroids]] md5-h16
    * rows with [[graft.functions.TopCells]] cosine assignment (the
    * knn_ivf semantics), the PQ trains on RESIDUALS v − centroid(cell)
    * with the [[pqAdcTopK]] arithmetic (md5-seeded codebooks, one L2
    * Lloyd step with (distance, code) tie order, exact decimal-sum
    * means), and scoring joins the code table against a BROADCAST
    * (query × probed-cell × sub × code) LUT — per-cell LUTs because the
    * query residual differs per probed cell. Distances micro-quantize
    * before the exact integer per-candidate sum (ExactAgg convention),
    * so a second engine replays the full pipeline bit-for-bit.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int, nCells: Int = 16, nProbe: Int = 4,
                nSub: Int = 8, subDim: Int = 8, nCodes: Int = 16,
                dims: Int = 64): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    val v = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v")).repartition(par, col("id"))
      .localCheckpoint(eager = false)
    val n = v.count()
    val centroids = sampleCentroids(v, "id", "v", nCells, knownN = Some(n))
    val centLit = typedlit(centroids.map(_.toSeq).toSeq)
    def nearestCells(vec: Column, take: Int): Column =
      graft.functions.GraftFunctions.topCells(vec, centroids, take)
    // residual against the assigned cell's centroid: 64 codegen'd
    // subtractions, IEEE-exact on both engines (no transcendentals)
    def residual(vec: Column, cellCol: Column): Column = {
      val cv = element_at(centLit, cellCol + lit(1))
      array((0 until dims).map(d =>
        element_at(vec, d + 1) - element_at(cv, d + 1)): _*)
    }
    val res = v
      .withColumn("cell",
        element_at(nearestCells(col("v"), 1), 1).getField("cell"))
      .select(col("id"), col("cell"),
        residual(col("v"), col("cell")).as("rv"))
      .localCheckpoint(eager = false)
    // per-(vector, subspace) residual rows — the PQ training frame
    val rsub = res.select(col("id"), col("cell"),
        explode(array((0 until nSub).map(s =>
          struct(lit(s).as("sub"),
            slice(col("rv"), s * subDim + 1, subDim).as("sv"))): _*)).as("x"))
      .select(col("id"), col("cell"), col("x.sub").as("sub"), col("x.sv").as("sv"))
      .localCheckpoint(eager = false)
    // seed codebooks: the h16-sampled rem=1 rows' RESIDUALS, sliced per
    // sub (rem=1: disjoint from the rem=0 coarse-centroid rows, whose
    // residuals are exactly zero). res is 1:1 with v, so its row count
    // is the already-counted n — no second count job.
    val seeds = sampleCentroids(res, "id", "rv", nCodes, rem = 1L,
      knownN = Some(n))
    val cb0 = seeds.zipWithIndex.flatMap { case (vec, code) =>
      (0 until nSub).map(s =>
        (s, code, vec.slice(s * subDim, (s + 1) * subDim).toSeq))
    }.toSeq.toDF("sub", "code", "cv")
    def d2(a: Column, b: Column): Column =
      dot(a, a) - lit(2) * dot(a, b) + dot(b, b)
    def assign(cb: DataFrame): DataFrame =
      rsub.join(broadcast(cb), "sub")
        .withColumn("d", d2(col("sv"), col("cv")))
        .groupBy(col("id"), col("sub"))
        .agg(min(struct(col("d"), col("code"))).as("m"))
        .select(col("id"), col("sub"), col("m.code").as("code"))
    val sums = (0 until subDim).map(d =>
      sum(round(element_at(col("sv"), d + 1), 6).cast("decimal(18,6)")).as(s"s$d"))
    val aggs = count(lit(1)).as("n") +: sums
    val cb1 = assign(cb0).join(rsub.select("id", "sub", "sv"), Seq("id", "sub"))
      .groupBy(col("sub"), col("code"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("sub"), col("code"),
        array((0 until subDim).map(d =>
          col(s"s$d").cast("double") / col("n")): _*).as("cv"))
      .localCheckpoint(eager = false)
    // final code table keeps the cell: the ADC join is per probed cell
    val codes = assign(cb1)
      .join(res.select(col("id"), col("cell")), "id")
    // query side: probe nProbe cells; one residual (and so one LUT
    // block) PER probed cell
    val q = queries.select(col(idCol).as("qid"),
        col(vecCol).cast("array<double>").as("qv"))
      .withColumn("probe", explode(nearestCells(col("qv"), nProbe)))
      .select(col("qid"), col("probe.cell").as("cell"),
        residual(col("qv"), col("probe.cell")).as("rv"))
    val qsub = q.select(col("qid"), col("cell"),
        explode(array((0 until nSub).map(s =>
          struct(lit(s).as("sub"),
            slice(col("rv"), s * subDim + 1, subDim).as("sv"))): _*)).as("x"))
      .select(col("qid"), col("cell"), col("x.sub").as("sub"), col("x.sv").as("sv"))
    val lut = qsub.join(broadcast(cb1), "sub")
      .withColumn("micro",
        round(d2(col("sv"), col("cv")) * lit(1e6), 0).cast("long"))
      .select(col("qid"), col("cell"), col("sub"), col("code"), col("micro"))
    val w = Window.partitionBy(col("qid")).orderBy(col("ms"), col("id"))
    codes.join(broadcast(lut), Seq("cell", "sub", "code"))
      .where(col("id") =!= col("qid"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("micro")).as("ms"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid").as("query_id"), col("id").as("nn_id"),
        round(col("ms") / lit(1e6), 6).as("adc_dist"), col("rank"))
  }

  /** LSH-bucketed near-dup pairs — the scale path for
    * embedding-cosine dedup (the all-pairs [[cosinePairs]] is O(n²) and
    * exists only as an oracle/baseline). Band rows carry (id, tbl,
    * bucket) ONLY; vectors rejoin for the exact-cosine verify, so the
    * band shuffle never moves the embedding payload. At the configured
    * 16 tables x 4 bits, a pair AT cos = 0.9 (angle 26°) misses all 16
    * tables with probability ≈ 5e-6 — small, but PROBABILISTIC: recall
    * of pairs sitting near the threshold is not guaranteed, and at
    * large SF with many borderline pairs an exact compare against the
    * all-pairs result can differ. Checked fixtures should plant
    * duplicates well above threshold (near-identical vectors, miss
    * probability ≈ 0), as dedup_embedding's does.
    */
  /** md5-deterministic layered small-world graph — the HNSW-class
    * index tier above LSH/IVF/PQ (graph ANN is the industry-default
    * high-recall serving index; Malkov & Yashunin 2018). Construction
    * is the REPLAYABLE NSW variant: nodes shard by md5-h16 (shard =
    * h16 % nShards — at 100 TB nShards scales with the corpus so
    * shard SIZE stays fixed and per-shard build cost is bounded;
    * 4 here keeps the oracle's pairwise replay small), each node
    * links to its `m` nearest PREDECESSORS (id order — the classic
    * incremental-insertion neighbor rule made closed-form) within its
    * shard, edges symmetrize, and every node's degree caps at
    * `degreeCap` by cosine rank. Layer 1 is the sparse md5-sampled
    * subset (h16(md5("L:"+id)) % levelMod == 0 — the geometric level
    * draw, derandomized) wired the same way, giving beam search a
    * long-range entry layer. Every choice (shard, level, neighbor
    * rank, tie = lower id) is a pure function of ids and vectors, so
    * a SQL engine replays the whole graph — unlike true HNSW, whose
    * graph depends on insertion-time search paths no oracle can
    * follow. Distributed serving shape: shards ARE partitions (each
    * executor holds whole shards' adjacency), queries broadcast, and
    * the per-shard beams merge by cosine rank — SURVEY §4.
    *
    * Returns (level, src, dst).
    */
  def hnswBuild(corpus: DataFrame, idCol: String, vecCol: String,
                m: Int = 4, degreeCap: Int = 8, nShards: Int = 4,
                levelMod: Int = 8): DataFrame = {
    val h16 = conv(substring(md5(col("id").cast("string")), 1, 4), 16, 10)
      .cast("long")
    val hl = conv(substring(md5(concat(lit("L:"), col("id").cast("string"))),
      1, 4), 16, 10).cast("long")
    val b = corpus
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .select(col("id"), col("v"), norm(col("v")).as("nrm"),
        pmod(h16, lit(nShards)).as("shard"),
        when(pmod(hl, lit(levelMod)) === 0, 1).otherwise(0).as("lvl"))
      // co-locate each shard's pairwise work (the build's only shuffle)
      .repartition(math.max(nShards, 1), col("shard"))
    // (r18 A/B note: block-splitting the within-shard self-join — salt
    // the left side into 32 md5 blocks, replicate the right side per
    // block for join parallelism at nShards < cores — was measured NO
    // faster at sf0.1 (min-of-3 3.66 s vs 2.56 s for explode-symmetrize
    // alone): the per-src window sort of the 2M pair rows dominates and
    // is already exchange-parallel; the single-task pair JOIN is not
    // the bottleneck with the codegen DotProduct. Reverted; at scale
    // nShards itself supplies the join parallelism.)
    def levelEdges(nodes: DataFrame, level: Int): DataFrame = {
      val a = nodes.select(col("id"), col("v"), col("nrm"), col("shard"))
      val pairs = a.as("a").join(a.as("b"),
          col("a.shard") === col("b.shard") && col("b.id") < col("a.id"))
        .select(col("a.id").as("src"), col("b.id").as("dst"),
          (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cs"))
      val wSrc = Window.partitionBy(col("src")).orderBy(col("cs").desc, col("dst"))
      val fwd = pairs.withColumn("rn", row_number().over(wSrc))
        .where(col("rn") <= m).drop("rn")
      // symmetrize (fwd links point down-id, reversed links up-id — the
      // two sets are disjoint) then cap total degree by cosine rank.
      // EXPLODE, not unionAll (r18, guide §1.2/§4): a union of fwd with
      // its own reversal references the pairwise-window subtree twice,
      // and Spark re-executes it per branch — the build's one expensive
      // pass ran 2× per level. The 1→2 explode emits both directions
      // from a single execution of fwd; the row set is identical.
      val sym = fwd.select(explode(array(
          struct(col("src"), col("dst"), col("cs")),
          struct(col("dst").as("src"), col("src").as("dst"), col("cs"))))
          .as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"),
          col("e.cs").as("cs"))
      sym.withColumn("rn", row_number().over(wSrc)).where(col("rn") <= degreeCap)
        .select(lit(level).as("level"), col("src"), col("dst"))
    }
    levelEdges(b, 0).unionAll(levelEdges(b.where(col("lvl") === 1), 1))
  }

  /** Greedy beam search over the [[hnswBuild]] graph — HNSW search
    * with ef = beamWidth and a FIXED hop budget instead of a
    * visited-set convergence test, so the whole trajectory unrolls
    * into static SQL (the kmeansTrain fixed-T discipline): seed the
    * beam from `nEntry` md5-sampled entry nodes with PER-SHARD
    * fan-out — each query keeps its top beamWidth/nShards entries in
    * EVERY shard (edges never cross shards, so a shard no seed lands
    * in is unreachable; per-shard seeding is the distributed serving
    * contract that every partition's graph gets probed) — then run
    * `hops1` expand-and-prune rounds over the sparse layer-1 edges
    * (long hops toward the neighborhood) and `hops0` rounds over
    * layer 0 (local refinement); each round keeps the top `beamWidth`
    * of beam ∪ neighbors(beam) by (cosine desc, id) PER SHARD — every
    * shard runs its own ef=beamWidth search (a node's path can never
    * leave its shard, so a global prune would abandon whole shards
    * mid-search and strand the true neighbors living there), and the
    * per-shard beams merge by global cosine rank only at the end —
    * exactly the distributed serving contract (each executor searches
    * its local graphs at full beam, the driver merges top-k). Self is
    * excluded (the knn query≠neighbor convention), identically on
    * both engines. Per round: one small join beam⋈edges + one
    * re-score join against the corpus + one beamWidth window — beam
    * cardinality is queries×beamWidth throughout, queries broadcast.
    * Output (query_id, nn_id, cosine, rank), rank ≤ k.
    */
  /** `routeShards` (0 = off): serving-time SHARD ROUTING — the IVF
    * nProbe analog documented on [[autoShards]], finally measured
    * (VERDICT r15 #7). Each query ranks shards by their best
    * entry-point cosine (entries are the shard representatives — the
    * same role IVF centroids play) and seeds its beam ONLY in the top
    * `routeShards` shards; edges never cross shards, so restricting
    * the seed restricts the entire search and per-query cost drops
    * from nShards × beam to routeShards × beam. Recall is what the
    * routed fraction buys back — the `knn_hnsw_routed` bench row
    * reports it against brute-force truth per routed fraction.
    * Deterministic: shard rank = (best entry cosine desc, shard asc).
    */
  def hnswSearch(corpus: DataFrame, queries: DataFrame, edges: DataFrame,
                 idCol: String, vecCol: String, k: Int, beamWidth: Int = 8,
                 hops1: Int = 2, hops0: Int = 3, nEntry: Int = 16,
                 nShards: Int = 4, routeShards: Int = 0): DataFrame =
    hnswSearchPrepared(
      hnswPrepare(corpus, queries, edges, idCol, vecCol, nEntry, nShards),
      k, beamWidth, hops1, hops0, nShards, routeShards)

  /** The search's per-(corpus, queries, graph) setup, factored out so
    * a caller running SEVERAL searches over the same graph (the
    * knn_hnsw_routed recall curve: four routed fractions) prepares
    * once — one corpus materialization and ONE entry-point collect
    * instead of one per search (entries depend only on corpus and
    * nShards, never on routing).
    */
  private[graft] final case class HnswPrepared(
      c: DataFrame, q: DataFrame, ed: DataFrame,
      entries: Array[(Long, Seq[Double])])

  private[graft] def hnswPrepare(corpus: DataFrame, queries: DataFrame,
                                 edges: DataFrame, idCol: String,
                                 vecCol: String, nEntry: Int,
                                 nShards: Int): HnswPrepared = {
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    // LAZY checkpoints (r17): same lineage truncation + same one-time
    // materialization, but the materializing job is the FIRST consumer
    // instead of a dedicated job per checkpoint — at small SF the
    // search was pure job-floor (59 jobs for knn_hnsw, §12m
    // arithmetic), and the eager checkpoint jobs were most of them.
    val c = corpus.select(col(idCol).as("node"),
        col(vecCol).cast("array<double>").as("cv"))
      .select(col("node"), col("cv"), norm(col("cv")).as("nrm"))
      .repartition(par, col("node")).localCheckpoint(eager = false)
    val q = queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .select(col("query_id"), col("qv"), norm(col("qv")).as("qnrm"))
      .localCheckpoint(eager = false)
    // the graph is read once per hop: materialize it once — EAGER.
    // (r18 note: the explode-symmetrize removed hnswBuild's
    // double-reference, so lazy is now CORRECT too — but it was A/B'd:
    // folding the whole build into hop-1's job serialized the build
    // stages against the seed/beam stages and read slower with ~2×
    // the per-job stage count, the same nested-first-consumer lesson
    // as r17's per-hop lazy beam checkpoints. One dedicated job wins.)
    val ed = edges.localCheckpoint()
    // a node's shard is a pure function of its id — recomputed where
    // needed instead of carried through the beam
    val shardOfNode = pmod(conv(substring(md5(col("node").cast("string")),
      1, 4), 16, 10).cast("long"), lit(nShards))
    // deterministic entry points, selected PER SHARD with a hash
    // DECORRELATED from the shard hash (md5 of "E:"||id, vs shard =
    // md5(id)-h16 % nShards). The r15 form — h16 % (n/nEntry) == 0 on
    // the SAME h16 that assigns shards — seeded only the shards in
    // gcd(step, nShards) residue classes: at sf1 (n=20000, nEntry=80,
    // 10 shards) gcd = 10 put EVERY entry in shard 0, leaving 9 shard
    // graphs unreachable and recall@5 at 0.01 (r16 find; the 160/200
    // missing (query,shard) cells in the diag run were exactly the
    // unseeded shards). Per-shard rank by (entry-hash, id) guarantees
    // ⌈nEntry/nShards⌉ representatives in every shard at any (n,
    // nShards) — the coverage the per-shard fan-out contract assumed.
    val he = conv(substring(md5(concat(lit("E:"), col("node").cast("string"))),
      1, 4), 16, 10).cast("long")
    val perShardEntries = math.max(1, (nEntry + nShards - 1) / nShards)
    val wEnt = Window.partitionBy(col("shard")).orderBy(col("he"), col("node"))
    val entries = c.withColumn("shard", shardOfNode).withColumn("he", he)
      .withColumn("ern", row_number().over(wEnt))
      .where(col("ern") <= perShardEntries)
      .select(col("node"), col("cv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
    HnswPrepared(c, q, ed, entries)
  }

  // nEntry is deliberately NOT a parameter here (ADVICE r17 #4): entry
  // points are baked into HnswPrepared, so accepting one would invite
  // callers to believe a different value changes the search.
  private[graft] def hnswSearchPrepared(prep: HnswPrepared, k: Int,
                                        beamWidth: Int, hops1: Int,
                                        hops0: Int,
                                        nShards: Int,
                                        routeShards: Int): DataFrame =
    hnswSearchPreparedMulti(prep, k, beamWidth, hops1, hops0, nShards,
      Seq(routeShards)).drop("cfg")

  /** MULTIPLEXED hop loop (r18, VERDICT r17 #5): run SEVERAL routed
    * variants of the same search as ONE beam-search pass. Each beam row
    * carries `cfg` — the routeShards value it runs under (0 = routing
    * off) — and every window partition, dedup key and the final rank
    * include cfg, so each variant's trajectory is row-for-row identical
    * to a standalone [[hnswSearchPrepared]] run at that routeShards
    * (the windows order within a cfg exactly as before; other cfgs'
    * rows live in different partitions and can never affect a prune).
    * The payoff is structural: the hop loop's per-hop checkpoint job —
    * the search's serial floor — is paid ONCE for all variants instead
    * of once per variant (knn_hnsw_routed at sf1 runs 4 fractions ×
    * 8 hops = 32 serial checkpoint jobs today; multiplexed it is 8,
    * with 4× the — still tiny — beam cardinality per job).
    * The single-variant call (`cfgs = Seq(x)`) plans exactly the r17
    * shape modulo a constant cfg column; routing is skipped entirely
    * when no cfg routes, so the oracled knn_hnsw plan keeps its shape.
    * Output: (cfg, query_id, nn_id, cosine, rank), rank ≤ k.
    */
  private[graft] def hnswSearchPreparedMulti(prep: HnswPrepared, k: Int,
                                             beamWidth: Int, hops1: Int,
                                             hops0: Int,
                                             nShards: Int,
                                             cfgs: Seq[Int]): DataFrame = {
    require(cfgs.nonEmpty && cfgs.distinct.size == cfgs.size,
      s"cfgs must be non-empty and distinct, got $cfgs")
    val HnswPrepared(c, q, ed, entries) = prep
    val shardOfNode = pmod(conv(substring(md5(col("node").cast("string")),
      1, 4), 16, 10).cast("long"), lit(nShards))
    val wqs = Window.partitionBy(col("cfg"), col("query_id"), col("shard"))
      .orderBy(col("cs").desc, col("node"))
    // (r17 A/B note: broadcasting the bounded beam side into these
    // joins was measured SLOWER at sf0.1 — per-hop BroadcastExchange
    // barriers cost more than the tiny sort-merge exchanges they
    // replace — and was reverted; see OPTIMIZATION_r17.md.)
    // (r17 A/B note: fusing the dedup into an explicit node-keyed
    // repartition — "one exchange per hop" on paper — measured ~3×
    // SLOWER: pinning 32 partitions per hop defeats AQE's runtime
    // coalescing of these beam-sized exchanges, and that coalescing
    // is the dominant local win. Same lesson as the AQE-off A/B.)
    def prune(cand: DataFrame): DataFrame =
      cand.join(c, Seq("node"))
        .join(broadcast(q), Seq("query_id"))
        .select(col("cfg"), col("query_id"), col("node"),
          (dot(col("qv"), col("cv")) / (col("qnrm") * col("nrm"))).as("cs"))
        .withColumn("shard", shardOfNode)
        .withColumn("rn", row_number().over(wqs)).where(col("rn") <= beamWidth)
        .select(col("cfg"), col("query_id"), col("node"))
    // seed beam with PER-SHARD fan-out: explode the bounded entry
    // literal per query (nEntry rows — a broadcast-shaped constant,
    // no cartesian plan node), score, keep the top beamWidth/nShards
    // in EVERY shard so no shard's graph goes unprobed. The seeds are
    // scored ONCE, then replicated per cfg (explode of the bounded cfg
    // literal) — the entry dot products are cfg-independent.
    val perShard = math.max(1, beamWidth / nShards)
    val entryLit = typedLit(entries.toSeq) // array<struct<_1:bigint,_2:array<double>>>
    val seedShard = pmod(conv(substring(md5(col("node").cast("string")), 1, 4),
      16, 10).cast("long"), lit(nShards))
    val ws = Window.partitionBy(col("cfg"), col("query_id"), col("shard"))
      .orderBy(col("cs").desc, col("node"))
    val seeded = q.select(col("query_id"), col("qv"), col("qnrm"),
        explode(entryLit).as("en"))
      .select(col("query_id"), col("en._1").as("node"),
        (dot(col("qv"), col("en._2")) / (col("qnrm") * norm(col("en._2"))))
          .as("cs"))
      .where(col("node") =!= col("query_id"))
      .withColumn("shard", seedShard)
      .withColumn("cfg", explode(typedLit(cfgs)))
    // routing: keep only each (cfg, query)'s top-cfg shards by best
    // entry cosine (tie -> smaller shard id) before the per-shard
    // prune. cfg = 0 (or ≥ nShards) keeps every seeded shard — the
    // inner join against its own per-(query, shard) rollup preserves
    // the row set exactly — but when NO cfg routes the join is skipped
    // outright so the single-variant plan shape is unchanged.
    val routed =
      if (cfgs.exists(r => r > 0 && r < nShards)) {
        val wR = Window.partitionBy(col("cfg"), col("query_id"))
          .orderBy(col("best").desc, col("shard"))
        val picks = seeded.groupBy(col("cfg"), col("query_id"), col("shard"))
          .agg(max(col("cs")).as("best"))
          .withColumn("rs", row_number().over(wR))
          .where(col("rs") <= when(col("cfg") > 0, col("cfg"))
            .otherwise(lit(nShards)))
          .select(col("cfg"), col("query_id"), col("shard"))
        seeded.join(picks, Seq("cfg", "query_id", "shard"))
      } else seeded
    var beam = routed
      .withColumn("rn", row_number().over(ws)).where(col("rn") <= perShard)
      .select(col("cfg"), col("query_id"), col("node"))
    // (r17 A/B note: scoping AQE off for the hop loop — the
    // kmeansTrain device — was measured ~40% SLOWER here: AQE's
    // runtime coalescing of the beam-sized exchanges into few
    // partitions is worth more than the stage-job overhead it adds.)
    def hop(level: Int): Unit = {
      val lvlEdges = ed.where(col("level") === level)
        .select(col("src").as("node"), col("dst"))
      val grown = beam.unionAll(
          beam.join(lvlEdges, Seq("node")).select(col("cfg"),
            col("query_id"), col("dst").as("node")))
        .where(col("node") =!= col("query_id")).distinct()
      // pin the beam each hop: `grown` references it TWICE, so an
      // unpinned var doubles the logical plan per hop (2^hops plan
      // copies — a corpus-adaptive hop count hung outright at 13 hops,
      // and even the 5-hop default re-planned 32 scans). Values are
      // unchanged; beam cardinality is cfgs×queries×beamWidth — tiny.
      // eager: a lazy per-hop checkpoint chain was A/B'd slower (the
      // nested first-consumer materialization serializes worse than
      // one small job per hop)
      beam = prune(grown).localCheckpoint()
    }
    (1 to hops1).foreach(_ => hop(1))
    (1 to hops0).foreach(_ => hop(0))
    beam.join(c, Seq("node")).join(broadcast(q), Seq("query_id"))
      .select(col("cfg"), col("query_id"), col("node").as("nn_id"),
        (dot(col("qv"), col("cv")) / (col("qnrm") * col("nrm"))).as("cosine"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("cfg"), col("query_id"))
          .orderBy(col("cosine").desc, col("nn_id"))))
      .where(col("rank") <= k)
  }

  /** Corpus-adaptive LSH sizing (SURVEY §12j#2 made code — VERDICT r14
    * task #1): a FIXED (tables, bits) is quadratic under corpus growth
    * (expected bucket occupancy n/2^bits grows linearly, bucket-join
    * pairs quadratically — 545 s at sf1 for the 16×4 default sized for
    * n≈2k). The scale-correct configuration holds occupancy constant,
    *
    *   bits = ⌈log2(n / targetOccupancy)⌉,
    *
    * and raises `tables` in step so a pair at `simGrade` cosine still
    * collides in at least one table: per-bit sign-agreement
    * probability m = 1 − acos(simGrade)/π (Charikar 2002), per-table
    * collision m^bits, and tables solves
    * miss_all = (1 − m^bits)^tables ≤ missTarget. Candidate volume is
    * then ≈ n · targetOccupancy/2 · tables — linear in n up to the
    * log-growth of `tables`.
    *
    * `simGrade` is the similarity the index must catch RELIABLY — the
    * duplicate grade (≈0.99), not the exact-verify `threshold`: LSH
    * recall near the threshold itself is inherently probabilistic (see
    * [[lshCosinePairs]]'s contract), and sizing for guaranteed recall
    * AT 0.9 explodes `tables` faster than bits shrink buckets.
    */
  def autoLshParams(n: Long, simGrade: Double = 0.99,
                    targetOccupancy: Int = 64,
                    missTarget: Double = 1e-4,
                    maxTables: Int = 64): (Int, Int) = {
    require(simGrade > 0 && simGrade < 1, s"simGrade in (0,1): $simGrade")
    val m = 1.0 - math.acos(simGrade) / math.Pi
    def solveTables(bits: Int): Int = math.max(4, math.ceil(
      math.log(missTarget) / math.log1p(-math.pow(m, bits))).toInt)
    var bits = math.max(4, math.ceil(
      math.log(math.max(1.0, n.toDouble / targetOccupancy)) / math.log(2)).toInt)
    // tables budget: each extra bit multiplies the per-table collision
    // shortfall by 1/m, so at billion-row corpora with a low simGrade
    // the recall solve can out-grow any sane band count. Shed bits
    // (occupancy doubles per shed bit — a linear candidate-cost trade)
    // until the band count fits the budget; the floor of 4 bits is the
    // historical fixed config.
    while (bits > 4 && solveTables(bits) > maxTables) bits -= 1
    (math.min(maxTables, solveTables(bits)), bits)
  }

  /** Corpus-adaptive shard count for [[hnswBuild]] (VERDICT r14 task
    * #1): the per-shard neighbor rule is a shard² self-join, linear
    * overall ONLY if shard SIZE stays fixed — nShards = ⌈n /
    * targetShard⌉ bounds build cost at n · targetShard/2 pairwise
    * cosines. Search cost grows with nShards (every shard's graph is
    * probed — the distributed serving contract); a 100 TB deployment
    * routes queries to a shard subset the way IVF probes cells.
    */
  def autoShards(n: Long, targetShard: Int = 2048): Int =
    math.max(1, ((n + targetShard - 1) / targetShard).toInt)

  def lshCosinePairs(df: DataFrame, idCol: String, vecCol: String,
                     threshold: Double, tables: Int = 16, bits: Int = 4,
                     dims: Int = 64, seed: Long = 7L): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val v = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v")).repartition(par, col("id"))
    val withNorm = v.select(col("id"), col("v"), norm(col("v")).as("nrm"))
    val banded = v
      .select(col("id"), explode(lshBuckets(col("v"), tables, bits, dims, seed)).as("bk"))
      .select(col("id"), col("bk.tbl"), col("bk.bucket"))
    val cands = banded.as("a").join(banded.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    cands
      .join(withNorm.as("x"), col("id_a") === col("x.id"))
      .join(withNorm.as("y"), col("id_b") === col("y.id"))
      .select(col("id_a"), col("id_b"),
        (dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm"))).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** Bucket ids for ALL LSH tables — `bits` sign bits of hyperplane
    * dots per table — as one [[graft.functions.HyperplaneBuckets]]
    * pass (tables×bits separate dot expressions would each re-read the
    * vector).
    */
  def lshBuckets(vec: Column, tables: Int, bits: Int, dims: Int, seed: Long = 7L): Column =
    graft.functions.GraftFunctions.hyperplaneBuckets(
      vec, tables, bits, dims, planes(tables, bits, dims, seed))

  /** LSH-bucketed approximate top-k: candidates share a bucket in any
    * of `tables` hyperplane tables; exact cosine + window rank on the
    * (deduplicated) candidates. Recall grows with `tables`, cost with
    * bucket occupancy (~n / 2^bits per table).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, tables: Int = 16, bits: Int = 4, dims: Int = 64,
              seed: Long = 7L): DataFrame = {
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    def banded(df: DataFrame, idAs: String, vAs: String) =
      df.select(col(idCol).as(idAs), col(vecCol).cast("array<double>").as(vAs))
        .repartition(par, col(idAs))
        .select(col(idAs), col(vAs),
          explode(lshBuckets(col(vAs), tables, bits, dims, seed)).as("bk"))
        .select(col(idAs), col(vAs), col("bk.tbl"), col("bk.bucket"))
    val c = banded(corpus, "nn_id", "cv")
    val q = banded(queries, "query_id", "qv")
    // broadcast the bounded banded query side (queries × tables rows):
    // the banded corpus streams with no exchange (guide §3.1).
    // CONTRACT (ADVICE r17 #5): the query batch is serving-batch
    // sized; a batch past Spark's broadcast caps (8 GB / 512M rows)
    // fails the broadcast LOUDLY instead of silently shuffling the
    // corpus — split the batch at the caller.
    val cands = c.join(broadcast(q),
      c("tbl") === q("tbl") && c("bucket") === q("bucket") &&
        col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"), col("qv"), col("cv"))
      .dropDuplicates("query_id", "nn_id")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("nn_id"))
    cands.select(col("query_id"), col("nn_id"), cosine(col("qv"), col("cv")).as("cosine"))
      .select(col("query_id"), col("nn_id"), col("cosine"), row_number().over(w).as("rank"))
      .where(col("rank") <= k)
  }
}
