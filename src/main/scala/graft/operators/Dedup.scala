package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale text pipelines (SURVEY §2.3):
  * exact (hash groupBy), MinHash+LSH, SimHash+Hamming bands, and exact
  * blocked n-gram Jaccard.
  *
  * Scale design:
  *  - exact dedup: one groupBy on the content hash — balanced shuffle
  *    keys (md5), map-side partial min.
  *  - MinHash: signatures are pure column expressions (no shuffle);
  *    the LSH band join shuffles on (band, bandHash) — bounded bucket
  *    sizes make the candidate verify O(candidates), never O(n²).
  *  - SimHash: a one-pass signature expression (md5 word hashes —
  *    engine-portable, so the oracle replays it), then the same
  *    band-join pattern on 16-bit sub-signatures.
  */
object Dedup {

  /** Whitespace word shingles of `k` consecutive words, distinct —
    * the single-pass [[graft.functions.WordShingles]] expression.
    */
  def wordShingles(text: Column, k: Int): Column =
    graft.functions.GraftFunctions.wordShingles(text, k)

  /** Normalized text for near-exact dedup: lowercase, collapse
    * whitespace runs, trim.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Keep-first exact dedup: group on md5(keyExpr), survivor = min id.
    * Returns (idCol, content_hash).
    */
  def exact(df: DataFrame, idCol: String, keyExpr: Column): DataFrame =
    df.groupBy(md5(keyExpr).as("content_hash"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol), col("content_hash"))

  /** Base shingle hashes: xxhash64 reduced to 30 bits (so a*x in the
    * signature stays within a signed Long — ANSI mode throws on
    * overflow). Hash each shingle ONCE; the permutations reuse this
    * column.
    */
  def shingleHashes(shingles: Column): Column =
    transform(shingles, s => pmod(xxhash64(s), lit(1L << 30)))

  /** MinHash signature over pre-hashed shingles: sig_j =
    * min over h of (a_j*h + b_j) mod p — the codegen'd
    * [[graft.functions.MinHashSignature]] single-pass expression.
    */
  def minhashSignature(hashes: Column, numPerms: Int = 128, seed: Long = 42L): Column =
    graft.functions.GraftFunctions.minhashSignature(hashes, numPerms, seed)

  /** LSH band keys from a signature: `numBands` bands of
    * sig.length/numBands rows each; key = xxhash64 of the band slice
    * (xxhash64 hashes arrays natively). Explodes to one row per
    * (doc, band).
    */
  def lshBands(sig: Column, numBands: Int, numPerms: Int): Column = {
    val rows = numPerms / numBands
    array((0 until numBands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(slice(sig, b * rows + 1, rows)).as("band_hash"))
    }: _*)
  }

  /** Exact Jaccard of two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** MinHash+LSH near-dup pairs: shingle -> signature -> band buckets ->
    * bucket self-join (id_a < id_b) -> exact-Jaccard verify >= threshold.
    * Output: (id_a, id_b, jaccard).
    *
    * Run [[exact]] dedup FIRST at scale: identical documents all land
    * in the same band buckets, and a viral duplicate (one text x 1M
    * copies) makes that bucket's self-join quadratic. With exact dups
    * removed, bucket sizes are bounded by genuine near-dup cluster
    * sizes and the band join stays balanced.
    */
  def minhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numPerms: Int = 128, numBands: Int = 32,
      threshold: Double = 0.8, seed: Long = 42L): DataFrame = {
    // repartition BEFORE the expensive signature projection: small
    // parquet inputs arrive as one row-group partition, and signature
    // generation is the per-row hot spot. The exchange also stops
    // CollapseProject from inlining (= re-evaluating) the shingle
    // array into the signature expression.
    val par = df.sparkSession.sparkContext.defaultParallelism
    val sh = df.repartition(par, col(idCol))
      .select(col(idCol).as("id"),
        wordShingles(col(textCol), shingleK).as("sh"))
      .where(size(col("sh")) > 0)
    // hs and sig live in separate projections: each is expensive and
    // consumed many times downstream, so CollapseProject keeps them
    // materialized instead of inlining (SPARK-36718 cost check).
    // Band rows carry ONLY (id, band, hash) — shuffling the shingle
    // arrays through the 32-way band explode would move ~32x the
    // document payload; the arrays rejoin just for candidate verify.
    val banded = sh
      .select(col("id"), col("sh"), shingleHashes(col("sh")).as("hs"))
      .select(col("id"), minhashSignature(col("hs"), numPerms, seed).as("sig"))
      .select(col("id"), explode(lshBands(col("sig"), numBands, numPerms)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.band_hash"))
    val candIds = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    candIds
      .join(sh.as("sa"), col("id_a") === col("sa.id"))
      .join(sh.as("sb"), col("id_b") === col("sb.id"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("sa.sh"), col("sb.sh")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Band rows (id, band, band_hash, shard) for a corpus slice — the
    * persisted LSH index grain of the nightly-batch dedup. shard =
    * pmod(band_hash, nShards) is the index's parquet partition key:
    * a probe batch touches only the shards its own band hashes land
    * in, so the nightly read scales with the batch (static partition
    * pruning), not with the corpus. nShards defaults low (16) because
    * each shard is a parquet partition directory — small-file and
    * listing overhead grows with it (measured 2× end-to-end at 64 on
    * the sf0.1 fixture); a 100 TB index raises it so a shard stays a
    * few GB, the usual partition-sizing rule.
    */
  def bandRows(df: DataFrame, idCol: String, textCol: String,
               shingleK: Int = 3, numPerms: Int = 128, numBands: Int = 32,
               seed: Long = 42L, nShards: Int = 16): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    df.repartition(par, col(idCol))
      .select(col(idCol).as("id"),
        wordShingles(col(textCol), shingleK).as("sh"))
      .where(size(col("sh")) > 0)
      .select(col("id"), shingleHashes(col("sh")).as("hs"))
      .select(col("id"), minhashSignature(col("hs"), numPerms, seed).as("sig"))
      .select(col("id"), explode(lshBands(col("sig"), numBands, numPerms)).as("bk"))
      .select(col("id"), col("bk.band").as("band"),
        col("bk.band_hash").as("band_hash"),
        pmod(col("bk.band_hash"), lit(nShards.toLong)).cast("int").as("shard"))
  }

  /** Write the persisted MinHash band index for `df` at `path`,
    * partitioned by shard — the standing state an incremental dedup
    * probes. Repartition on the shard first: one writer task per
    * shard, not tasks × shards small files.
    */
  def bandIndexWrite(df: DataFrame, idCol: String, textCol: String,
                     path: String, shingleK: Int = 3, numPerms: Int = 128,
                     numBands: Int = 32, seed: Long = 42L,
                     nShards: Int = 16): Unit =
    bandRows(df, idCol, textCol, shingleK, numPerms, numBands, seed, nShards)
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** INCREMENTAL near-dup — the nightly-batch shape: dedup a NEW
    * batch against the persisted band index (and within itself)
    * without re-banding the base corpus.
    *
    *  1. Band rows for the new batch only.
    *  2. A bounded collect of its touched shards (≤ nShards values)
    *     statically prunes the index read to those parquet partitions.
    *  3. Candidates = (index ⋈ new bands on (shard, band, band_hash))
    *     ∪ (new ⋈ new, id_a < id_b); pairs orient as
    *     (least, greatest) so the output matches the full-recompute
    *     [[minhashPairs]] convention.
    *  4. Exact-Jaccard verify fetches shingles ONLY for candidate ids
    *     (the corpus joins on id BEFORE shingling — candidate-bounded
    *     compute, not O(corpus)).
    *  5. The new batch's band rows land at `deltaPath` (default
    *     `indexPath + "_delta"`) — the index append a nightly run
    *     would commit. Concurrent runs against the same index MUST
    *     pass distinct `deltaPath`s (e.g. a run-id suffix): the delta
    *     is written `mode=overwrite` and read back mid-query, so two
    *     runs sharing the default path would clobber each other.
    *
    * REQUIRES ids globally unique across `baseDf ∪ newDf`: a
    * re-crawled id present in both sides would duplicate its shingle
    * rows (garbling the exact-Jaccard verify) and pair a doc with its
    * own re-crawl. Dedup the corpus on id first (e.g. a
    * latest-by-key on crawl time) — the nightly contract is
    * "newDf is net-new ids"; DedupSpec pins the precondition.
    *
    * Output: (id_a, id_b, jaccard) with jaccard ≥ threshold —
    * identical to minhashPairs(base ∪ new) restricted to pairs that
    * touch a new doc (DedupSpec pins the equivalence; the driver
    * oracle replays it as exact Jaccard in SQL).
    */
  def incrementalMinhashPairs(
      newDf: DataFrame, baseDf: DataFrame, idCol: String, textCol: String,
      indexPath: String, shingleK: Int = 3, numPerms: Int = 128,
      numBands: Int = 32, threshold: Double = 0.8, seed: Long = 42L,
      nShards: Int = 16, deltaPath: String = ""): DataFrame = {
    val spark = newDf.sparkSession
    val delta = if (deltaPath.nonEmpty) deltaPath else indexPath + "_delta"
    // the nightly index delta: what a real run appends to the index.
    // Written FIRST and read back as the probe side, so the signature
    // projection runs ONCE — the shard collect and both candidate
    // joins rescan the materialized parquet instead of re-banding
    bandRows(newDf, idCol, textCol, shingleK, numPerms, numBands, seed,
      nShards)
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard")
      .parquet(delta)
    val bandedNew = spark.read.parquet(delta)
    // bounded collect (≤ nShards values) → static partition pruning
    val touched = bandedNew.select(col("shard")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val index = spark.read.parquet(indexPath)
      .where(col("shard").isin(touched: _*))
    val cross = index.as("i").join(bandedNew.as("n"),
        col("i.shard") === col("n.shard") &&
          col("i.band") === col("n.band") &&
          col("i.band_hash") === col("n.band_hash") &&
          col("i.id") =!= col("n.id"))
      .select(least(col("i.id"), col("n.id")).as("id_a"),
        greatest(col("i.id"), col("n.id")).as("id_b"))
    val within = bandedNew.as("a").join(bandedNew.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val cands = cross.unionAll(within).dropDuplicates("id_a", "id_b")
    // exact-verify shingles for candidate ids only: join on id FIRST,
    // then shingle — the corpus fetch is candidate-bounded
    val candIds = cands
      .select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
    val corpus = baseDf.select(col(idCol).as("id"), col(textCol).as("text"))
      .unionAll(newDf.select(col(idCol).as("id"), col(textCol).as("text")))
    val candSh = corpus.join(candIds, Seq("id"))
      .select(col("id"), wordShingles(col("text"), shingleK).as("sh"))
    cands
      .join(candSh.as("sa"), col("id_a") === col("sa.id"))
      .join(candSh.as("sb"), col("id_b") === col("sb.id"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("sa.sh"), col("sb.sh")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Cross-corpus SENTENCE dedup with document reconstruction — the
    * Dolma-style stage between URL dedup and near-dup: split each doc
    * on `sep`, keep each distinct sentence only at its FIRST
    * occurrence ((doc, pos)-min over the corpus — boilerplate
    * "subscribe now" lines survive once), and reassemble every doc
    * from its kept sentences in original order. The winner per
    * sentence is `groupBy(s).agg(min(struct(id, pos)))` — a map-side
    * combinable aggregate, so corpus-wide boilerplate (a maximally hot
    * sentence key) costs each task one running min, never a skewed
    * sort/buffer of every occurrence the way a sentence-partitioned
    * row_number window would. Winners join back on (s, id, pos)
    * (winners are unique per sentence, so the inner join IS a
    * semi-join), then one doc-grain rollup; no self-join, no
    * all-pairs. Returns (id, n_sents, n_kept, cleaned).
    */
  def sentenceDedup(df: DataFrame, idCol: String, textCol: String,
                    sep: String = "\\. ", joiner: String = ". "): DataFrame = {
    val p = df
      .select(col(idCol).as("id"),
        posexplode(split(col(textCol), sep)).as(Seq("pos0", "s")))
      .select(col("id"), (col("pos0") + 1).as("pos"), col("s"))
    val winners = p.groupBy(col("s"))
      .agg(min(struct(col("id"), col("pos"))).as("w"))
      .select(col("s"), col("w.id").as("id"), col("w.pos").as("pos"))
    // dropDuplicates before the join-back: a doc ingested twice under
    // one id yields identical (id, pos, s) rows, and joining BOTH
    // against the unique winner would double n_kept and duplicate
    // sentences in `cleaned` (the row_number formulation kept exactly
    // one; n_sents still counts the raw rows, matching it there too)
    val kept = p.dropDuplicates("id", "pos", "s")
      .join(winners, Seq("s", "id", "pos"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(joiner,
          transform(array_sort(collect_list(struct(col("pos"), col("s")))),
            x => x.getField("s"))).as("cleaned"))
    p.groupBy(col("id")).agg(count(lit(1)).as("n_sents"))
      .join(kept, Seq("id"), "left")
      .select(col("id"), col("n_sents"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  /** Exact blocked n-gram Jaccard: explode shingles, self-join within
    * `blockCols` on the shingle (never a cross join), count
    * intersections, derive Jaccard from fitted set sizes.
    */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], shingleK: Int, threshold: Double): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val sh = df.repartition(par, col(idCol))
      .select(col(idCol).as("id") +: blockCols.map(col) :+
        wordShingles(col(textCol), shingleK).as("sh"): _*)
    val sizes = sh.select(col("id"), size(col("sh")).as("n"))
    val exploded = sh.select(col("id") +: blockCols.map(col) :+
      explode(col("sh")).as("s"): _*)
    val joinCond = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .foldLeft(col("a.s") === col("b.s") && col("a.id") < col("b.id"))(_ && _)
    val inter = exploded.as("a").join(exploded.as("b"), joinCond)
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("id_a") === col("sa.id"))
      .join(sizes.as("sb"), col("id_b") === col("sb.id"))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") /
          (col("sa.n") + col("sb.n") - col("inter"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** n-gram CONTAINMENT pairs — the asymmetric sibling of
    * [[ngramJaccardPairs]]: C(A→B) = |A∩B| / |A|, the signal that
    * catches a document wholly CONTAINED in a larger one (quote
    * farms, boilerplate wrappers, truncated re-crawls), which
    * symmetric Jaccard under-scores as the size ratio grows. Emits
    * the ordered pair once with both directions' scores; keeps pairs
    * where EITHER direction clears the threshold. Same shuffle shape
    * as the Jaccard pairs: shingle explode → blocked equi-join on the
    * shingle → per-pair intersection count → size join.
    */
  def ngramContainmentPairs(
      df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], shingleK: Int, threshold: Double): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val sh = df.repartition(par, col(idCol))
      .select(col(idCol).as("id") +: blockCols.map(col) :+
        wordShingles(col(textCol), shingleK).as("sh"): _*)
    val sizes = sh.select(col("id"), size(col("sh")).as("n"))
    val exploded = sh.select(col("id") +: blockCols.map(col) :+
      explode(col("sh")).as("s"): _*)
    val joinCond = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .foldLeft(col("a.s") === col("b.s") && col("a.id") < col("b.id"))(_ && _)
    val inter = exploded.as("a").join(exploded.as("b"), joinCond)
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("id_a") === col("sa.id"))
      .join(sizes.as("sb"), col("id_b") === col("sb.id"))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") / col("sa.n")).as("contain_a"),
        (col("inter").cast("double") / col("sb.n")).as("contain_b"))
      .where(col("contain_a") >= threshold || col("contain_b") >= threshold)
  }

  /** Connected components over near-dup pairs: min-label propagation
    * with pointer doubling (each node adopts the min label among itself
    * and its neighbors, then chases label→label-of-label), so deep dup
    * chains converge in O(log diameter) rounds, not O(diameter).
    *
    * Scale notes: `localCheckpoint` per iteration materializes the
    * labels and TRUNCATES lineage — without it the plan doubles every
    * round and at 100× scale the re-analyzed/re-optimized plan tree
    * dominates. Non-convergence RAISES: a silently-truncated propagation
    * returns canonical ids that look valid but split real components.
    * Returns (id, canonical).
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
                          driverThreshold: Long = 1L * 1000 * 1000): DataFrame = {
    // ONE materialization of the (expensive) upstream pair plan,
    // BEFORE the both-directions union: a union of two selects over
    // the raw plan computes the whole pair DAG twice in one job (the
    // branches share no blocks), which doubled dedup_clusters'
    // minhash cost end to end. Checkpoint the directed pairs once;
    // the doubled edge view then reads executor-local blocks.
    val p0 = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
      .localCheckpoint(eager = false) // materialized by the count below
    val edges = p0.unionAll(p0.select(col("b").as("a"), col("a").as("b")))
    // Adaptive small-graph fast path: a dedup-pair graph is usually
    // TINY relative to the corpus (near-dup pairs, not documents). When
    // the edge list fits comfortably on the driver, a union-find there
    // beats launching 3+ distributed jobs per label-propagation round —
    // the same runtime-adaptivity AQE applies to join strategies. The
    // distributed loop below remains the path for genuinely large pair
    // graphs. The 1M default is a BYTE budget, not a row count: the fast
    // path collects only the DIRECTED pairs (half the doubled edge view),
    // so at the threshold it holds ≤ 500k (Long, Long) pairs (~48B boxed
    // each ≈ 25MB), safe on a default 1-4GB driver with headroom.
    val longIds = p0.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    // count (and, on the fast path, collect) the DIRECTED pairs — half
    // the doubled edge list's rows for the same information
    val pairCount = p0.count()
    // divide the threshold rather than doubling the count: immune to
    // int64 overflow for any caller-supplied threshold
    if (longIds && pairCount <= driverThreshold / 2) return driverSideCC(p0)
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // each node adopts the min label among itself and its neighbors;
      // the self row carries the old label so convergence needs no
      // extra join — just a filter on the aggregated frame
      val msgs = edges.join(labels, edges("b") === labels("id"))
        .select(col("a").as("id"), col("label"), lit(false).as("self"))
        .unionAll(labels.withColumn("self", lit(true)))
      val mins = msgs.groupBy("id").agg(
        min("label").as("label"),
        max(when(col("self"), col("label"))).as("old"))
      // pointer doubling: follow the adopted label's own label, halving
      // the remaining chain depth every round
      val next = mins.as("x")
        .join(labels.as("l"), col("x.label") === col("l.id"), "left")
        .select(col("x.id"),
          least(col("x.label"), coalesce(col("l.label"), col("x.label"))).as("label"),
          col("x.old"))
        .localCheckpoint()
      val changed = next.where(col("label") < col("old")).limit(1).count()
      labels = next.select("id", "label")
      converged = changed == 0
      iter += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIter iterations " +
        "(component diameter too large — raise maxIter)")
    labels.select(col("id"), col("label").as("canonical"))
  }

  /** Driver-side union-find over a collected edge list (the adaptive
    * small-graph path of [[connectedComponents]]): path-halving find +
    * union-by-min so every root is its component's minimum id.
    */
  private def driverSideCC(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // collect PRIMITIVE pairs, not Rows — a GenericRow costs hundreds
    // of bytes; the driverThreshold byte budget assumes tuple encoding.
    // Input is the DIRECTED pair list (union-find is direction-blind,
    // so the doubled edge view would only double the collect).
    val pairs = edges.select(col("a").cast("long").as("_1"),
      col("b").cast("long").as("_2")).as[(Long, Long)].collect()
    val parent = new java.util.HashMap[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrDefault(x, x)
      while (p != x) {
        val gp = parent.getOrDefault(p, p)
        parent.put(x, gp) // path halving
        x = gp
        p = parent.getOrDefault(x, x)
      }
      x
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    // nodes from BOTH endpoints (the directed list names each node on
    // whichever side its pairs happen to order it)
    val nodes = (pairs.iterator.map(_._1) ++ pairs.iterator.map(_._2))
      .toArray.distinct
    nodes.map(n => (n, find(n))).toSeq.toDF("id", "canonical")
  }

  /** SimHash as 4 x 16-bit band values (avoids 64-bit sign overflow,
    * bands double as the LSH keys) — the one-pass
    * [[graft.functions.SimHashBands]] expression: a narrow projection,
    * no explode/groupBy shuffle at any scale.
    */
  def simhashBands(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    df.select(col(idCol).as("id"), col(textCol))
      .repartition(par, col("id"))
      .select(col("id"),
        graft.functions.GraftFunctions.simhashBands(col(textCol)).as("sig"))
      // wordless docs have no signature (null) — they must not pair up
      .where(col("sig").isNotNull)
      .select(col("id") +: (0 until 4).map(b =>
        element_at(col("sig"), b + 1).as(s"band$b")): _*)
  }

  /** Hamming distance between two simhash band quadruples. */
  def hammingDist(aBands: Seq[Column], bBands: Seq[Column]): Column =
    aBands.zip(bBands).map { case (a, b) => bit_count(a.bitwiseXOR(b)) }
      .reduce(_ + _)

  /** SimHash near-dup pairs: candidates share at least one 16-bit band
    * value; verified by full Hamming distance <= maxHamming.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sigs = simhashBands(df, idCol, textCol)
    val bandCols = (0 until 4).map(b => s"band$b")
    val banded = sigs.select(col("id") +: bandCols.map(col) :+
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"), col(s"band$b").as("bv"))): _*)).as("bk"): _*)
      .select(col("id") +: bandCols.map(col) :+ col("bk.band") :+ col("bk.bv"): _*)
    val joined = banded.as("a").join(banded.as("b"),
      col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hammingDist(bandCols.map(c => col(s"a.$c")), bandCols.map(c => col(s"b.$c")))
          .as("hamming"))
      .dropDuplicates("id_a", "id_b")
    joined.where(col("hamming") <= maxHamming)
  }

  /** Blocked Levenshtein near-dup pairs — record-linkage-style fuzzy
    * entity matching (the edit-distance complement of the token-set
    * Jaccard/containment family: catches character-level typos and
    * truncations that leave most token sets intact).
    *
    * Scale contract: candidates come ONLY from an equi-join on the
    * blocking key (structured fields such as (name, brand) — the
    * standard record-linkage move), so pair generation is a balanced
    * hash shuffle whose cost is Σ block², never a corpus cross join;
    * `levenshtein` (codegen'd, O(len²) per pair) runs on candidates
    * only. Production recall across blocking misses comes from
    * UNIONing several passes with different keys — the caller picks
    * the keys, this operator is one pass. `df` must carry `idCol`
    * (unique), `nameCol`, and the block columns.
    */
  def blockedEditDistancePairs(df: DataFrame, idCol: String, nameCol: String,
                               blockCols: Seq[String], maxDist: Int): DataFrame = {
    val lev = levenshtein(col(s"a.$nameCol"), col(s"b.$nameCol"))
    if (maxDist == 1) {
      // FastSS deletion-neighborhood join (Bocek et al. 2007; the
      // SymSpell device): dist(a,b) <= 1 implies a and b share a
      // string in {x} ∪ deletions1(x) — equality (share x), one
      // deletion (the shorter IS a deletion of the longer), one
      // substitution at i (deleting i from both sides agrees). So the
      // candidate join keys on (block, variant) and its bucket sizes
      // track the TRUE near-match density, not block size: under
      // duplicate densification Σ block² explodes quadratically
      // (er_golden_record 154 s at sf1 — VERDICT r14 #5) while the
      // variant buckets stay small and candidates stay ∝ output.
      // Junk variants from degenerate (empty) names only ever ADD
      // candidates; the exact levenshtein verify removes them, so the
      // result set is identical to the naive block join's. The
      // null-block filter keeps it identical under NULLs too: struct
      // equality treats NULL fields as equal while the naive path's
      // per-column === never matches a NULL, so rows with a NULL
      // block column must not pair here either (r15 advisory).
      val name = col(nameCol)
      val variants = array_union(
        array(name),
        transform(sequence(lit(1), greatest(length(name), lit(1))), i =>
          concat(name.substr(lit(1), i - lit(1)),
            name.substr(i + lit(1), length(name)))))
      // repartition BEFORE the variant explode (the minhashPairs
      // discipline): the testdata tables are single-row-group parquet,
      // so the |name|-way deletion-neighborhood expansion would
      // otherwise run inside a 1-task scan stage
      val par = df.sparkSession.sparkContext.defaultParallelism
      val v = df
        .where(blockCols.map(col(_).isNotNull).reduce(_ && _))
        .repartition(par, col(idCol))
        .select(col(idCol).as("vid"),
          struct(blockCols.map(col): _*).as("blk"),
          explode(variants).as("vr"))
      val cands = v.as("x").join(v.as("y"),
          col("x.blk") === col("y.blk") && col("x.vr") === col("y.vr") &&
            col("x.vid") < col("y.vid"))
        .select(col("x.vid").as("id_a"), col("y.vid").as("id_b"))
        .dropDuplicates("id_a", "id_b")
      val named = df.select(col(idCol), col(nameCol))
      cands
        .join(named.as("a"), col("id_a") === col(s"a.$idCol"))
        .join(named.as("b"), col("id_b") === col(s"b.$idCol"))
        .where(lev <= maxDist)
        .select(col("id_a"), col("id_b"), lev.cast("long").as("dist"))
    } else {
      // general maxDist: length-banded sub-blocking — a pair at edit
      // distance <= maxDist has |len(a) − len(b)| <= maxDist, so with
      // bands of width maxDist+1 the match lives in the b-band or an
      // adjacent one. The a-side explodes into its 3 candidate bands
      // (each true pair matches exactly once: b carries ONE band), so
      // Σ block² becomes Σ (block ∩ band)² — bounded by name-length
      // spread instead of raw block density — and the result set is
      // unchanged.
      val w = maxDist + 1
      val aSide = df.select(col("*"),
        explode(sequence((length(col(nameCol)) / w).cast("int") - lit(1),
          (length(col(nameCol)) / w).cast("int") + lit(1))).as("cand_band"))
        .alias("a")
      val bSide = df.select(col("*"),
        (length(col(nameCol)) / w).cast("int").as("band")).alias("b")
      val block = blockCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _)
      aSide.join(bSide, block && col("a.cand_band") === col("b.band") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
        .where(abs(length(col(s"a.$nameCol")) - length(col(s"b.$nameCol"))) <= maxDist)
        .where(lev <= maxDist)
        .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
          lev.cast("long").as("dist"))
    }
  }
}
