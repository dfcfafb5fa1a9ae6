package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for graft's numeric hot paths.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`,
  * `transform` + `array_min`) evaluate INTERPRETED with per-element
  * boxing — measured 10-100x slower than these whole-stage-codegen
  * loops over primitive `ArrayData` on the dedup/ANN benchmarks.
  */

/** Σ a(i)*b(i) over two double arrays — one codegen'd loop, no
  * intermediate array, no boxing. Null if either side is null;
  * truncates to the shorter length.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // fail at analysis time rather than reading non-double array data
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })
    if (ok) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName requires array<double> arguments, " +
      s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names: the block may be inlined several times per method
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object MinHash {
  /** 2^61 - 1; (a*h + b) mod p stays positive within a signed Long for
    * a < 2^32, h < 2^30, b < p.
    */
  val MersennePrime: Long = (1L << 61) - 1

  /** Seeded permutation coefficients — the single source of truth for
    * both the expression and any re-implementation.
    */
  def coeffs(numPerms: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val pairs = Seq.fill(numPerms)((
      math.abs(rnd.nextLong()) % (MersennePrime - 1) + 1,
      math.abs(rnd.nextLong()) % MersennePrime))
    (pairs.map(p => p._1 % (1L << 32)).toArray, pairs.map(_._2).toArray)
  }
}

/** Full MinHash signature in ONE pass over the pre-hashed shingle
  * array: for each element h, update all `numPerms` running minima of
  * (a_j*h + b_j) mod p. Replaces `numPerms` separate
  * `array_min(transform(...))` traversals (interpreted, boxed) with a
  * single codegen'd nested loop over primitive longs.
  */
case class MinHashSignature(child: Expression, numPerms: Int, seed: Long)
    extends UnaryExpression {

  private lazy val (as, bs) = MinHash.coeffs(numPerms, seed)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckSuccess
      case dt => TypeCheckFailure(
        s"$prettyName requires array<bigint> input, got ${dt.simpleString}")
    }
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < numPerms) {
        val x = (as(j) * h + bs(j)) % MinHash.MersennePrime
        if (x < mins(j)) mins(j) = x
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val h = ctx.freshName("h")
      val x = ctx.freshName("x")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |int $n = $c.numElements();
         |long[] $mins = new long[$numPerms];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < $numPerms; $j++) {
         |    long $x = ($asRef[$j] * $h + $bsRef[$j]) % ${MinHash.MersennePrime}L;
         |    if ($x < $mins[$j]) $mins[$j] = $x;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Distinct word k-gram shingles in ONE pass: split on single spaces
  * (same Java-regex path as Spark's `split`), join k consecutive words,
  * first-occurrence-distinct — semantically identical to
  * `array_distinct(transform(sequence(...), concat_ws(" ", ...)))`
  * but without per-shingle expression interpretation.
  * CodegenFallback: the eval body is already a tight loop; only the
  * per-ROW dispatch is interpreted.
  */
case class WordShingles(child: Expression, k: Int, distinct: Boolean = true)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(k >= 1)
  private val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val words = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].split(space, -1)
    val n = words.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    // distinct=true: shingle SET (dedup/minhash); distinct=false: every
    // occurrence in order (n-gram LM counting)
    val out: java.util.Collection[org.apache.spark.unsafe.types.UTF8String] =
      if (distinct) new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
      else new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String](n - k + 1)
    var i = 0
    while (i <= n - k) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = words(i + j); j += 1 }
      out.add(org.apache.spark.unsafe.types.UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** 64-bit SimHash of the whitespace words of a document, emitted as
  * 4 x 16-bit band values (the LSH keys): per word occurrence w, band b
  * takes the 16-bit value of hex chars [4b, 4b+4) of md5(w); bit r
  * contributes +1 if set else -1 (term-frequency weighted); the band's
  * bit is set iff its sum >= 0. One narrow pass per row — no explode,
  * no shuffle.
  *
  * md5 (not xxhash64) is deliberate: every SQL engine computes the
  * identical digest, so an external oracle can replay signature, band
  * join, and Hamming verification exactly (see DedupQueries).
  */
case class SimHashBands(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  private val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_simhash"

  // a wordless doc has NO signature (null), never the all-ones bands a
  // 0>=0 vote would produce — empty docs must not bucket-join with each
  // other (and SQL oracles' token CTEs drop them naturally)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val words = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].split(space, -1)
    val counts = new Array[Int](64)
    val md = SimHashBands.md5()
    var nWords = 0
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.numBytes() > 0) {
        nWords += 1
        md.reset()
        val h = md.digest(w.getBytes)
        var b = 0
        while (b < 4) {
          // hex chars [4b, 4b+4) of the digest = bytes 2b, 2b+1
          val v16 = ((h(2 * b) & 0xff) << 8) | (h(2 * b + 1) & 0xff)
          var r = 0
          while (r < 16) {
            if (((v16 >>> r) & 1) == 1) counts(b * 16 + r) += 1
            else counts(b * 16 + r) -= 1
            r += 1
          }
          b += 1
        }
      }
      i += 1
    }
    if (nWords == 0) return null
    val bands = new Array[Long](4)
    var b = 0
    while (b < 4) {
      var value = 0L
      var r = 0
      while (r < 16) {
        if (counts(b * 16 + r) >= 0) value |= (1L << r)
        r += 1
      }
      bands(b) = value
      b += 1
    }
    new GenericArrayData(bands)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashBands =
    copy(child = newChild)
}

object SimHashBands {
  /** MD5 instances are stateful and not thread-safe — one per task thread. */
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private[functions] def md5(): java.security.MessageDigest = digest.get()
}

/** Mean word length: sum of token char counts / max(token count, 1),
  * tokens = regex-\s+ split of the space-trimmed text (identical to
  * `aggregate(split(trim(text),"\\s+"), ...) / greatest(size, 1)`, which
  * evaluates interpreted with per-element boxing). One pass per row.
  */
case class MeanWordLen(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_mean_word_len"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName requires a string input")
  }

  override def nullSafeEval(v: Any): Any = {
    val words = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .trim().toString.split("\\s+", -1)
    var total = 0L
    var i = 0
    while (i < words.length) {
      total += words(i).codePointCount(0, words(i).length)
      i += 1
    }
    total.toDouble / math.max(words.length, 1)
  }

  override protected def withNewChildInternal(newChild: Expression): MeanWordLen =
    copy(child = newChild)
}

/** Fraction of whitespace tokens of lower(trim(text)) that fall in a
  * fixed marker set (stopword ratio, language-marker score). Replaces
  * `size(filter(words, isin(...)))/greatest(size(words),1)` — the
  * interpreted-HOF formulation. One pass, set lookups via a HashSet.
  */
case class MarkerRatio(child: Expression, markers: Seq[String])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  private val set = markers.toSet

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_marker_ratio"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName requires a string input")
  }

  override def nullSafeEval(v: Any): Any = {
    val words = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toLowerCase.trim().toString.split("\\s+", -1)
    var hits = 0
    var i = 0
    while (i < words.length) {
      if (set.contains(words(i))) hits += 1
      i += 1
    }
    hits.toDouble / math.max(words.length, 1)
  }

  override protected def withNewChildInternal(newChild: Expression): MarkerRatio =
    copy(child = newChild)
}

/** Marker-stopword language ID in ONE pass: tokenize lower(trim(text))
  * once, count hits per language marker set, return the arg-max
  * (first language in declaration order wins ties) as
  * struct(lang, score). Equivalent to the greatest+when-chain over
  * per-language MarkerRatio columns but tokenizes once, not |langs|
  * times.
  */
case class LangIdExpr(child: Expression, langs: Seq[(String, Seq[String])])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  private val sets = langs.map { case (_, ms) => ms.toSet }.toArray
  private val codes = langs.map(_._1).toArray

  override def dataType: DataType = StructType(Seq(
    StructField("lang", StringType, nullable = false),
    StructField("score", DoubleType, nullable = false)))
  override def prettyName: String = "graft_langid"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName requires a string input")
  }

  override def nullSafeEval(v: Any): Any = {
    val words = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toLowerCase.trim().toString.split("\\s+", -1)
    val hits = new Array[Int](sets.length)
    var i = 0
    while (i < words.length) {
      var l = 0
      while (l < sets.length) {
        if (sets(l).contains(words(i))) hits(l) += 1
        l += 1
      }
      i += 1
    }
    val n = math.max(words.length, 1).toDouble
    var best = 0
    var l = 1
    while (l < hits.length) {
      if (hits(l) > hits(best)) best = l // strict: first max wins ties
      l += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString(codes(best)),
      hits(best) / n)
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

/** Winnowing fingerprint count (Schleimer et al., MOSS) in ONE pass:
  * md5 each char k-gram, per window of `w` consecutive grams keep the
  * lexicographic-min hex digest, count distinct selections. Replaces
  * the nested transform/array_min/slice formulation (interpreted, one
  * md5 Expression eval per char position). Hex-lexicographic min ==
  * unsigned-byte-lexicographic min on the raw digest.
  */
case class WinnowCountExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(k >= 1 && w >= 1)

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_winnow_count"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName requires a string input")
  }

  private def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val cps = s.codePoints().toArray
    val nGrams = cps.length - (k - 1)
    if (nGrams <= 0) return 0
    val md = SimHashBands.md5()
    val grams = new Array[Array[Byte]](nGrams)
    var i = 0
    while (i < nGrams) {
      md.reset()
      grams(i) = md.digest(
        new String(cps, i, k).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    val nWindows = math.max(nGrams - (w - 1), 1)
    val seen = new java.util.HashSet[java.nio.ByteBuffer]()
    i = 0
    while (i < nWindows) {
      var min = grams(i)
      var j = i + 1
      val end = math.min(i + w, nGrams)
      while (j < end) {
        if (lessThan(grams(j), min)) min = grams(j)
        j += 1
      }
      seen.add(java.nio.ByteBuffer.wrap(min))
      i += 1
    }
    seen.size()
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowCountExpr =
    copy(child = newChild)
}

/** All LSH hyperplane buckets in ONE pass over the vector: for table t,
  * bucket = Σ_j [dot(plane_{t,j}, v) >= 0] << j, emitted as
  * array<struct<tbl,bucket>> ready to explode. Replaces tables×bits
  * separate DotProduct expressions against typedLit planes — same
  * signs, same md5-derived planes, ~tables×bits fewer expression
  * dispatches per row.
  */
case class HyperplaneBuckets(child: Expression, tables: Int, bits: Int,
                             dims: Int, planesFlat: Array[Double])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tbl", IntegerType, nullable = false),
    StructField("bucket", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckSuccess
      case dt => TypeCheckFailure(
        s"$prettyName requires array<double> input, got ${dt.simpleString}")
    }
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dims)
    val out = new Array[Any](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var j = 0
      while (j < bits) {
        val base = (t * bits + j) * dims
        var s = 0.0
        var d = 0
        while (d < n) { s += planesFlat(base + d) * arr.getDouble(d); d += 1 }
        if (s >= 0) bucket |= (1 << j)
        j += 1
      }
      out(t) = org.apache.spark.sql.catalyst.InternalRow(t, bucket)
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

/** Top-`take` IVF cells for a vector against a driver-side centroid
  * table, in ONE pass: cosine vs every centroid, ranked desc with ties
  * to the HIGHER cell index (matching slice(reverse(array_sort(..)))
  * over struct(s, cell)). Returns array<struct<s,cell>>. Replaces the
  * interpreted `transform` over a typedLit centroid array.
  */
case class TopCells(child: Expression, centroids: Array[Array[Double]], take: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  private lazy val centNorms: Array[Double] =
    centroids.map(c => math.sqrt(c.map(x => x * x).sum))

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("s", DoubleType, nullable = true),
    StructField("cell", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_top_cells"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckSuccess
      case dt => TypeCheckFailure(
        s"$prettyName requires array<double> input, got ${dt.simpleString}")
    }
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val nv = arr.numElements()
    var vv = 0.0
    var i = 0
    while (i < nv) { val x = arr.getDouble(i); vv += x * x; i += 1 }
    val vNorm = math.sqrt(vv)
    val scored = Array.tabulate(centroids.length) { c =>
      val cent = centroids(c)
      val n = math.min(nv, cent.length)
      var s = 0.0
      var d = 0
      while (d < n) { s += arr.getDouble(d) * cent(d); d += 1 }
      (s / (vNorm * centNorms(c)), c)
    }
    // desc by score, ties to the higher cell — the reversed asc sort
    val top = scored.sortBy { case (s, c) => (-s, -c) }.take(take)
    new GenericArrayData(top.map { case (s, c) =>
      org.apache.spark.sql.catalyst.InternalRow(s, c)
    }.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): TopCells =
    copy(child = newChild)
}

/** Column-level entry points + SQL registration. */
object GraftFunctions {

  def wordShingles(text: Column, k: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), k))

  /** Every k-gram occurrence in order (non-distinct) — LM counting. */
  def wordNgrams(text: Column, k: Int): Column =
    ColumnBridge.column(
      WordShingles(ColumnBridge.expression(text), k, distinct = false))

  def meanWordLen(text: Column): Column =
    ColumnBridge.column(MeanWordLen(ColumnBridge.expression(text)))

  def markerRatio(text: Column, markers: Seq[String]): Column =
    ColumnBridge.column(MarkerRatio(ColumnBridge.expression(text), markers))

  def langId(text: Column, langs: Seq[(String, Seq[String])]): Column =
    ColumnBridge.column(LangIdExpr(ColumnBridge.expression(text), langs))

  def winnowCount(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowCountExpr(ColumnBridge.expression(text), k, w))

  def hyperplaneBuckets(vec: Column, tables: Int, bits: Int, dims: Int,
                        planes: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(HyperplaneBuckets(
      ColumnBridge.expression(vec.cast("array<double>")), tables, bits, dims,
      planes.flatten.flatten))

  def topCells(vec: Column, centroids: Array[Array[Double]], take: Int): Column =
    ColumnBridge.column(TopCells(
      ColumnBridge.expression(vec.cast("array<double>")), centroids, take))

  def simhashBands(text: Column): Column =
    ColumnBridge.column(SimHashBands(ColumnBridge.expression(text)))

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))

  def minhashSignature(hashes: Column, numPerms: Int = 128, seed: Long = 42L): Column =
    ColumnBridge.column(MinHashSignature(
      ColumnBridge.expression(hashes), numPerms, seed))

  /** Register every graft function for SQL use on a live session (the
    * same builders [[GraftExtensions]] installs via
    * `SparkSessionExtensions.injectFunction`).
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, (info, builder)) =>
      registry.registerFunction(FunctionIdentifier(name), info, builder)
    }
  }

  /** (name -> (info, builder)) for every SQL-exposed graft function. */
  val builders: Seq[(String, (ExpressionInfo, Seq[Expression] => Expression))] = {
    def info(cls: Class[_], name: String) = new ExpressionInfo(cls.getName, name)
    def intArg(children: Seq[Expression], i: Int, default: Int): Int =
      children.lift(i).map(_.eval(null).toString.toInt).getOrElse(default)
    def longArg(children: Seq[Expression], i: Int, default: Long): Long =
      children.lift(i).map(_.eval(null).toString.toLong).getOrElse(default)
    Seq(
      "graft_dot" -> (info(classOf[DotProduct], "graft_dot"),
        (children: Seq[Expression]) => DotProduct(
          org.apache.spark.sql.catalyst.expressions.Cast(children(0), ArrayType(DoubleType)),
          org.apache.spark.sql.catalyst.expressions.Cast(children(1), ArrayType(DoubleType)))),
      "graft_minhash" -> (info(classOf[MinHashSignature], "graft_minhash"),
        (children: Seq[Expression]) => MinHashSignature(children.head,
          intArg(children, 1, 128), longArg(children, 2, 42L))),
      "graft_word_shingles" -> (info(classOf[WordShingles], "graft_word_shingles"),
        (children: Seq[Expression]) => WordShingles(children.head, intArg(children, 1, 3))),
      "graft_simhash" -> (info(classOf[SimHashBands], "graft_simhash"),
        (children: Seq[Expression]) => SimHashBands(children.head)),
      "graft_mean_word_len" -> (info(classOf[MeanWordLen], "graft_mean_word_len"),
        (children: Seq[Expression]) => MeanWordLen(children.head)),
      "graft_winnow_count" -> (info(classOf[WinnowCountExpr], "graft_winnow_count"),
        (children: Seq[Expression]) => WinnowCountExpr(children.head,
          intArg(children, 1, 5), intArg(children, 2, 4))),
      // the sketch AGGREGATES, callable directly from SQL (the AQP
      // rules swap them in implicitly; these names opt in explicitly).
      // A bare AggregateFunction from a builder is wrapped in its
      // AggregateExpression by the analyzer.
      "graft_quantile_sketch" -> (info(classOf[LogHistQuantileAgg], "graft_quantile_sketch"),
        (children: Seq[Expression]) => LogHistQuantileAgg(
          org.apache.spark.sql.catalyst.expressions.Cast(children.head, DoubleType),
          children.lift(1).map { q =>
            // the quantile must be a NON-NULL literal: a column
            // reference here would otherwise eval(null) into an opaque
            // NPE, and a null literal would silently become the median
            if (!q.foldable)
              throw org.apache.spark.sql.graft.ColumnBridge
                .nonFoldableArgumentError("graft_quantile_sketch", "quantile",
                  q.dataType)
            Option(q.eval(null)).map(_.toString.toDouble).getOrElse(
              throw new IllegalArgumentException(
                "graft_quantile_sketch: quantile must be a non-null literal"))
          }.getOrElse(0.5))),
      "graft_approx_distinct" -> (info(classOf[HllAgg], "graft_approx_distinct"),
        (children: Seq[Expression]) => HllAgg(
          org.apache.spark.sql.catalyst.expressions.Md5(
            org.apache.spark.sql.catalyst.expressions.Cast(
              org.apache.spark.sql.catalyst.expressions.Cast(
                children.head, StringType), BinaryType)))),
    )
  }
}

/** `SparkSessionExtensions` hook: enable every graft SQL function via
  * `spark.sql.extensions=graft.functions.GraftExtensions` — the
  * idiomatic injection point for a deployed cluster, equivalent to
  * calling [[GraftFunctions.register]] on a live session.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, (info, builder)) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // opt-in count(DISTINCT) → deterministic-HLL AQP rewrite
    // (identity unless spark.graft.approxDistinct=true)
    ext.injectOptimizerRule(_ => graft.plans.ApproxDistinctRewrite)
    // opt-in exact-percentile → log-histogram sketch rewrite
    // (identity unless spark.graft.approxPercentile=true)
    ext.injectOptimizerRule(_ => graft.plans.ApproxPercentileRewrite)
    // native as-of join: plans graft.plans.AsofJoinNode (a no-op for
    // every other plan shape)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}
