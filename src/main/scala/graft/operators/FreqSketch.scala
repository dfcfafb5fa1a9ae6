package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch: frequency estimation over an UNBOUNDED key domain
  * with FIXED state — a depth × width counter grid where
  * `est(w) = min_j grid(j, bucket_j(w)) >= true count` (one-sided
  * error, overcount ≤ εN with ε ≈ e/width at depth ln(1/δ)).
  *
  * Scale design (the 100 TB frequency question without a word
  * groupBy): tokens explode into `depth` (row, bucket) cells and
  * aggregate DIRECTLY on the grid key — the groupBy target has only
  * depth·width distinct keys, so map-side partial combine collapses
  * every partition to ≤ depth·width rows before the (trivial)
  * shuffle. No per-word state anywhere; grids from disjoint corpus
  * shards merge by cell addition. Bucket hashes ride the repo's
  * replayable md5-h16 convention ([[Sampling.hashBucket]] /
  * OracleExact.h16Sql), so an external SQL engine reproduces the
  * sketch — and therefore the estimates — bit-exactly.
  */
object FreqSketch {

  /** Row-`j` bucket of a token: first 16 md5 bits of "j:token",
    * reduced mod `width` (width ≤ 65536).
    */
  def bucket(token: Column, j: Int, width: Int): Column =
    pmod(Sampling.hashBucket(concat(lit(s"$j:"), token)), lit(width))

  private def cells(token: Column, depth: Int, width: Int): Column =
    explode(array((0 until depth).map(j =>
      struct(lit(j).as("j"), bucket(token, j, width).as("b"))): _*))

  /** Build the (j, b, cnt) grid in one pass over the token stream. */
  def countMinGrid(tokens: DataFrame, tokenCol: String,
                   depth: Int = 4, width: Int = 512): DataFrame =
    tokens.select(cells(col(tokenCol), depth, width).as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.b").as("b"))
      .agg(count(lit(1)).as("cnt"))

  /** Point estimates for `words`: min over the depth probed cells.
    * The grid is bounded (depth·width rows) by construction, so the
    * probe join broadcasts it — no shuffle of the query side.
    */
  def estimate(grid: DataFrame, words: DataFrame, wordCol: String,
               depth: Int = 4, width: Int = 512): DataFrame =
    words.select(col(wordCol), cells(col(wordCol), depth, width).as("jb"))
      .select(col(wordCol), col("jb.j").as("j"), col("jb.b").as("b"))
      .join(broadcast(grid), Seq("j", "b"))
      .groupBy(col(wordCol)).agg(min("cnt").as("est"))
}
