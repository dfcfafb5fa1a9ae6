package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Int8 affine embedding quantization — the storage-compression step
  * a 100 TB vector corpus applies before/alongside PQ (4 bytes/dim →
  * 1, with per-dimension calibration): per-dim (min, max) fit, code =
  * clamp(round((x − min)·255/(max − min)), 0..255), reconstruction
  * x̂ = min + code·(max − min)/255.
  *
  * Shape: ONE posexplode → (dim, value) groupBy for the fit (d-bounded
  * key space, map-side combine — the PCA-cells pattern), fit table
  * broadcast back for encode/error in a second narrow pass. Error
  * sums ride 6-dp-rounded exact decimals (the kmeansStep convention),
  * so the report is engine-replayable; the only doubles are
  * single-op arithmetic on identical inputs.
  */
object Quantize {

  /** Per-dimension report: (dim, mn, mx, mean_abs_err, max_abs_err,
    * n_rail) over the whole corpus. n_rail counts codes on the 0/255
    * rails — for a min/max fit these are the legitimate extremes (no
    * value is ever clamped away); under a quantile-calibrated fit the
    * same column measures actual clipping.
    */
  def int8Report(df: DataFrame, vecCol: String): DataFrame = {
    val cells = df
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "x")))
    val fit = cells.groupBy(col("dim"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val scale = (col("mx") - col("mn")) / lit(255.0)
    val code = when(col("mx") === col("mn"), lit(0L))
      .otherwise(least(greatest(
        round((col("x") - col("mn")) / scale, 0).cast("long"), lit(0L)), lit(255L)))
    val recon = col("mn") + code.cast("double") * scale
    val err = abs(col("x") - recon)
    cells.join(broadcast(fit), "dim")
      .select(col("dim"), col("mn"), col("mx"), err.as("err"),
        ((code === 0L) || (code === 255L)).cast("long").as("rail"))
      .groupBy(col("dim"), col("mn"), col("mx"))
      .agg(
        (sum(round(col("err"), 6).cast("decimal(18,6)")).cast("double") /
          count(lit(1))).as("mean_abs_err"),
        max(round(col("err"), 6)).as("max_abs_err"),
        sum(col("rail")).as("n_rail"))
  }
}
