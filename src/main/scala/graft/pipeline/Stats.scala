package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution sketches over numeric columns.
  *
  * `histogramQuantiles` is the deterministic alternative to
  * `percentile_approx`: Spark's GK-based sketch is merge-order-dependent
  * (different partitionings give different estimates), which makes it
  * impossible to verify cross-engine and non-reproducible run-to-run.
  * An equi-width histogram is a pure function of the data — same bins,
  * same counts, same interpolated estimates on every engine, every
  * cluster size — while keeping the same one-pass, bounded-memory
  * profile (B counters vs GK's O(1/ε) tuples).
  */
object Stats {

  /** Approximate quantiles from a `bins`-bucket equi-width histogram
    * with linear interpolation inside the target bucket (the classic
    * NIST estimator). Two passes: exact min/max/count (one scan), then
    * the binned count aggregate (second scan, map-side combine to B
    * partials). The quantile resolution step runs over B rows — driver
    * -side-tiny at any data scale.
    *
    * Output: (q, bin, est) per requested quantile, `est` rounded 6 dp.
    * Degenerate input (all values equal, mx == mn) maps everything to
    * bin 0 and every quantile to mn.
    */
  def histogramQuantiles(df: DataFrame, valueCol: String, bins: Int,
                         qs: Seq[Double]): DataFrame = {
    require(bins > 1, "need at least 2 bins")
    val stats = df.agg(
      min(col(valueCol)).cast("double").as("__mn"),
      max(col(valueCol)).cast("double").as("__mx"),
      count(col(valueCol)).as("__n"))
    val counts = df.select(col(valueCol).cast("double").as("__v"))
      .crossJoin(broadcast(stats))
      .select(
        when(col("__mx") === col("__mn"), lit(0))
          .otherwise(least(lit(bins - 1),
            floor((col("__v") - col("__mn")) * lit(bins.toDouble) /
              (col("__mx") - col("__mn"))).cast("int")))
          .as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("__c"))
    val cum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val binned = counts
      .withColumn("__cum", sum(col("__c")).over(cum))
      .crossJoin(broadcast(stats))
    val qdf = binned.sparkSession
      .createDataFrame(qs.map(Tuple1(_))).toDF("q")
    val t = col("q") * col("__n")
    val width = (col("__mx") - col("__mn")) / lit(bins.toDouble)
    binned.crossJoin(broadcast(qdf))
      .filter(col("__cum") >= t && (col("__cum") - col("__c")) < t)
      .select(col("q"), col("bin"),
        round(when(col("__mx") === col("__mn"), col("__mn"))
          .otherwise(col("__mn") + width *
            (col("bin") + (t - (col("__cum") - col("__c"))) / col("__c"))), 6)
          .as("est"))
  }
}
