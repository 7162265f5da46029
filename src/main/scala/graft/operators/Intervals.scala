package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval coalescing (gaps-and-islands): merge every overlapping or
  * touching [start, end] interval per key into one island — the
  * warehouse staple behind "merge alert windows", "effective coverage
  * spans", and session stitching from per-event validity windows.
  *
  * Algorithm: per key, order intervals by (start, end); an interval
  * opens a NEW island iff its start exceeds the running max end of all
  * earlier intervals (strictly — touching intervals merge); the island
  * id is the running sum of those open flags, and one hash aggregate
  * folds each island to (min start, max end, member count).
  *
  * Scale notes: one window pass over the intervals partitioned BY KEY
  * (state = one running max per key partition, never the table) + one
  * hash aggregate — the same shuffle key end-to-end, so Spark plans a
  * single Exchange. All comparisons are on the caller's exact integer
  * time units; no doubles anywhere.
  */
object Intervals {

  def coalesceIntervals(df: DataFrame, keyCol: String, startCol: String,
                        endCol: String): DataFrame = {
    val ord = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol)).over(
      ord.rowsBetween(Window.unboundedPreceding, -1))
    val cum = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__new",
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("island", sum(col("__new")).over(cum))
      .groupBy(col(keyCol), col("island"))
      .agg(min(col(startCol)).as("start"),
        max(col(endCol)).as("end"),
        count(lit(1)).as("n_merged"))
  }

  /** Interval × interval OVERLAP join without a cartesian: both sides
    * explode to the fixed-width time bins they touch, candidates come
    * from a bin equi-join, the exact closed-interval predicate
    * (aStart ≤ bEnd ∧ bStart ≤ aEnd) verifies, and each overlapping
    * pair emits EXACTLY once — kept iff the join bin is the FIRST bin
    * both intervals occupy (max of the two start bins), which dedups
    * without a distinct shuffle. Adds `overlap_ns` =
    * min(ends) − max(starts) (0 for a touch).
    *
    * Scale: fan-out per interval = ⌈length/binNs⌉ — pick binNs near
    * the typical interval length and the join is ~row-proportional;
    * the same bin-bucket discipline as [[RangeJoin]].
    */
  def overlapJoin(a: DataFrame, aStart: String, aEnd: String,
                  b: DataFrame, bStart: String, bEnd: String,
                  binNs: Long): DataFrame = {
    require(binNs > 0, "binNs must be positive")
    val ax = a.withColumn("__bin", explode(sequence(
      expr(s"$aStart div $binNs"), expr(s"$aEnd div $binNs"))))
    val bx = b.withColumn("__bin", explode(sequence(
      expr(s"$bStart div $binNs"), expr(s"$bEnd div $binNs"))))
    ax.join(bx, "__bin")
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      .filter(col("__bin") ===
        greatest(expr(s"$aStart div $binNs"), expr(s"$bStart div $binNs")))
      .drop("__bin")
      .withColumn("overlap_ns",
        least(col(aEnd), col(bEnd)) - greatest(col(aStart), col(bStart)))
  }
}
