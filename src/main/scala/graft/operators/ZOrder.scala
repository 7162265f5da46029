package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of two
  * cluster keys so that range predicates on EITHER key prune files.
  * This is the multi-dimensional clustering trick behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY` — a linear sort key that keeps both dimensions
  * locally coherent, so per-file min/max statistics stay tight on both
  * columns at once (a plain sort keeps only its leading column tight).
  */
object ZOrder {

  /** Morton code of two non-negative integer columns, `bits` bits each
    * (result uses 2·bits bits). A static unrolled sum of shift/mask
    * terms — pure codegen'd integer arithmetic, no UDF, engine-portable
    * bit-for-bit.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, "bits in 1..31")
    val z = (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
    // a negative input's two's-complement low bits would z-order it as
    // the LARGEST value — silently wrecking the layout; fail loudly
    when(x < 0 || y < 0,
      raise_error(lit("zValue requires non-negative inputs — shift/pmod " +
        "negative keys into [0, 2^bits) first")).cast("long"))
      .otherwise(z)
  }

  /** The write-side layout decision table: lay rows out in z-value
    * order, cut files every `rowsPerFile` rows, and report each file's
    * min/max on both dimensions — exactly the footer statistics a
    * pruning reader would use. Tight (x,y) ranges per file ⇒ the layout
    * works.
    *
    * The global row number makes the file assignment a deterministic
    * contract for the oracle, and comes from the DISTRIBUTED
    * range-partitioned sort + zipWithIndex helper
    * (`Components.withGlobalRowNumber`) — NOT a partitionless
    * row_number window, which would funnel the whole table through one
    * partition (the q38-class bottleneck; this operator ranks
    * data-sized input, so the distinction is real at 100 TB). A
    * production writer would `repartitionByRange($"z")` +
    * `sortWithinPartitions` and let each task cut files locally — the
    * same layout this reports.
    */
  def layoutStats(df: DataFrame, xCol: String, yCol: String,
                  bits: Int, rowsPerFile: Int): DataFrame = {
    require(rowsPerFile > 0, "rowsPerFile must be > 0")
    val zed = df.select(col(xCol), col(yCol),
      zValue(col(xCol).cast("long"), col(yCol).cast("long"), bits).as("z"))
    graft.graph.Components.withGlobalRowNumber(zed, "__rn",
        Seq(col("z"), col(xCol), col(yCol)))
      .withColumn("file_id", expr(s"(__rn - 1) div ${rowsPerFile}"))
      .groupBy(col("file_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col(xCol)).as("x_min"), max(col(xCol)).as("x_max"),
        min(col(yCol)).as("y_min"), max(col(yCol)).as("y_max"),
        min(col("z")).as("z_min"), max(col("z")).as("z_max"))
  }
}
