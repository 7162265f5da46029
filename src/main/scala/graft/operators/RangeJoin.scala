package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — left points against right [start, end]
  * intervals on the same key. Spark's built-in planner turns the raw
  * `BETWEEN` predicate into a nested-loop join (O(n·m) per key); this
  * operator makes it an equi-join by bucketizing time into fixed-width
  * bins: each interval explodes to the bins it covers, each point maps
  * to its single bin, and the join runs on (key, bin) with the exact
  * BETWEEN as a residual filter. With bin width >= typical interval
  * width each interval lands in <= 2 bins, so the blow-up is bounded
  * and the shuffle is equi-join shaped — partitionable and
  * AQE-skew-safe at 100 TB (the standard spatial/temporal binning
  * trick). Results are exactly the naive join's: a point's bin is
  * always within the interval's covered bins, and duplicates cannot
  * arise (one bin per point).
  */
object RangeJoin {

  def rangeJoin(left: DataFrame, right: DataFrame, keyCol: String,
                timeCol: String, startCol: String, endCol: String,
                binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val l = left.withColumn("__bin", floor(col(timeCol) / binWidth))
    val r = right.withColumn("__bin",
      explode(sequence(floor(col(startCol) / binWidth),
        floor(col(endCol) / binWidth))))
    l.join(r, Seq(keyCol, "__bin"))
      .filter(col(timeCol) >= col(startCol) && col(timeCol) <= col(endCol))
      .drop("__bin")
  }
}
