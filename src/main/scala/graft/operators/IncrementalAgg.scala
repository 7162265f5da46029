package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance for MERGEABLE aggregates:
  * fold a delta batch's partial aggregate into a stored base aggregate
  * without rescanning the base fact table — the nightly-rollup /
  * streaming-upsert pattern every warehouse runs.
  *
  * Only works for aggregates with an associative-commutative merge
  * (count, sum, min, max — and the sketch aggregates in
  * `graft.functions`, whose states merge the same way); avg/percentile
  * maintain as (sum, count) / sketch pairs and finalize at read time.
  *
  * Scale notes (100 TB): the whole point — maintenance cost is
  * O(delta + touched keys), independent of the base table's size. The
  * merge is ONE full-outer equi-join on the group key between the
  * stored aggregate and the delta's (much smaller) partial aggregate;
  * stored aggregates bucketed on the key (`operators.Bucketing`) make
  * it zero-Exchange on the base side. Exactness: merging decimal /
  * integer partial sums is associative, so the maintained view is
  * bit-identical to a full recompute — which is exactly what the q149
  * oracle asserts.
  */
object IncrementalAgg {

  /** Merge a delta partial aggregate into a base aggregate.
    *
    * Both inputs carry `keyCols` plus measure columns; `sumCols` merge
    * by addition (count is a sum of partial counts), `minCols` by min,
    * `maxCols` by max. Keys present on one side only pass through
    * (coalesce against the additive identity for sums; min/max take
    * the present side).
    */
  def mergeAggs(base: DataFrame, delta: DataFrame, keyCols: Seq[String],
                sumCols: Seq[String], minCols: Seq[String] = Nil,
                maxCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val b = (sumCols ++ minCols ++ maxCols).foldLeft(base) { (df, c) =>
      df.withColumnRenamed(c, s"__b_$c")
    }
    val d = (sumCols ++ minCols ++ maxCols).foldLeft(delta) { (df, c) =>
      df.withColumnRenamed(c, s"__d_$c")
    }
    val merged = b.join(d, keyCols, "full_outer")
    val measures =
      sumCols.map { c =>
        (coalesce(col(s"__b_$c"), lit(0)) + coalesce(col(s"__d_$c"), lit(0)))
          .as(c)
      } ++
      minCols.map { c => least(col(s"__b_$c"), col(s"__d_$c")).as(c) } ++
      maxCols.map { c => greatest(col(s"__b_$c"), col(s"__d_$c")).as(c) }
    merged.select(keyCols.map(col) ++ measures: _*)
  }
}
