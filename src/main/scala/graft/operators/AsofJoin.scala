package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join — the classic time-series operator Spark's
  * built-ins lack (each left row picks up the latest right row with the
  * same key and time <= its own). Implemented by composition (the
  * preference-order (a) route): tag both sides, union on a minimal
  * schema, and run ONE running `last_value(ignoreNulls)` window per
  * key — a single shuffle on the join key, no per-key loops, no range
  * explosion. At 100 TB this scales exactly like any keyed window:
  * partition by key, sort within partition; skewed keys fall to AQE.
  *
  * Ties: a right row at exactly the left row's time DOES match
  * (<= semantics, right-before-left secondary ordering) — the same
  * contract as DuckDB's `ASOF JOIN ... ON l.t >= r.t`, which the
  * oracle uses. The right side must be unique per (key, time) for a
  * deterministic result; pre-dedupe it (e.g. row_number) if not.
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame,
               keyCol: String, timeCol: String,
               payload: Seq[String], prefix: String = "asof_"): DataFrame = {
    val lrowType = StructType(left.schema.fields)
    val rpType = StructType(right.select(payload.map(col): _*).schema.fields)
    val l = left.select(
      col(keyCol).as("__k"), col(timeCol).cast("long").as("__t"),
      lit(1).as("__side"),
      lit(null).cast(rpType).as("__rp"),
      struct(left.columns.map(col): _*).as("__lrow"))
    val r = right.select(
      col(keyCol).as("__k"), col(timeCol).cast("long").as("__t"),
      lit(0).as("__side"),
      struct(payload.map(col): _*).as("__rp"),
      lit(null).cast(lrowType).as("__lrow"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionAll(r)
      .withColumn("__match", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val leftCols = left.columns.map(c => col("__lrow").getField(c).as(c))
    val rightCols = payload.map(c => col("__match").getField(c).as(prefix + c))
    matched.select(leftCols ++ rightCols: _*)
  }
}
