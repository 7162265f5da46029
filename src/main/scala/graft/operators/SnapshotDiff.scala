package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed diff of two table snapshots — the "what changed between
  * yesterday's and today's load" primitive behind audit logs, CDC
  * backfills, and data-regression gates (the read-side complement of
  * `CdcMerge`, which APPLIES a change set; this RECOVERS one).
  *
  * The caller supplies a `fingerprint` expression computed identically
  * on both sides (project the compared columns into a canonical string
  * — exact types like DECIMAL/BIGINT render identically across
  * engines; raw doubles would not). Keys only in the new snapshot are
  * `added`, only in the old are `removed`, present in both with
  * different fingerprints `changed`; unchanged rows are dropped.
  *
  * Scale notes: ONE full-outer equi-join on the key — shuffle on the
  * key both sides, or zero-Exchange when both snapshots are bucketed
  * on it (`operators.Bucketing`); the fingerprint collapses arbitrarily
  * wide rows to one comparable value before the join, so the shuffle
  * moves (key, hash)-sized rows, not whole records.
  */
object SnapshotDiff {

  def diff(oldSnap: DataFrame, newSnap: DataFrame, keyCols: Seq[String],
           fingerprint: Column): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val o = oldSnap.select(keyCols.map(col) :+ fingerprint.as("fp_old"): _*)
    val n = newSnap.select(keyCols.map(col) :+ fingerprint.as("fp_new"): _*)
    o.join(n, keyCols, "full_outer")
      .withColumn("change",
        when(col("fp_old").isNull, lit("added"))
          .when(col("fp_new").isNull, lit("removed"))
          .when(col("fp_old") =!= col("fp_new"), lit("changed")))
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) ++
        Seq(col("change"), col("fp_old"), col("fp_new")): _*)
  }
}
