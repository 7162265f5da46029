package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE INTO / CDC apply — the warehouse upsert primitive (the batch
  * form of what Debezium-style change feeds and lakehouse MERGE
  * statements execute): fold a batch of keyed changes into a target
  * table.
  *
  * Change rows carry the full target schema plus an op column
  * (`"U"` = upsert, `"D"` = delete) and a sequence column; when a key
  * appears multiple times in one batch the HIGHEST sequence wins
  * (ties break by op ascending — deterministic, so "D" beats "U" at
  * equal seq). The result is: target rows whose key has no change,
  * plus the winning upsert row per changed key.
  *
  * Scale: one window over the CHANGE batch (partitioned by key —
  * batch-sized, not target-sized), one left-anti equi-join against the
  * target, one union. The target is read exactly once and never
  * shuffled beyond the anti-join; at 100 TB co-locate both sides with
  * `Bucketing.writeBucketed` on the key and the anti-join runs with
  * zero Exchange.
  */
object CdcMerge {

  def applyChanges(target: DataFrame, changes: DataFrame,
                   keyCols: Seq[String], opCol: String,
                   seqCol: String): DataFrame = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(seqCol).desc, col(opCol).asc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val survivors = target.join(
      latest.select(keyCols.map(col): _*), keyCols, "left_anti")
    survivors.unionByName(
      latest.filter(col(opCol) =!= "D").drop(opCol, seqCol))
  }
}
