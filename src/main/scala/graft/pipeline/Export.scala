package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deterministic training-data export: hash-sharding with a stable
  * in-shard sequence, and a partitioned writer.
  *
  * Training jobs need a GLOBAL deterministic shuffle (so every re-run
  * reads examples in the same order) without a global sort of the data
  * itself. md5-sharding gives that: the shard id and the in-shard order
  * are pure functions of the record key — independent of input
  * partitioning, cluster size, or execution order.
  */
object Export {

  /** Assign each row a shard (md5 of the id, mod numShards) and a
    * 1-based position within the shard (ordered by the md5 hex digest —
    * unique per id, so the order is total and reproducible). The window
    * partitions by shard: each shard sorts independently, no global
    * sort, and shards are balanced by the uniformity of md5.
    */
  def shardAssignments(df: DataFrame, idCol: String,
                       numShards: Int = 8): DataFrame = {
    require(numShards > 0, "numShards must be > 0")
    val hex = md5(col(idCol).cast("string"))
    val w = Window.partitionBy(col("shard")).orderBy(col("__hex").asc)
    df.withColumn("__hex", hex)
      .withColumn("shard", pmod(md5Long(col(idCol).cast("string")), lit(numShards.toLong)))
      .withColumn("seq", row_number().over(w))
      .drop("__hex")
  }

  /** Write the sharded dataset as parquet partitioned by shard —
    * `outDir/shard=K/…` — so a training reader can open exactly the
    * shards assigned to it (partition pruning on `shard`).
    */
  def writeShards(df: DataFrame, idCol: String, outDir: String,
                  numShards: Int = 8): Unit = {
    shardAssignments(df, idCol, numShards)
      .repartition(col("shard"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(outDir)
  }
}
