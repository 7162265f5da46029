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

  /** Rendezvous (highest-random-weight) shard assignment: each record
    * goes to argmax_s md5(id ‖ s) — the consistent-placement scheme
    * whose defining property is MINIMAL MOVEMENT under resize: growing
    * from n to n+1 shards moves only ~1/(n+1) of records (mod-sharding
    * moves ~all of them), so an elastic cluster re-ships almost
    * nothing. Pure map-side: numShards hashes per record, packed-
    * struct argmax, no shuffle at all.
    */
  def rendezvousShards(df: DataFrame, idCol: String,
                       numShards: Int): DataFrame = {
    require(numShards > 0, "numShards must be > 0")
    val cand = df.select(col(idCol),
        explode(sequence(lit(0), lit(numShards - 1))).as("__s"))
      .withColumn("__h",
        conv(substring(md5(concat_ws("|", col(idCol).cast("string"),
          col("__s"))), 1, 15), 16, 10).cast("long"))
    cand.groupBy(col(idCol))
      .agg(max(struct(col("__h"), col("__s"))).as("__m"))
      .select(col(idCol), col("__m.__s").as("shard"))
  }

  /** Per-shard delivery manifest: row count + order-invariant checksum
    * (the `Stats.tableChecksum` md5 fold-sum, mod 2⁶⁰) for each md5
    * shard — what a consumer verifies before training on shipped
    * shards, and what an incremental delivery appends to (the fold-sum
    * is mergeable: manifest(A ∪ B) folds from manifest(A) and
    * manifest(B) without rereading either).
    *
    * One hash aggregate keyed by the map-side shard expression — a
    * single shuffle of (shard, partial count, partial sum) rows.
    */
  def shardManifest(df: DataFrame, idCol: String, numShards: Int,
                    fingerprint: org.apache.spark.sql.Column): DataFrame = {
    require(numShards > 0, "numShards must be > 0")
    val lim = 1L << 60
    val h = conv(substring(md5(fingerprint), 1, 15), 16, 10).cast("long")
    df.groupBy(pmod(md5Long(col(idCol).cast("string")),
        lit(numShards.toLong)).as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        pmod(sum(h.cast("decimal(38,0)")),
          lit(lim).cast("decimal(38,0)")).cast("long").as("checksum"))
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

  /** JSONL export — the dominant LLM training-data interchange format
    * (one JSON object per line, gzip-compressed shards). Same
    * deterministic md5 sharding and in-shard sequence as the parquet
    * writer, so a re-run reproduces both shard membership AND line
    * order; `shard=K/` directory partitioning keeps reader-side
    * pruning. Columnar parquet stays the internal format — JSONL is
    * the boundary format for tokenizer/trainer handoff.
    */
  def writeJsonlShards(df: DataFrame, idCol: String, outDir: String,
                       numShards: Int = 8, gzip: Boolean = true): Unit = {
    val w = shardAssignments(df, idCol, numShards)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("seq"))
      .write.mode("overwrite")
      .partitionBy("shard")
    (if (gzip) w.option("compression", "gzip") else w).json(outDir)
  }

  /** Read a JSONL shard directory back with an explicit schema —
    * schema-on-read inference is nondeterministic under sampling and a
    * full-scan inference pass at 100 TB is a wasted scan; production
    * readers always pin the schema.
    */
  def readJsonl(spark: org.apache.spark.sql.SparkSession, dir: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(dir)

  /** Small-file compaction: rewrite a parquet directory into
    * ⌈bytes / targetFileBytes⌉ files. Every incremental pipeline
    * (streaming sinks, per-batch dedup appends, many-shard exports)
    * accretes small files, and at 100 TB the scan's task-scheduling and
    * footer-reading overhead becomes proportional to FILE COUNT, not
    * data size — periodic compaction is how production tables keep the
    * read path O(data). Uses `repartition` (round-robin shuffle) for
    * even output sizes regardless of input skew; rewrites to a fresh
    * directory (never in place — the swap is the caller's atomic
    * rename/pointer flip, matching how table formats commit).
    * Returns (filesBefore, filesAfter, bytes).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, inDir: String,
              outDir: String,
              targetFileBytes: Long = 128L * 1024 * 1024): (Long, Long, Long) = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    require(inDir != outDir, "compaction never rewrites in place")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inDir), spark.sparkContext.hadoopConfiguration)
    def parquetFiles(dir: String) = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet"))
          buf += ((f.getPath.toString, f.getLen))
      }
      buf.toSeq
    }
    val before = parquetFiles(inDir)
    val bytes = before.map(_._2).sum
    val nOut = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inDir)
      .repartition(nOut)
      .write.mode("overwrite").parquet(outDir)
    (before.size.toLong, parquetFiles(outDir).size.toLong, bytes)
  }
}
