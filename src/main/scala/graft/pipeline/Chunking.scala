package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Document chunking for training-data export: split each document into
  * fixed-size token windows with a configurable stride (overlap =
  * chunkSize - stride). This is the canonical pre-tokenization step of
  * an LLM data pipeline — context-window-sized pieces with overlap so no
  * boundary text is lost.
  *
  * Pure map-side work (tokenize → window starts → posexplode → slice):
  * no shuffle, runs at scan speed, and the output is streamed per
  * partition — at 100 TB the chunker never materializes a document's
  * chunks anywhere but the task that read it.
  */
object Chunking {

  /** The ONE shard-assignment expression shared by [[packSequences]]
    * (which lays out the data) and [[packingStats]] (which audits the
    * layout) — factored so the audit can never silently measure a
    * different layout than the packer produces (ADVICE r6).
    */
  private def shardExpr(idCol: String, numShards: Int) =
    pmod(md5Long(col(idCol).cast("string")), lit(numShards.toLong))

  /** One row per (document, chunk): `chunk_idx` (0-based), the chunk
    * text, and its token count. Start offsets are 0, stride, 2·stride, …
    * strictly below the token count, so trailing tokens always appear in
    * a final (possibly short) chunk; empty documents yield no rows.
    */
  def tokenChunks(df: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int = 32, stride: Int = 24): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be > 0")
    require(stride <= chunkSize,
      s"stride ($stride) > chunkSize ($chunkSize) would silently drop the " +
        "tokens between consecutive windows — every token must land in a chunk")
    val withToks = df
      .select(col(idCol), tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) > 0)
    // starts = [0, stride, 2*stride, ...] up to size-1 inclusive
    val starts = sequence(lit(0), size(col("__tk")) - 1, lit(stride))
    withToks
      .select(col(idCol), col("__tk"), posexplode(starts).as(Seq("chunk_idx", "__start")))
      .select(
        col(idCol),
        col("chunk_idx"),
        least(lit(chunkSize), size(col("__tk")) - col("__start")).as("n_chunk_tokens"),
        concat_ws(" ", slice(col("__tk"), col("__start") + 1, lit(chunkSize)))
          .as("chunk_text"))
  }

  /** Sequence packing: lay the chunk stream end-to-end into fixed
    * `budget`-token training sequences, the concat-and-split packing
    * GPT-style pretraining uses (a chunk whose tokens straddle a
    * boundary is split by the reader at `offset_in_seq`; no padding
    * waste). The layout is a pure function of the data: chunks are
    * md5-sharded by document and laid out in (doc, chunk_idx) order
    * within each shard, so every re-run — any cluster size, any input
    * partitioning — produces byte-identical sequences.
    *
    * Each shard packs independently under one window (shard-partition
    * sort, no global sort); shards are the parallelism unit at scale —
    * pick numShards ≈ cluster cores, each shard streams through one
    * task.
    */
  def packSequences(chunks: DataFrame, idCol: String, idxCol: String,
                    tokCountCol: String, budget: Int = 256,
                    numShards: Int = 4): DataFrame = {
    require(budget > 0 && numShards > 0, "budget and numShards must be > 0")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col(idCol).asc, col(idxCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    chunks
      .withColumn("shard", shardExpr(idCol, numShards))
      .withColumn("__before", coalesce(sum(col(tokCountCol)).over(w), lit(0L)))
      .select(
        col(idCol), col(idxCol), col("shard"),
        // `div` = exact integer division (no double round-trip)
        expr(s"__before div ${budget}L").as("seq_id"),
        (col("__before") % budget).as("offset_in_seq"))
  }

  /** Packing-efficiency audit for [[packSequences]]' layout: per shard,
    * chunk and token mass, sequences consumed (the token stream covers
    * [0, total), so ⌈total/budget⌉ fixed-size sequences), the fill of
    * the final partial sequence, and utilization in FLOORED milli
    * units — a packing run that silently wastes capacity shows up here
    * as a number, not a guess (the "no silent caps" audit of the
    * training-export path). All-integer outputs; one keyed aggregate
    * over the shard assignment, no window — cheaper than the packer it
    * audits, linear at any corpus size.
    */
  def packingStats(chunks: DataFrame, idCol: String, tokCountCol: String,
                   budget: Int = 256, numShards: Int = 4): DataFrame = {
    require(budget > 0 && numShards > 0, "budget and numShards must be > 0")
    val agg = chunks
      .withColumn("shard", shardExpr(idCol, numShards))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col(tokCountCol)).cast("long").as("n_tokens"))
    // every shard gets a row: an IDLE shard is itself capacity waste —
    // exactly what this audit exists to expose — and must show up as
    // zeros, not be silently absent (the numShards dimension is a
    // bounded literal range, not data)
    chunks.sparkSession.range(numShards).select(col("id").as("shard"))
      .join(agg, Seq("shard"), "left")
      .select(col("shard"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
      .withColumn("n_sequences",
        expr(s"(n_tokens + ${budget - 1}L) div ${budget}L"))
      .withColumn("last_fill",
        when(col("n_tokens") % budget === 0 && col("n_tokens") > 0,
          lit(budget.toLong)).otherwise(col("n_tokens") % budget))
      .withColumn("utilization_milli",
        when(col("n_sequences") === 0, lit(0L))
          .otherwise(expr(s"(1000L * n_tokens) div (n_sequences * ${budget}L)")))
  }
}
