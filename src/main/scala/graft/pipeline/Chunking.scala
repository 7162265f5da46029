package graft.pipeline

import org.apache.spark.sql.DataFrame
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

  /** One row per (document, chunk): `chunk_idx` (0-based), the chunk
    * text, and its token count. Start offsets are 0, stride, 2·stride, …
    * strictly below the token count, so trailing tokens always appear in
    * a final (possibly short) chunk; empty documents yield no rows.
    */
  def tokenChunks(df: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int = 32, stride: Int = 24): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be > 0")
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
}
