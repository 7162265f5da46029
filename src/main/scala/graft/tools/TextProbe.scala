package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._
import graft.pipeline.Dedup

/** Dev microbenchmark: stage-by-stage cost of the text/dedup pipeline
  * over the real documents table (tokenize → shingle → hash → minhash).
  */
object TextProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.install(spark)

    val docs = Tables.documents(spark, sfDir).cache()
    val nd = docs.count()
    docs.agg(sum(length(col("text")))).show()
    println(s"docs=$nd")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs (rows=$r)")
    }

    time("tokens only") {
      docs.select(sum(size(tokens(col("text"))))).collect()(0).getLong(0)
    }
    time("shingles") {
      docs.select(sum(size(shingles(tokens(col("text")), 3)))).collect()(0).getLong(0)
    }
    time("shingleSets (distinct)") {
      Dedup.shingleSets(docs, "doc_id", "text", 3)
        .select(sum(size(col("shingle_set")))).collect()(0).getLong(0)
    }
    time("shingleSets + md5Long") {
      Dedup.shingleSets(docs, "doc_id", "text", 3)
        .select(transform(col("shingle_set"), t => md5Long(t)).as("h"))
        .select(sum(size(col("h")))).collect()(0).getLong(0)
    }
    spark.stop()
  }
}
