package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: does `.count()` over a report-shaped plan ELIMINATE the
  * expensive branches? Spark can drop a left-outer join whose build
  * side has provably-unique join keys (an aggregate/distinct on the
  * key) when none of its columns are consumed — a count() over such a
  * report then measures only the probe side's scan, not the pipeline.
  * Prints the optimized count plan vs the full-materialization plan
  * for the q231 eval-overlap report so soak sections can pick a
  * forcing action.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.install(spark)
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val rep = graft.pipeline.Corpus.evalOverlapReport(docs, "doc_id",
      "text", evalPred = col("doc_id") % 10 === 0, n = 13)
    println("==== q231 count() plan ====")
    rep.groupBy().count().explain("formatted")
    println("==== q231 consuming aggregate plan ====")
    rep.agg(count(lit(1)), sum(col("n_dirty"))).explain("formatted")
    val dd = graft.pipeline.Dedup.crossCorpusDedupLsh(
      docs.filter(col("doc_id") < 400), docs.filter(col("doc_id") >= 400),
      "doc_id", "text")
    println("==== dedup count() plan ====")
    dd.groupBy().count().explain("formatted")
    println("==== dedup consuming aggregate plan ====")
    dd.agg(count(lit(1)), sum(col("n_near"))).explain("formatted")
    spark.stop()
  }
}
