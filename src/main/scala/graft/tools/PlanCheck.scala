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

    // --- q244 latency decomposition: where do the ~7 s go? ---
    if (args.contains("--q244")) {
      import graft.functions.TextFunctions._
      val full = graft.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("source"), col("text"))
      def timeIt(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
        graft.Graft.evictAll(spark)
        val t0 = System.nanoTime()
        val n = df.queryExecution.toRdd.count()
        println(f"[q244probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"))
      // A: the operator as shipped
      timeIt("operator")(graft.pipeline.Corpus.marginalNoveltyCurve(
        full, "doc_id", "text", "source", 10, 3))
      // B: same but repartition after the window so the explode +
      // aggregates run at full parallelism, not |sources| tasks
      timeIt("repartitioned") {
        full.select(col("source"),
            ntile(10).over(w).cast("long").as("bucket"), col("text"))
          .repartition(32)
          .select(col("source"), col("bucket"),
            explode(array_distinct(shingles(tokens(col("text")), 3)))
              .as("gram"))
          .groupBy(col("source"), col("gram"))
          .agg(min(col("bucket")).as("bucket"))
          .groupBy(col("source"), col("bucket"))
          .agg(count(lit(1)).as("n_new_grams"))
      }
      // C: no window at all (parallelism reference)
      timeIt("no-window") {
        full.select(col("source"), lit(1L).as("bucket"), col("text"))
          .select(col("source"), col("bucket"),
            explode(array_distinct(shingles(tokens(col("text")), 3)))
              .as("gram"))
          .groupBy(col("source"), col("gram"))
          .agg(min(col("bucket")).as("bucket"))
          .groupBy(col("source"), col("bucket"))
          .agg(count(lit(1)).as("n_new_grams"))
      }
    }
    spark.stop()
  }
}
