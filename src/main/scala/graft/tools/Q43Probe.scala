package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline.Dedup
object Q43Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.install(spark)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs (rows=$r)")
    }
    // warm
    val sh0 = Dedup.shingleSets(Tables.documents(spark, sfDir), "doc_id", "text", 3)
    sh0.count()
    time("shingleSets count") { sh0.count() }
    val sh = Dedup.shingleSets(Tables.documents(spark, sfDir), "doc_id", "text", 3)
    time("uncached: target+main (current shape)") {
      val target = sh.filter(col("id") === 7).select(explode(col("shingle_set")).as("__s")).distinct()
      sh.filter(col("id") =!= 7)
        .select(col("id"), explode(col("shingle_set")).as("__s"))
        .join(broadcast(target), "__s")
        .select(col("id").as("doc_id")).distinct().count()
    }
    time("cached sh variant") {
      val shc = Dedup.shingleSets(Tables.documents(spark, sfDir), "doc_id", "text", 3).cache()
      val target = shc.filter(col("id") === 7).select(explode(col("shingle_set")).as("__s")).distinct()
      val r = shc.filter(col("id") =!= 7)
        .select(col("id"), explode(col("shingle_set")).as("__s"))
        .join(broadcast(target), "__s")
        .select(col("id").as("doc_id")).distinct().count()
      shc.unpersist()
      r
    }
    time("collect target to literal array variant") {
      val t = Dedup.shingleSets(Tables.documents(spark, sfDir), "doc_id", "text", 3)
        .filter(col("id") === 7).select(explode(col("shingle_set")).as("__s")).distinct()
        .collect().map(_.getString(0)).toSet
      val bc = spark.sparkContext.broadcast(t)
      val probe = udf((ss: Seq[String]) => ss.exists(bc.value.contains))
      Dedup.shingleSets(Tables.documents(spark, sfDir), "doc_id", "text", 3)
        .filter(col("id") =!= 7).filter(probe(col("shingle_set")))
        .select(col("id").as("doc_id")).count()
    }
    spark.stop()
  }
}
