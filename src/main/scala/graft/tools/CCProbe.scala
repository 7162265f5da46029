package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.similarity.SimilarityOps
object CCProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.install(spark)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val emb = Tables.embeddings(spark, sfDir)
    SimilarityOps.allPairs(emb, "vec_id", "embedding", 0.4).count()
    val t0 = System.nanoTime()
    val pairs = SimilarityOps.allPairs(emb, "vec_id", "embedding", 0.4)
    val e0 = pairs.select(col(pairs.columns.head).cast("long").as("src"),
      col(pairs.columns(1)).cast("long").as("dst")).localCheckpoint()
    val sym = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().cache()
    println("sym parts=" + sym.rdd.getNumPartitions + " rows=" + sym.count())
    var labels = emb.select(col("vec_id").cast("long").as("id"))
      .withColumn("component", col("id")).localCheckpoint()
    println("labels parts=" + labels.rdd.getNumPartitions)
    println(f"setup: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    def labelSum(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(col("component"))).collect()(0).getLong(0)
    var prevSum = labelSum(labels)
    var converged = false; var i = 0
    while (!converged && i < 50) {
      val t1 = System.nanoTime()
      val prop = sym.join(labels, sym("dst") === labels("id"))
        .select(col("src").as("id"), col("component"))
        .unionAll(labels)
        .groupBy("id").agg(min(col("component")).as("component"))
      labels = prop.as("x")
        .join(prop.select(col("id").as("cid"), col("component").as("ccomp")).as("y"),
          col("x.component") === col("y.cid"), "left")
        .select(col("x.id").as("id"),
          least(col("x.component"), coalesce(col("ccomp"), col("x.component")))
            .as("component"))
        .localCheckpoint()
      val s = labelSum(labels)
      println(f"iter $i: ${(System.nanoTime() - t1) / 1e9}%.2fs labelparts=" + labels.rdd.getNumPartitions)
      converged = s == prevSum; prevSum = s; i += 1
    }
    println(s"iterations=$i total=${(System.nanoTime() - t0) / 1e9}")
    spark.stop()
  }
}
