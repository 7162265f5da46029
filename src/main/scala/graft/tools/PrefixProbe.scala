package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: plain explode-join vs prefix-filtered n-gram Jaccard
  * pairs at a given SF (warm run1/run2 + row-count equality).
  */
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val t = if (args.length > 1) args(1).toDouble else 0.5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, sf)
    docs.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n1 = f
      val t1 = System.nanoTime(); val n2 = f
      val t2 = System.nanoTime()
      println(f"[probe] $name: run1 ${(t1 - t0) / 1e9}%.2fs run2 ${(t2 - t1) / 1e9}%.2fs rows=$n1/$n2")
    }
    time(s"plain  t=$t")(
      graft.pipeline.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, t).count())
    time(s"prefix t=$t")(
      graft.pipeline.Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 3, t).count())
    spark.stop()
  }
}
