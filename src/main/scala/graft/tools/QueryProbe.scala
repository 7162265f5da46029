package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{Graft, SparkEntry}

/** Dev tool: run one named query, print timing + formatted plan. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val explain = args.contains("--explain")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.install(spark)
    val fn = SparkEntry.queries(name)
    // warm-up run then timed run; evict leftover storage between runs
    // exactly like Bench so run2 measures a cold query, not a session
    // with run1's checkpoint blocks still resident
    (1 to 2).foreach { i =>
      Graft.evictAll(spark)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val n = df.count()
      println(f"[probe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    if (explain) fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
