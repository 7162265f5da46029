package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{Graft, SparkEntry}

/** Dev tool: dump ONE named query's result to parquet for a targeted
  * oracle compare (tools/validate.py with a filter), without paying a
  * full graft.Verify pass. Usage: QueryDump <name> <sfDir> <outDir>.
  */
object QueryDump {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.install(spark)
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    spark.stop()
  }
}
