package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: execute every contract query at sf0.001 and report which
  * final plans contain CartesianProduct / BroadcastNestedLoopJoin —
  * the input for PlanSpec's global no-cartesian allowlists.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.install(spark)
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sf)
        df.collect()
        val p = df.queryExecution.executedPlan.toString
        val cart = p.contains("CartesianProduct")
        val bnlj = p.contains("BroadcastNestedLoopJoin")
        val win1 = p.contains("Exchange SinglePartition") && p.contains("Window")
        println(s"$name cartesian=$cart bnlj=$bnlj singlePartWindow=$win1")
      } catch {
        case e: Throwable => println(s"$name ERROR ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}")
      }
    }
    spark.stop()
  }
}
