package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev sweep (r12): run every contract query and report, per query,
  * where its wall time hides SERIAL work — stages with one task (a
  * collect/broadcast build doing real compute on one core) and the
  * heaviest stage overall. The q253 finding that motivated this: AQE
  * sized an explode side by its pre-explode shuffle bytes and
  * broadcast-collected the whole exploded occurrence table through a
  * single task (4.8 s of a 9 s query). This audit finds every other
  * query paying the same class of cost.
  *
  * Output, one line per query:
  *   name wall=…s stages=… serial1TaskRun=…ms maxStageRun=…ms tasksMax=…
  */
object SerialAudit {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val only = if (args.length > 1) Some(args(1)) else None
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.install(spark)

    val stages = mutable.ArrayBuffer[(Int, Long, Long)]() // tasks, wall, execRun
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages.synchronized {
          val si = sc.stageInfo
          stages += ((si.numTasks,
            si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
            si.taskMetrics.executorRunTime))
        }
    })

    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(n.contains) }
      .foreach { case (name, fn) =>
        graft.Graft.evictAll(spark)
        stages.synchronized(stages.clear())
        val t0 = System.nanoTime()
        try {
          fn(spark, sf).queryExecution.toRdd.count()
          val dt = (System.nanoTime() - t0) / 1e9
          // give straggler stage-completed events a beat to arrive
          Thread.sleep(50)
          val ss = stages.synchronized(stages.toVector)
          val serial = ss.filter(_._1 == 1).map(_._3).sum
          val serialMax = if (ss.exists(_._1 == 1)) ss.filter(_._1 == 1).map(_._3).max else 0L
          val maxRun = if (ss.nonEmpty) ss.map(_._3).max else 0L
          println(f"$name wall=$dt%.2fs stages=${ss.size} " +
            f"serial1TaskRunTotal=${serial}ms serial1TaskRunMax=${serialMax}ms " +
            f"maxStageRun=${maxRun}ms")
        } catch {
          case e: Throwable =>
            println(s"$name ERROR ${e.getClass.getSimpleName}: " +
              s"${Option(e.getMessage).getOrElse("").take(120)}")
        }
      }
    spark.stop()
  }
}
