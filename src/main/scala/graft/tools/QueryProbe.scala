package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{Graft, SparkEntry}

/** Dev tool: run one named query, print timing + formatted plan.
  * `--runs N` repeats the timed run N times after the warm-up and
  * prints the warm MEDIAN — the bench-drift adjudication protocol
  * (r6 verdict item 4: driver-vs-local deltas must be proven noise
  * with warm medians, not eyeballed single runs).
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1 && !args(1).startsWith("--"))
      args(1) else "/root/testdata/sf0.1"
    val explain = args.contains("--explain")
    val runs = args.indexOf("--runs") match {
      case -1 => 1
      // a trailing --runs with no (numeric) value is a usage error,
      // not an ArrayIndexOutOfBounds (ADVICE r7)
      case i if i + 1 < args.length && args(i + 1).toIntOption.isDefined =>
        args(i + 1).toInt
      case _ =>
        System.err.println("[probe] --runs requires an integer value; using 1")
        1
    }
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
    val times = (1 to 1 + runs).map { i =>
      Graft.evictAll(spark)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      // full-materialization forcing, matching Bench's r8 protocol
      // (df.count() lets Catalyst eliminate cardinality-preserving
      // outer joins and times a pruned plan on report-shaped queries)
      val n = df.queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name run$i: $dt%.2fs rows=$n")
      dt
    }
    if (runs > 1) {
      val warm = times.drop(1).sorted
      val med =
        if (warm.size % 2 == 1) warm(warm.size / 2)
        else (warm(warm.size / 2 - 1) + warm(warm.size / 2)) / 2.0
      println(f"[probe] $name warm_median($runs): $med%.2fs")
    }
    if (explain) fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
