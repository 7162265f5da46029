package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Dev microbenchmark (r12): cost attribution for the multi-word
  * SimHash sketch build — the bench-heaviest text operator family
  * (q47/q48/q253/q255/q257). Compares the shipped aggregate shape
  * against candidate rewrites on the real documents table so the
  * optimization round records measured, not guessed, deltas:
  *
  *   A  240 bit-extract sums over raw occurrence rows (shipped r12)
  *   B  same sums weighted by per-(doc, token) multiplicities — the
  *      240-buffer aggregate runs over distinct (id, tok) rows only
  *
  * Both forms must produce identical sketches; the probe asserts the
  * full 4-word sketch set matches before printing timings.
  */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.install(spark)

    val docs = graft.Tables.documents(spark, sfDir)
    val words = 4; val bpw = 60

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$r")
    }

    val occ = docs.select(col("doc_id").as("id"),
      explode(tokens(col("text"))).as("tok"))
    println(s"[probe] occ=${occ.count()} " +
      s"distinct(id,tok)=${occ.distinct().count()} " +
      s"vocab=${occ.select("tok").distinct().count()}")

    def signBit(h: Column, b: Int): Column =
      shiftright((pmod(h * (b + 7) + b, lit(1000000007L)) + 1) *
        lit(2654435761L), 10).bitwiseAND(1)
    val signCols = (0 until words).map { w =>
      (0 until bpw).map(j => shiftleft(signBit(col("h"), w * bpw + j), j))
        .reduce(_ + _).as(s"__sw$w")
    }
    val tokHash = occ.select(col("tok")).distinct()
      .select(col("tok"), polyHash(col("tok")).as("h"))
      .select(col("tok") +: signCols: _*)

    val sketchCols = (0 until words).map { w =>
      (0 until bpw).map { j =>
        when(col(s"s${w * bpw + j}") > 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }

    // A: shipped shape — 240 sums over occurrence rows
    val toksA = occ.join(broadcast(tokHash), "tok")
      .select(col("id") +: (0 until words).map(w => col(s"__sw$w")): _*)
    val sumsA = (0 until words * bpw).map { b =>
      sum(shiftright(col(s"__sw${b / bpw}"), b % bpw)
        .bitwiseAND(1) * lit(2) - lit(1)).as(s"s$b")
    }
    val tableA = toksA.groupBy("id").agg(sumsA.head, sumsA.tail: _*)
      .select(col("id"), array(sketchCols: _*).as("simhash"))

    // B: multiplicity pre-aggregation — the 240-buffer aggregate sees
    // one row per distinct (doc, token)
    val grouped = occ.groupBy("id", "tok").agg(count(lit(1)).as("cnt"))
      .join(broadcast(tokHash), "tok")
    val sumsB = (0 until words * bpw).map { b =>
      sum((shiftright(col(s"__sw${b / bpw}"), b % bpw)
        .bitwiseAND(1) * lit(2) - lit(1)) * col("cnt")).as(s"s$b")
    }
    val tableB = grouped.groupBy("id").agg(sumsB.head, sumsB.tail: _*)
      .select(col("id"), array(sketchCols: _*).as("simhash"))

    val diff = tableA.join(tableB.withColumnRenamed("simhash", "__b"), "id")
      .filter(col("simhash") =!= col("__b")).count()
    println(s"[probe] A-vs-B sketch mismatches: $diff")

    for (i <- 1 to 2) t(s"A occurrences $i")(tableA.queryExecution.toRdd.count())
    for (i <- 1 to 2) t(s"B preagg $i")(tableB.queryExecution.toRdd.count())

    // C: one 60-field aggregate per word (WSCG-eligible: under the
    // spark.sql.codegen.maxFields=100 cut that turns the 240-field
    // aggregate interpreted), equi-joined back on id
    val toksC = occ.join(broadcast(tokHash), "tok")
      .select(col("id") +: (0 until words).map(w => col(s"__sw$w")): _*)
      .localCheckpoint()
    val perWord = (0 until words).map { w =>
      val sums = (0 until bpw).map { j =>
        sum(shiftright(col(s"__sw$w"), j).bitwiseAND(1) * lit(2) - lit(1))
          .as(s"s${w * bpw + j}")
      }
      toksC.groupBy("id").agg(sums.head, sums.tail: _*)
    }
    val tableC = perWord.reduce(_.join(_, "id"))
      .select(col("id"), array(sketchCols: _*).as("simhash"))
    val diffC = tableA.join(tableC.withColumnRenamed("simhash", "__c"), "id")
      .filter(col("simhash") =!= col("__c")).count()
    println(s"[probe] A-vs-C sketch mismatches: $diffC")
    for (i <- 1 to 2) t(s"C per-word codegen $i")(tableC.queryExecution.toRdd.count())

    // end-to-end q253 body, fresh plan + evicted caches per run (the
    // Bench protocol) — the gap between this and the component times
    // above is harness-visible overhead, not operator work
    for (i <- 1 to 3) {
      graft.Graft.evictAll(spark)
      t(s"full simhashPairsWide $i")(
        graft.pipeline.Dedup.simhashPairsWide(docs, "doc_id", "text",
          4, 60, 3).queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
