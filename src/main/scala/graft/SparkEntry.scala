package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of all query packs; each pack covers one slice
  * of the SURVEY §2 operator inventory plus the training-data-pipeline
  * extensions. Every key present in `oracleSql` is hash-checked against
  * DuckDB at sf0.01 by the driver.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    RelationalPack,
    SimilarityPack,
    TextPack,
    EventsPack,
    GraphPack,
    TrainPack,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Join + broadcast-dim + aggregate: revenue by nation.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_join_agg_nation_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracleSql).toMap
}
