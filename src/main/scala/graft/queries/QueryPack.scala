package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-checkable queries. Each entry must appear in
  * BOTH maps (same key) unless the operation is not SQL-expressible in
  * DuckDB, in which case it may appear in `queries` only (weaker
  * rows-only check).
  *
  * Contract notes (driver compare):
  *  - column names are matched positionally-after-sort-by-name → every
  *    computed column is aliased identically in Spark and SQL;
  *  - results are made order-deterministic with a total-order sort key
  *    in both engines;
  *  - floating point is either raw pass-through (bit-identical), exact
  *    decimal arithmetic cast to double, or rounded to ≥6 dp.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
