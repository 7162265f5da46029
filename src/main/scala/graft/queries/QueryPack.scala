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

/** Shared DuckDB oracle fragments for the vector replay contract —
  * ONE spelling of the strict-left-fold float accumulation
  * (`VectorFunctions`' order, bit-for-bit), so a fix to the fold or
  * rounding can never leave a second copy stale (r8 code review).
  */
private[queries] object OracleSql {
  def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(list_zip($a::DOUBLE[], $b::DOUBLE[]), p -> p[1] * p[2])), (x, y) -> x + y)"
  def cosSql(a: String, b: String): String =
    s"ROUND(${dotSql(a, b)} / (SQRT(${dotSql(a, a)}) * SQRT(${dotSql(b, b)})), 6)"
  def l2Sql(a: String, b: String): String =
    s"ROUND(SQRT(list_reduce(list_prepend(0.0, list_transform(list_zip($a::DOUBLE[], $b::DOUBLE[]), p -> (p[1] - p[2]) * (p[1] - p[2]))), (x, y) -> x + y)), 6)"
}
