package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout: the WRITE-side half of shuffle elimination.
  * Every `groupBy`/`join` on a key shuffles — unless the data already
  * lives hash-partitioned on that key. `bucketBy(n, key)` persists
  * Spark's hash partitioning INTO the table layout (n files per
  * partition, file index = pmod(hash(key), n) — the same function the
  * shuffle uses), so a later equi-join or aggregation on `key` between
  * two tables bucketed the same way runs with ZERO Exchange on either
  * side: at 100 TB that converts the nightly fact⋈fact join from the
  * cluster's dominant shuffle into a map-side zip of co-located
  * buckets. `sortBy` additionally pre-orders within each bucket, letting
  * the sort-merge join skip its sorts when Spark can prove per-file
  * ordering (one file per bucket).
  *
  * The trade: bucketing fixes `n` at write time (choose ~data/128 MB at
  * the target scale), and only equi-operations on exactly the bucket
  * key benefit. `PlanSpec` pins the no-Exchange property end-to-end.
  */
object Bucketing {

  /** Persist `df` as a bucketed parquet table in the session catalog
    * (external when `path` is given). One shuffle now, none later.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int, path: Option[String] = None): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, key).sortBy(key)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Equi-join two same-bucketed catalog tables on their bucket key.
    * With matching bucket counts the planner proves both sides already
    * hash-partitioned on `key` and emits a SortMergeJoin with no
    * Exchange — the co-located join.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String,
                   rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
