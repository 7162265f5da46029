package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-generated TPC-H-ish testdata
  * (see TESTDATA.md). One parquet file per table under `$dir/`.
  *
  * At 100 TB these reads stay unchanged: `spark.read.parquet` scales to
  * partitioned directories; filters/projections push into the scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The testdata files are single-row-group parquet, which Spark cannot
    * byte-range split — every scan would otherwise run as ONE task,
    * serializing all pre-shuffle compute (tokenizing, shingling, hashing,
    * partial aggregation). Spread deficient inputs across the cluster;
    * a no-op whenever the source already provides >= one split per core
    * (any real multi-file / multi-row-group layout, i.e. always at scale).
    * Catalyst still pushes filters and column pruning below the exchange.
    */
  private def spread(spark: SparkSession, df: DataFrame): DataFrame = {
    val p = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** Per-session memo of the loaded (and spread) table DataFrame: a
    * DataFrame is an immutable plan, safe to share across queries in a
    * session — this avoids re-listing files, re-reading footers, and
    * re-running the spread partition probe on every call.
    */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    memo.computeIfAbsent((spark, dir, name), { _ =>
      // events carries TIMESTAMP(NANOS); the legacy conf must be set
      // before the first read plans against it (see `events` below)
      if (name == "events")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spread(spark, spark.read.parquet(s"$dir/$name.parquet"))
    })

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  /** `events.parquet` has shipped `ts` as either TIMESTAMP(NANOS)
    * (surfaced as a raw long via the legacy nanosAsLong conf) or a
    * micro-precision timestamp (surfaced as TIMESTAMP_NTZ). Normalize
    * both to the pair every events query is written against:
    * `ts_ns` (exact long epoch nanos, used for all arithmetic — never
    * divide through double, int64 nanos exceed double's 53-bit
    * mantissa) and `ts` (microsecond TimestampType for date
    * functions). The session runs in UTC, so the NTZ→timestamp cast is
    * the identity on the naive wall-clock value and `unix_micros`
    * yields the same epoch DuckDB's `epoch_ns(ts)` does.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ =>
        val tsUtc = col("ts").cast(TimestampType)
        df.withColumn("ts_ns", unix_micros(tsUtc) * lit(1000L))
          .withColumn("ts", tsUtc)
    }
  }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(apply(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
