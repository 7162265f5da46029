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
  /** `events.parquet` carries TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects; read it as raw nanos (legacy conf) and surface both
    * `ts_ns` (exact long nanos, used for all arithmetic — never divide
    * through double, int64 nanos exceed double's 53-bit mantissa) and
    * `ts` (microsecond-truncated TimestampType for date functions).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    apply(s, d, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts_ns div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
