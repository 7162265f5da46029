package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events stream — the
  * beyond-parity extension (the reference is strictly request/response;
  * SURVEY §2.8). Batch equivalents of these operators are
  * oracle-checked in EventsPack (q60/q61/q64); the streaming versions
  * share the same column logic so batch == stream semantics.
  *
  * Scale notes: windowed aggregates with watermarks bound state size;
  * sessionization uses mapGroupsWithState with processing-time-free,
  * event-time-driven state so replays are deterministic.
  */
object EventStreams {

  /** Explicit source schema (readStream requires one). `ts` arrives as
    * int64 nanos (see Tables.events).
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based event stream: one parquet file per micro-batch. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }

  /** Tumbling 1h windowed aggregate with a watermark (stream form of
    * q60_hourly_agg).
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  case class SessionState(lastTsNs: Long, sessions: Long, events: Long)
  case class UserSessions(user_id: Long, n_events: Long, n_sessions: Long)

  /** Custom-state sessionization (stream form of q61_sessionize): a new
    * session opens when the gap since the previous event exceeds
    * `gapNs`. State per user = (last event time, session count).
    */
  def sessionize(events: DataFrame, gapNs: Long = 1800L * 1000 * 1000 * 1000)
      : Dataset[UserSessions] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts_ns"), col("event_id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[SessionState, UserSessions](GroupStateTimeout.NoTimeout) {
        case (userId, rows, state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { case (_, tsNs, _) =>
            val isNew = st.lastTsNs == Long.MinValue || tsNs - st.lastTsNs > gapNs
            st = SessionState(tsNs, st.sessions + (if (isNew) 1 else 0), st.events + 1)
          }
          state.update(st)
          UserSessions(userId, st.events, st.sessions)
      }
  }

  /** Run a streaming query to completion over the currently-available
    * files (one batch per file) into an in-memory table; returns the
    * final result. Used by tests to pin stream==batch semantics.
    */
  def runToMemory(df: DataFrame, queryName: String,
                  outputMode: OutputMode = OutputMode.Update()): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    df.sparkSession.table(queryName)
  }
}
