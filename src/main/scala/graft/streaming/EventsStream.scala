package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming over the `events` table (SURVEY.md §2.9 build-out).
  *
  * The reference only "streams" as out-of-core batch iteration
  * (/root/reference/app.py:109); real streaming semantics — unbounded file
  * source, event-time watermark, tumbling windows, incremental state — are
  * new surface. The aggregation here is IDENTICAL to the batch
  * `q_events_tumbling` query (same `window()` call), which is how it stays
  * verifiable: StreamingSpec asserts stream output == batch output, and the
  * batch twin hash-matches the DuckDB oracle.
  *
  * At scale: the file source incrementally lists new files per trigger;
  * watermark bounds state (late events beyond 1h are dropped); the windowed
  * aggregation shuffles on (window, event_type) with partial aggregation
  * per micro-batch.
  */
object EventsStream {

  /** Raw schema of events.parquet with ts as nanos-long (the file carries
    * TIMESTAMP(NANOS), which Spark reads via nanosAsLong — see Tables.events).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Unbounded view of the events table: readStream + ns→µs conversion. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // glob rather than literal file path: the streaming file source derives
    // its basePath from the non-glob prefix, and basePath must be a directory
    spark.readStream
      .schema(rawSchema)
      .parquet(s"$dir/events.parque[t]")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** The streaming transform: watermarked hourly tumbling counts per type. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n"))

  /** Drain the whole (bounded) source once with Trigger.AvailableNow into an
    * in-memory sink and return the materialized result — the test harness
    * for the streaming path. `complete` output mode because watermark-close
    * semantics on a bounded replay would hold back the final windows.
    */
  def runTumblingOnce(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val q = tumblingCounts(readEvents(spark, dir))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
