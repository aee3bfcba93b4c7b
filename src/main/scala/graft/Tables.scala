package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * One parquet file per table under a scale-factor directory. Loading is a
  * plain distributed parquet scan — the footer schema is authoritative (see
  * SURVEY.md §1.2: we deliberately diverge from the reference's first-batch
  * pandas dtype sniffing, /root/reference/app.py:117-126, because the DuckDB
  * oracle also reads the footer).
  */
object Tables {
  val star: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val all: Seq[String] = star ++ Seq("events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects outright ([PARQUET_TYPE_ILLEGAL]). We read the raw nanos as a
    * long (legacy conf) and truncate to microseconds — exactly what the
    * DuckDB oracle does via `make_timestamp(epoch_ns(ts) // 1000)`, so both
    * sides agree on the value. Integer `div` avoids double-rounding drift.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Scope the legacy conf to schema resolution: parquet schema conversion
    // consults it eagerly inside spark.read.parquet(), and the physical scan
    // captures its own SQLConf snapshot at planning, so restoring the prior
    // value here cannot flip an events frame already built — and later reads
    // of OTHER nanos-typed parquet in the same session fail loudly again.
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      spark.read
        .parquet(s"$dir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** Oracle-side (DuckDB) equivalent of [[events]]: a derived-table SQL
    * fragment producing the same µs-truncated `ts`. Splice as `FROM ($sql) e`.
    */
  val eventsOracleFrom: String =
    "(SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, " +
      "user_id, event_type, value, props FROM events)"
}
