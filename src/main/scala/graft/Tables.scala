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

  /** Schema-adaptive events loader — the parquet footer is authoritative
    * (SURVEY §1.2; the reference reads whatever the footer says,
    * /root/reference/app.py:93). Driver testdata has shipped `ts` as both
    * TIMESTAMP(NANOS) (rounds 1-9) and timestamp[us] (round 10+), so we
    * branch on the resolved type instead of assuming either:
    *   - nanos (surfaces as LongType under the legacy conf, since Spark's
    *     reader rejects TIMESTAMP(NANOS) outright, [PARQUET_TYPE_ILLEGAL]):
    *     integer-div truncate to µs, exactly what the DuckDB oracle does via
    *     `make_timestamp(epoch_ns(ts) // 1000)`;
    *   - µs TIMESTAMP_NTZ: cast to session-UTC TimestampType — value-identity
    *     because every entry point pins spark.sql.session.timeZone=UTC;
    *   - µs TIMESTAMP_LTZ: already the output type, pass through.
    * All three branches yield the same output schema (TimestampType) the
    * oracle has hash-matched since round 1.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Scope the legacy conf to schema resolution: parquet schema conversion
    // consults it eagerly inside spark.read.parquet(), and the physical scan
    // captures its own SQLConf snapshot at planning, so restoring the prior
    // value here cannot flip an events frame already built — and later reads
    // of OTHER nanos-typed parquet in the same session fail loudly again.
    // The conf only affects TIMESTAMP(NANOS) columns; µs footers ignore it.
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val raw = spark.read.parquet(s"$dir/events.parquet")
      val ts = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          timestamp_micros(expr("ts div 1000")) // nanos footer, legacy long
        case org.apache.spark.sql.types.TimestampNTZType =>
          col("ts").cast("timestamp") // µs NTZ → session-UTC, same micros
        case org.apache.spark.sql.types.TimestampType =>
          col("ts")
        case other =>
          throw new IllegalStateException(
            s"events.ts: unsupported parquet-resolved type $other")
      }
      raw
        .withColumn("ts", ts)
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
