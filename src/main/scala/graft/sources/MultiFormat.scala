package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Multi-format source/sink surface: parquet, ORC, CSV, JSON through one
  * call. The reference reads exactly one format (Parquet, app.py:93) and
  * writes exactly one sink; a general engine needs the rest of the lake
  * formats, and Spark's DataFrameReader/Writer gives them with the same
  * distributed scan/write machinery (splittable reads for csv/json lines,
  * columnar + predicate pushdown for parquet/orc).
  *
  * Text formats are schema-carried, not schema-embedded: `read` requires the
  * caller's StructType so timestamps and doubles round-trip exactly (CSV/JSON
  * inference would re-derive wider/different types). Binary columns don't
  * survive CSV/JSON — callers keep media payloads on the columnar formats.
  */
object MultiFormat {

  /** Formats ordered by preference for analytical data at scale. */
  val formats: Seq[String] = Seq("parquet", "orc", "csv", "json")

  private val tsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  def write(df: DataFrame, path: String, format: String): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    format match {
      case "csv" =>
        w.option("header", "true").option("timestampFormat", tsFormat).csv(path)
      case "json" =>
        w.option("timestampFormat", tsFormat).json(path)
      case "orc"     => w.orc(path)
      case "parquet" => w.parquet(path)
      case other     => throw new IllegalArgumentException(s"unsupported format: $other")
    }
  }

  def read(spark: SparkSession, path: String, format: String, schema: StructType): DataFrame =
    format match {
      case "csv" =>
        spark.read.schema(schema)
          .option("header", "true").option("timestampFormat", tsFormat).csv(path)
      case "json" =>
        spark.read.schema(schema).option("timestampFormat", tsFormat).json(path)
      case "orc"     => spark.read.schema(schema).orc(path)
      case "parquet" => spark.read.schema(schema).parquet(path)
      case other     => throw new IllegalArgumentException(s"unsupported format: $other")
    }

  /** Quarantined ingest for semi-structured sources: malformed records land
    * whole in a `_corrupt_record` column instead of failing the job — at
    * fleet scale one bad line in a 100 TB load must not kill it, and the
    * quarantine column is what lets a later pass re-parse or discard the
    * bad rows with full provenance.
    */
  def readQuarantined(
      spark: SparkSession, path: String, format: String, schema: StructType): DataFrame = {
    val full = StructType(schema.fields :+ StructField("_corrupt_record", StringType))
    val r = spark.read.schema(full)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("timestampFormat", tsFormat)
    format match {
      case "csv"  => r.option("header", "true").csv(path)
      case "json" => r.json(path)
      case other  => throw new IllegalArgumentException(s"quarantine read is for csv/json, not $other")
    }
  }

  /** Schema-evolution read: parquet written by successive pipeline versions
    * (columns added over time) reads as the merged superset, with rows from
    * older files null in the new columns — `mergeSchema` reconciles the
    * footers so an additive schema change never requires a rewrite.
    */
  def readEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
}
