package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

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
}
