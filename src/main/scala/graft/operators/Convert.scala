package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-parity single-table conversion transforms.
  *
  * The reference's entire data-processing capability is a chunked
  * Parquet→Hyper ETL (see SURVEY.md §0): a type-mapping projection
  * (/root/reference/app.py:27-40, `get_hyper_type`) and a numeric sanitize
  * projection (/root/reference/app.py:42-52, `clean_data`). Here both are
  * schema-driven generated projections — single narrow `select`s that stay
  * inside whole-stage codegen and push no shuffle; at 100 TB this is a pure
  * map stage, embarrassingly parallel across input splits.
  */
object Convert {

  /** Type normalization (app.py:27-40): widen all integers to 64-bit,
    * floats to double, keep bool/timestamp, stringify everything else
    * ("Mixed columns are treated as text", app.py:184). Idempotent & total.
    */
  def normalizeTypes(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      val c = col(f.name)
      val out = f.dataType match {
        case ByteType | ShortType | IntegerType | LongType => c.cast(LongType)
        case FloatType | DoubleType                        => c.cast(DoubleType)
        case BooleanType                                   => c
        case TimestampType | TimestampNTZType              => c.cast(TimestampType)
        case _: DecimalType                                => c.cast(StringType)
        case _                                             => c.cast(StringType)
      }
      out.as(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Numeric sanitize (app.py:42-52): for every numeric column replace
    * ±Inf, NaN and null with 0; non-numeric columns pass through. Idempotent;
    * output numerics are never null/NaN/Inf.
    */
  def sanitizeNumeric(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      val c = col(f.name)
      f.dataType match {
        case DoubleType | FloatType =>
          when(
            c.isNull || isnan(c) ||
              c === lit(Double.PositiveInfinity) || c === lit(Double.NegativeInfinity),
            lit(0d).cast(f.dataType)
          ).otherwise(c).as(f.name)
        case _: NumericType => coalesce(c, lit(0).cast(f.dataType)).as(f.name)
        case _              => c
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** The full reference pipeline: normalize then sanitize — equivalent to one
    * pass of app.py:109-131 minus the Hyper sink (see [[graft.sources.Sink]]).
    */
  def pipeline(df: DataFrame): DataFrame = sanitizeNumeric(normalizeTypes(df))

  /** Oracle-side projection for one column, mirroring pipeline() semantics in
    * DuckDB SQL. `isfinite` is false for NaN/±Inf; CASE's ELSE catches NULL.
    */
  def oracleColumnSql(name: String, dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      s"CAST(COALESCE($name, 0) AS BIGINT) AS $name"
    case FloatType | DoubleType =>
      s"CAST(CASE WHEN isfinite($name) THEN $name ELSE 0 END AS DOUBLE) AS $name"
    case BooleanType | TimestampType | TimestampNTZType => s"$name AS $name"
    case _                                              => s"CAST($name AS VARCHAR) AS $name"
  }
}
