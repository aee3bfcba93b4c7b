package graft

import graft.operators.Convert
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Unit + property coverage of the reference-parity transforms (FIXTURES.md §B):
  * sanitize O4 (/root/reference/app.py:42-52), type-normalize O5 (app.py:27-40).
  */
class ConvertSpec extends SparkSpec {

  private def sanitizeFixture = {
    val schema = StructType(Seq(
      StructField("d", DoubleType), StructField("f", FloatType),
      StructField("i", LongType), StructField("s", StringType),
      StructField("b", BooleanType), StructField("t", TimestampType)))
    val rows = Seq(
      Row(1.5d, 2.5f, 7L, "a", true, new Timestamp(0L)),
      Row(Double.NaN, Float.NaN, null, null, null, null),
      Row(Double.PositiveInfinity, Float.PositiveInfinity, -3L, "NaN", false, new Timestamp(1000L)),
      Row(Double.NegativeInfinity, null, 0L, "", true, null),
      Row(null, -0.0f, 9L, "inf", false, new Timestamp(-1L)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  test("sanitize zeroes NaN/Inf/null in numeric columns only") {
    val out = Convert.sanitizeNumeric(sanitizeFixture).collect()
    val d = out.map(_.getDouble(0))
    assert(d.toSeq == Seq(1.5, 0.0, 0.0, 0.0, 0.0))
    val f = out.map(_.getFloat(1))
    assert(f.toSeq == Seq(2.5f, 0.0f, 0.0f, 0.0f, -0.0f))
    val i = out.map(_.getLong(2))
    assert(i.toSeq == Seq(7L, 0L, -3L, 0L, 9L))
    // non-numerics untouched, including nulls
    assert(out.map(r => Option(r.get(3))).toSeq ==
      Seq(Some("a"), None, Some("NaN"), Some(""), Some("inf")))
    assert(out.count(_.isNullAt(4)) == 1)
    assert(out.count(_.isNullAt(5)) == 2)
  }

  test("sanitize is idempotent and leaves no null/NaN/Inf numerics") {
    val once = Convert.sanitizeNumeric(sanitizeFixture)
    val twice = Convert.sanitizeNumeric(once)
    assert(once.collect().toSeq == twice.collect().toSeq)
    val bad = once.filter(
      col("d").isNull || isnan(col("d")) || col("d") === Double.PositiveInfinity ||
        col("f").isNull || isnan(col("f")) || col("i").isNull)
    assert(bad.count() == 0)
  }

  private def typemapFixture = {
    val schema = StructType(Seq(
      StructField("i8", ByteType), StructField("i16", ShortType),
      StructField("i32", IntegerType), StructField("i64", LongType),
      StructField("f", FloatType), StructField("b", BooleanType),
      StructField("t", TimestampType), StructField("dec", DecimalType(10, 2)),
      StructField("dt", DateType), StructField("arr", ArrayType(IntegerType)),
      StructField("m", MapType(StringType, IntegerType)),
      StructField("st", StructType(Seq(StructField("a", IntegerType))))))
    val rows = Seq(
      Row(Byte.MaxValue, Short.MinValue, Int.MaxValue, Long.MinValue, 1.5f, true,
        new Timestamp(42L), new java.math.BigDecimal("12345678.90"),
        java.sql.Date.valueOf("2024-01-31"), Seq(1, 2), Map("k" -> 1), Row(7)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  test("normalize widens ints to long, float to double, exotic to string") {
    val out = Convert.normalizeTypes(typemapFixture)
    val types = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(Seq("i8", "i16", "i32", "i64").forall(types(_) == LongType))
    assert(types("f") == DoubleType)
    assert(types("b") == BooleanType)
    assert(types("t") == TimestampType)
    assert(Seq("dec", "dt", "arr", "m", "st").forall(types(_) == StringType))
    val r = out.collect().head
    // widening preserves integral values exactly
    assert(r.getLong(0) == Byte.MaxValue.toLong)
    assert(r.getLong(1) == Short.MinValue.toLong)
    assert(r.getLong(2) == Int.MaxValue.toLong)
    assert(r.getLong(3) == Long.MinValue)
    assert(r.getDouble(4) == 1.5d)
  }

  test("normalize is idempotent") {
    val once = Convert.normalizeTypes(typemapFixture)
    val twice = Convert.normalizeTypes(once)
    assert(once.schema == twice.schema)
    assert(once.collect().toSeq == twice.collect().toSeq)
  }

  test("pipeline on real lineitem widens l_linenumber and keeps row count") {
    val df = Tables.lineitem(spark, sfDir)
    val out = Convert.pipeline(df)
    assert(out.schema("l_linenumber").dataType == LongType)
    assert(out.schema("l_quantity").dataType == DoubleType)
    assert(out.count() == df.count())
  }
}
