package graft

import graft.sources.MultiFormat

/** Every supported lake format must round-trip the orders table exactly
  * (schema-carried reads: no inference drift on timestamps/doubles).
  */
class MultiFormatSpec extends SparkSpec {

  test("orders round-trips exactly through parquet, orc, csv, json") {
    val orders = Tables.orders(spark, sfDir)
    val want = orders.orderBy("o_orderkey").collect().toSeq
    val tmp = java.nio.file.Files.createTempDirectory("graft-formats").toString
    MultiFormat.formats.foreach { fmt =>
      val path = s"$tmp/orders-$fmt"
      MultiFormat.write(orders, path, fmt)
      val got = MultiFormat.read(spark, path, fmt, orders.schema)
        .orderBy("o_orderkey").collect().toSeq
      assert(got == want, s"round-trip mismatch for $fmt")
    }
  }

  test("unsupported format fails loudly") {
    val orders = Tables.orders(spark, sfDir)
    intercept[IllegalArgumentException] {
      MultiFormat.write(orders, "/tmp/never", "avro")
    }
  }

  test("quarantined csv ingest captures malformed rows instead of failing") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-quarantine").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/data.csv"),
      "id,qty\n1,10\n2,not_a_number\n3,30\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("qty", LongType)))
    val df = MultiFormat.readQuarantined(spark, dir, "csv", schema)
      .cache() // PERMISSIVE corrupt capture is per-scan; cache for stable asserts
    assert(df.filter(col("_corrupt_record").isNull).count() == 2)
    val bad = df.filter(col("_corrupt_record").isNotNull).collect()
    assert(bad.length == 1 && bad.head.getAs[String]("_corrupt_record").contains("not_a_number"))
    df.unpersist()
  }

  test("mergeSchema reads additive schema evolution without a rewrite") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 0.5)).toDF("id", "name", "score")
      .write.mode("append").parquet(dir)
    val df = MultiFormat.readEvolved(spark, dir)
    assert(df.columns.toSet == Set("id", "name", "score"))
    assert(df.count() == 3)
    // rows from the pre-evolution files surface the new column as null
    assert(df.filter(col("score").isNull).count() == 2)
  }
}
