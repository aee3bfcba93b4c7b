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
}
