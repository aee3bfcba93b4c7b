package graft

import org.apache.spark.sql.functions._

/** Physical-layout levers that matter at fleet scale: hive-style partitioned
  * writes must prune at the scan (read only matching directories), and
  * bucketed tables must co-locate equi-joins (no shuffle exchange).
  */
class PartitionBucketSpec extends SparkSpec {

  private lazy val tmp = java.nio.file.Files.createTempDirectory("graft-layout").toString

  test("partitionBy write prunes partitions on a filtered read") {
    val path = s"$tmp/orders_by_status"
    Tables.orders(spark, sfDir).write
      .mode("overwrite").partitionBy("o_orderstatus").parquet(path)

    val read = spark.read.parquet(path).filter(col("o_orderstatus") === "F")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus"), plan)

    // pruning is real: fewer files scanned than exist across all partitions
    val scanned = read.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.totalNumberOfFiles }
    def parquetFiles(d: java.io.File): Long =
      Option(d.listFiles()).getOrElse(Array.empty).map { f =>
        if (f.isDirectory) parquetFiles(f)
        else if (f.getName.endsWith(".parquet")) 1L else 0L
      }.sum
    val allFiles = parquetFiles(new java.io.File(path))
    val allParts = new java.io.File(path).listFiles().count(_.getName.startsWith("o_orderstatus="))
    assert(allParts >= 2) // multiple status partitions exist on disk
    assert(scanned.exists(n => n >= 1 && n < allFiles), s"scanned=$scanned of $allFiles")
    val expected = Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "F").count()
    assert(read.count() == expected)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    Tables.orders(spark, sfDir).write
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$tmp/orders_bkt").saveAsTable("orders_bkt")
    Tables.lineitem(spark, sfDir).write
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$tmp/lineitem_bkt").saveAsTable("lineitem_bkt")

    // tables this small would broadcast (bucketing then irrelevant);
    // disable it to surface the co-located shuffle-free plan under test
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prior = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val joined = spark.table("orders_bkt").join(
        spark.table("lineitem_bkt"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan) // co-located: no shuffle
      assert(joined.count() ==
        Tables.orders(spark, sfDir).join(
          Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey")).count())
    } finally spark.conf.set(key, prior)
  }
}
