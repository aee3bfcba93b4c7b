package graft

import org.apache.spark.sql.functions._

/** Adaptive-execution behaviors the 100 TB story leans on: AQE splitting a
  * skewed join partition at runtime, and runtime bloom-filter pruning of a
  * large scan from a selective join side. Locally these need the byte
  * thresholds scaled down (the mechanisms are size-triggered); the asserts
  * pin that the engine's plans LET the machinery fire — no conf or plan
  * shape of ours suppresses it.
  */
class AdaptiveSpec extends SparkSpec {
  import spark.implicits._

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val prior = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits the skewed partition of a sort-merge join") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2") {
      // hot key 0 carries ~half the left side with a fat payload; the right
      // side is uniform — the classic shape that stalls one reducer
      val left = spark.range(0, 20000)
        .select(when(col("id") % 2 === 0, 0L).otherwise(col("id") % 97).as("k"),
          concat(lit("x" * 200), col("id")).as("payload"))
      val right = spark.range(0, 97).select(col("id").as("rk"), col("id").as("rv"))
      val joined = left.join(right, col("k") === col("rk"))
      // execute THIS frame (count() would plan a separate query execution
      // and leave joined's adaptive plan unfinalized)
      assert(joined.collect().length == 20000)
      val plan = joined.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(plan.contains("skew=true"), s"AQE did not mark the skew split:\n$plan")
    }
  }

  test("runtime bloom filter from the selective side prunes the fact scan") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // selective filter on orders; lineitem is the large application side
      val o = Tables.orders(spark, sfDir).filter(col("o_totalprice") > 50000.0)
      val l = Tables.lineitem(spark, sfDir)
      val j = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()
      j.collect()
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n$plan")
    }
  }
}
