package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-parallelism floor for heavy single-pass aggregations (guide §2.5
  * "input skew: one huge unsplittable file ... repartition immediately after
  * the read").
  *
  * The driver test tables are single-row-group parquet files, so a scan
  * yields ONE task no matter how many cores the session has — and a
  * compute-heavy first pass (the d² Gram census, the 4-sketch column
  * profile) serializes on it. At fleet scale the same shape appears when an
  * upstream writer emits one giant unsplittable file.
  *
  * The repartition is CONDITIONAL on the scan actually being narrower than
  * the session's parallelism: when the source already splits into >= cores
  * partitions (any real 100 TB table), this is a no-op and the "corpus
  * never shuffles" contract of the census passes is preserved. Only
  * under-parallel inputs pay the one spreading shuffle, which is then
  * strictly cheaper than computing the pass serially.
  *
  * Round-robin repartition is deterministic-safe here because every
  * consumer is an order-independent aggregation (integer-grid sums, HLL
  * registers, min/max): task retry re-draws assignments but cannot change
  * any aggregate.
  */
private[graft] object Spread {
  def apply(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
