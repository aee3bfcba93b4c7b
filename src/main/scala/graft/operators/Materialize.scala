package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Fault-tolerant multi-branch materialization.
  *
  * Several operators compute an expensive small table once and read it from
  * multiple plan branches (a signature table feeding both sides of a
  * self-join, a candidate list feeding a pair join AND a semi-join
  * pushdown). `localCheckpoint` did that job through round 3, but its
  * blocks live only on executors with lineage truncated — at fleet scale
  * one lost executor makes the frame unrecoverable and fails the whole
  * job (the same defect the round-3 verdict flagged for the cluster
  * loop). `persist` keeps lineage, so a lost partition recomputes instead
  * of failing; the explicit count forces population so join branches read
  * the cache rather than racing to compute it. MEMORY_AND_DISK: these
  * frames are small (digests/keys, not corpus text), spill is the safety
  * valve, not the norm.
  *
  * Lifecycle: every persisted frame is tracked per session, and
  * [[releaseAll]] unpersists everything a session has accumulated — the
  * cleanup hook for long-lived sessions that invoke many builders
  * (Verify calls it after every query; a production caller should call it
  * once the query's results are materialized downstream). Without it the
  * cached frames stay registered in the session CacheManager for the
  * session's lifetime.
  */
private[graft] object Materialize {
  private val tracked =
    new java.util.concurrent.ConcurrentHashMap[SparkSession,
      java.util.concurrent.ConcurrentLinkedQueue[DataFrame]]()

  def apply(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    track(df)
  }

  /** Record an already-persisted frame for session-scoped release. */
  def track(df: DataFrame): DataFrame = {
    tracked
      .computeIfAbsent(df.sparkSession,
        _ => new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]())
      .add(df)
    df
  }

  /** Unpersist every frame this session materialized through this object.
    * Non-blocking: the block eviction proceeds asynchronously. Safe to call
    * at any point after the downstream results are materialized; frames
    * rebuilt later simply re-persist.
    */
  def releaseAll(spark: SparkSession): Unit = {
    val q = tracked.remove(spark)
    if (q != null) q.forEach(df => { df.unpersist(blocking = false); () })
  }
}
