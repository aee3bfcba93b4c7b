package graft.operators

import org.apache.spark.sql.DataFrame
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
  */
private[operators] object Materialize {
  def apply(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    df
  }
}
