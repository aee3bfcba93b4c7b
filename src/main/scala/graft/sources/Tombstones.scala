package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deletion (takedown) support for the persisted index families — the
  * retraction half of the build / append / compact lifecycle (reference
  * anchor: even the 249-line reference deletes its artifacts per lifecycle,
  * `app.py:148-155,215`; at corpus scale the driver is GDPR/takedown
  * requests, which cannot wait for a full index rebuild).
  *
  * Design (the classic LSM/tombstone shape, cf. FreshDiskANN for the ANN
  * variant): deletions are recorded as an id set in a SIDECAR parquet
  * directory beside the index (`<path>_tombstones` — the same
  * move-invariant anchor as the postings stats sidecar, so compaction's
  * catalog-location swap never orphans it). Probes anti-join the sidecar
  * against the index scan with the TOMBSTONE SIDE BROADCAST: the standing
  * index is never shuffled, and the per-probe overhead is one broadcast of
  * the takedown set (small relative to any corpus — a deployment that
  * accumulates millions of tombstones is overdue for the compaction that
  * folds them in). Compaction physically drops tombstoned rows during its
  * rewrite and clears the sidecar — after it, the index equals a fresh
  * build over the surviving corpus.
  *
  * Correctness under deletion of derived statistics:
  *   - probe-time stats (winnow df cap, postings df, phash/band candidate
  *     sets) are derived AFTER the anti-join, so they are exact for the
  *     surviving corpus by construction — deletion can both shrink df and
  *     RE-ADMIT a previously df-capped key (pinned in WinnowSpec);
  *   - stored 1-row corpus stats (postings n_docs/tt) are decremented at
  *     delete time by the deleted rows' own contribution (computed from the
  *     index before the tombstone lands);
  *   - any stored upper bounds derived from maxima stay upper-bound-SAFE
  *     (stale-larger) under deletion and are recomputed exactly at the next
  *     compaction.
  *
  * The sidecar is APPEND-only between compactions (each delete writes new
  * part files; readers take the distinct union), so concurrent deletes
  * never read-modify-write each other, and deleting an id twice is
  * idempotent. Re-using a deleted id in a later append is NOT supported
  * until a compaction has folded the tombstone in — the append paths fail
  * loudly on the collision rather than silently resurrecting or
  * re-suppressing rows.
  */
object Tombstones {

  /** Sidecar directory for an index's tombstone set. Path-based indexes
    * (IVF, k-NN graph) anchor on their data path; catalog-table indexes
    * anchor on the table's CURRENT location ([[tableLocation]]) — coherent
    * across compactions because a compaction both moves the location and
    * clears the sidecar (tombstones never outlive the files they mask).
    */
  def sidecar(indexPath: String): String =
    indexPath.stripSuffix("/") + "_tombstones"

  /** A catalog-table index's current data location — the sidecar anchor
    * for the bucketed families (postings, winnow, band, phash).
    */
  def tableLocation(s: SparkSession, table: String): String =
    s.sessionState.catalog
      .getTableMetadata(s.sessionState.sqlParser.parseTableIdentifier(table))
      .location.toString

  /** [[add]] for a catalog-table index. */
  def addForTable(s: SparkSession, table: String, ids: Seq[Long]): Unit =
    add(s, tableLocation(s, table), ids)

  /** The tombstone-filtered scan of a catalog-table index — what every
    * probe reads in place of `s.table(table)`.
    */
  def filterTable(s: SparkSession, table: String, idCol: String): DataFrame =
    filter(s.table(table), tableLocation(s, table), idCol)

  /** The distinct tombstoned ids of a catalog-table index, if any. */
  def idSetForTable(s: SparkSession, table: String): Option[DataFrame] =
    idSet(s, tableLocation(s, table))

  /** Record `ids` as deleted. Append-only: one new parquet fragment per
    * call, distinct-ed at read time, so repeated/concurrent deletes are
    * idempotent and never rewrite standing tombstones.
    */
  def add(s: SparkSession, indexPath: String, ids: Seq[Long]): Unit = {
    require(ids.nonEmpty, "Tombstones.add: empty id set")
    import s.implicits._
    ids.toDF("id").write.mode("append").parquet(sidecar(indexPath))
  }

  /** The distinct tombstoned id set, or None when nothing was ever
    * deleted (the common case — probes pay nothing).
    */
  def idSet(s: SparkSession, indexPath: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(sidecar(indexPath))
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(s.read.parquet(sidecar(indexPath)).select("id").distinct())
    else None
  }

  /** Drop tombstoned rows from an index scan: broadcast anti-join on
    * `idCol` — the index side keeps its bucketing/partitioning (no
    * exchange), and with no sidecar present the frame passes through
    * untouched (zero plan overhead for never-deleted indexes).
    */
  def filter(df: DataFrame, indexPath: String, idCol: String): DataFrame =
    idSet(df.sparkSession, indexPath) match {
      case Some(t) =>
        df.join(broadcast(t.withColumnRenamed("id", idCol)), Seq(idCol), "left_anti")
      case None => df
    }

  /** Drop the sidecar (called by compaction after the physical rewrite no
    * longer contains the tombstoned rows).
    */
  def clear(s: SparkSession, indexPath: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(sidecar(indexPath))
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    ()
  }

  /** Compact a bucketed catalog-table index, folding tombstones in — the
    * one rewrite all four bucketed families (postings/term, winnow/fp,
    * MinHash band/bk, phash band/bk) share. Mechanics mirror the original
    * postings compaction: repartition on the DERIVED bucket id (hash pmod
    * n — repartitioning on the bucket column itself pattern-matches the
    * bucket spec and the planner elides the shuffle, leaving one file per
    * task per bucket), AQE scoped off so its partition merging can't
    * re-break the alignment, write to a fresh location, swap via catalog
    * rename, reclaim the superseded directory, then clear the sidecar.
    * After this, the table is byte-equivalent to a fresh build over the
    * surviving rows: one file per bucket, no tombstones outstanding.
    */
  /** Fold tombstones into a FLAT parquet index directory (PQ/SQ code
    * tables, the RP sketch): rewrite minus the tombstoned rows, swap the
    * directory in atomically (same FS-rename caveat as the IVF compactor
    * — not object-store-safe), clear the sidecar. `anchorPath` is the
    * index's sidecar anchor, which may be a PARENT of `dataPath` (PQ/SQ
    * anchor at the index root beside codes/codebook) — only call this for
    * the one component that carries per-vector rows, or tombstones would
    * clear before every component folded.
    */
  def compactFlat(
      s: SparkSession, dataPath: String, anchorPath: String, idCol: String): Unit = {
    val tmpPath = s"${dataPath}__compact"
    filter(s.read.parquet(dataPath), anchorPath, idCol)
      .write.mode("overwrite").parquet(tmpPath)
    val conf = s.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dataPath)
    val tp = new org.apache.hadoop.fs.Path(tmpPath)
    val fs = p.getFileSystem(conf)
    val old = new org.apache.hadoop.fs.Path(s"${dataPath}__old")
    require(fs.rename(p, old), s"compactFlat: could not move $dataPath aside")
    require(fs.rename(tp, p), s"compactFlat: could not swap $tmpPath into place")
    fs.delete(old, true)
    clear(s, anchorPath)
  }

  def compactBucketedIndex(s: SparkSession, table: String, idCol: String): Unit = {
    val ident = s.sessionState.sqlParser.parseTableIdentifier(table)
    val meta = s.sessionState.catalog.getTableMetadata(ident)
    val spec = meta.bucketSpec.getOrElse(
      throw new IllegalArgumentException(
        s"compactBucketedIndex: $table has no bucket spec"))
    val nb = spec.numBuckets
    val bcol = spec.bucketColumnNames.head
    val cur = meta.location.toString
    val dest = cur.stripSuffix("/") + "__c"
    val aqeKey = "spark.sql.adaptive.enabled"
    val prior = s.conf.get(aqeKey)
    s.conf.set(aqeKey, "false")
    try {
      val compacted = filter(s.table(table), cur, idCol)
        .repartition(nb, expr(s"pmod(hash($bcol), $nb)"))
      s.sql(s"DROP TABLE IF EXISTS ${table}__c")
      val w = compacted.write.mode("overwrite").bucketBy(nb, bcol)
      spec.sortColumnNames.headOption
        .fold(w)(sc => w.sortBy(sc, spec.sortColumnNames.tail: _*))
        .option("path", dest)
        .saveAsTable(s"${table}__c")
    } finally s.conf.set(aqeKey, prior)
    s.sql(s"DROP TABLE $table")
    s.sql(s"ALTER TABLE ${table}__c RENAME TO $table")
    // DROP TABLE on an external table leaves files behind — reclaim them
    val oldLoc = new org.apache.hadoop.fs.Path(cur)
    oldLoc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(oldLoc, true)
    // the rewrite no longer contains the tombstoned rows: drop the sidecar
    // (anchored at the OLD location — the new location starts clean)
    clear(s, cur)
  }
}
