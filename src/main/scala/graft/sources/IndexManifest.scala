package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Single-pointer commit manifest shared by every persisted index family —
  * the poor-man's transaction log that makes each lifecycle mutation
  * (delete, stats advance, compaction) ALL-or-NOTHING (reference anchor:
  * the reference's per-run artifact lifecycle cannot be observed
  * half-committed, `app.py:148-155`).
  *
  * Mechanics (the Delta-log shape, scaled down to one pointer): beside an
  * index anchor lives `<anchor>_manifest/` holding immutable version files
  * `v000…N`. Each file is a complete epoch: the index's current data
  * directory, current stats directory, and the list of live tombstone
  * fragments. Writers PREPARE everything under fresh names (a new stats
  * dir, a new tombstone fragment, a compacted data dir) — none of which
  * any reader resolves yet — then commit by writing ONE new version file
  * (temp file + single-FILE rename-without-overwrite; unlike the directory
  * swaps this replaces, a one-file pointer is a primitive every store can
  * land in one step). Readers list the manifest dir and resolve
  * through the HIGHEST version. A crash anywhere before the pointer lands
  * leaves readers on the previous epoch — internally consistent by
  * construction, because no epoch ever references half of a mutation: the
  * prepared files are unreferenced garbage, and re-running the mutation
  * reads the OLD epoch's state, so retries are safe (the
  * deleteFromSearchIndex double-decrement hazard is structurally gone —
  * stats decrement and tombstone land in the same pointer).
  *
  * Writer discipline is SINGLE-writer per index (the standing lifecycle
  * assumption); a lost race surfaces loudly — the version file the loser
  * tries to commit already exists — never as silent last-writer-wins.
  *
  * An index with no manifest resolves everything to its build-time
  * defaults (data at the build path, stats at `<path>_stats`, no
  * tombstones) — a never-mutated index pays nothing, and builders reset
  * the manifest so a rebuild starts clean.
  */
object IndexManifest {

  /** One committed epoch of an index's state. `data`/`stats` of None mean
    * "the build-time default location"; `tombstones` lists the live
    * fragment directories and `deltas` the live buffered-update batch
    * directories, in commit order (both empty after a compaction folds
    * them in). `baseGen` counts BASE-GENERATION changes — mutations that
    * touch or supersede standing data files (appends, compactions) rather
    * than layering over them (deletes, buffered updates): as-of reads are
    * exact only within one generation, so they compare generations and
    * fail loudly across the boundary. `ingestHwm` is the streaming-ingest
    * high-water mark: the highest micro-batch id whose rows are committed,
    * PAIRED with `ingestStream`, the lineage that produced it (the
    * checkpoint identity — Spark batch ids are monotone only WITHIN one
    * checkpoint). Within the recorded lineage, foreachBatch replays only
    * an already-processed prefix, so `batchId <= ingestHwm` is the
    * complete replay test — it rides through every later mutation
    * INCLUDING compaction (which folds the delta rows into the base), so
    * a replay arriving after the fold still skips instead of re-inserting.
    * A DIFFERENT lineage restarts batch ids from 0 and is indistinguishable
    * from new data at the id level, so the ingest paths REFUSE it loudly
    * (silently fencing it would drop never-ingested documents).
    */
  final case class Epoch(
      version: Long,
      data: Option[String],
      stats: Option[String],
      tombstones: Vector[String],
      deltas: Vector[String] = Vector.empty,
      baseGen: Long = 0L,
      ingestHwm: Option[Long] = None,
      ingestStream: Option[String] = None)

  /** TEST HOOK — crash injection at the atomicity boundary: when set, the
    * next [[commit]] throws AFTER every prepared file is durable but
    * BEFORE the version pointer lands, simulating a writer dying at the
    * worst possible instant. TombstoneSpec uses it to prove probes stay on
    * the previous consistent epoch.
    */
  @volatile private[graft] var failNextCommit: Boolean = false

  /** TEST HOOK — crash injection at the Nth commit of a MULTI-commit
    * mutation (a compaction's pre-swap generation bump is commit 1, its
    * tombstone-clearing epoch commit 2; an append's bump is commit 1, its
    * stats advance commit 2): counts down on every commit and throws when
    * it reaches zero, letting TombstoneSpec stage the mid-mutation states
    * (bump landed, physical step or follow-up commit missing) and prove
    * they are loud or consistent, never silently wrong. Negative = off.
    */
  @volatile private[graft] var failCommitCountdown: Int = -1

  def dir(anchor: String): String = anchor.stripSuffix("/") + "_manifest"

  private def fileName(version: Long): String = f"v$version%012d"

  private def fs(s: SparkSession, p: Path) =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  /** The current epoch, or None for a never-mutated (or freshly reset)
    * index. One listStatus + one small-file read — control-plane cost.
    */
  def current(s: SparkSession, anchor: String): Option[Epoch] = {
    val d = new Path(dir(anchor))
    val f = fs(s, d)
    if (!f.exists(d)) None
    else {
      val versions = f.listStatus(d).toSeq
        .map(_.getPath.getName)
        .filter(_.matches("v\\d{12}"))
      if (versions.isEmpty) None
      else {
        val top = versions.max // zero-padded: lexicographic max = numeric max
        val in = f.open(new Path(d, top))
        val body =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        Some(parse(top.drop(1).toLong, body))
      }
    }
  }

  /** A SPECIFIC committed epoch — the as-of half of the manifest: because
    * every version file is immutable and complete, reading an index "as
    * of epoch v" is just resolving through v's pointer instead of the
    * highest one. Returns None for version 0 (the build state, before any
    * mutation); throws loudly if the version was never committed.
    * Soundness horizon (documented at the probe entry points): an as-of
    * read is exact across DELETE and BUFFERED-UPDATE epochs — mutations
    * that never touch standing files — and ends at any append/compaction
    * (which mutate or supersede the base generation) or at a [[Tombstones
    * .vacuum]] (which reclaims superseded epochs' files).
    */
  def at(s: SparkSession, anchor: String, version: Long): Option[Epoch] = {
    if (version == 0L) None
    else {
      val d = new Path(dir(anchor))
      val f = fs(s, d)
      val p = new Path(d, fileName(version))
      require(f.exists(p),
        s"IndexManifest.at: epoch $version of $anchor was never committed " +
          "(or its version file was removed)")
      val in = f.open(p)
      val body =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      Some(parse(version, body))
    }
  }

  /** Every committed epoch in version order — the index's mutation log
    * (the DESCRIBE-HISTORY read): version files are immutable and
    * complete, so the history is just parsing each one. Control-plane
    * cost: one listStatus + one small read per epoch.
    */
  def history(s: SparkSession, anchor: String): Seq[Epoch] = {
    val d = new Path(dir(anchor))
    val f = fs(s, d)
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).toSeq
      .map(_.getPath.getName)
      .filter(_.matches("v\\d{12}"))
      .sorted
      .map { name =>
        val in = f.open(new Path(d, name))
        val body =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        parse(name.drop(1).toLong, body)
      }
  }

  /** Template for the next epoch: the current state with the version
    * advanced (v1 from nothing). Writers copy-modify it and [[commit]].
    */
  def next(s: SparkSession, anchor: String): Epoch =
    current(s, anchor)
      .map(e => e.copy(version = e.version + 1))
      .getOrElse(Epoch(1L, None, None, Vector.empty, Vector.empty, 0L))

  /** Land `e` as the new current epoch — the single atom of every
    * lifecycle mutation. Fails loudly (never overwrites) if `e.version`
    * was already committed, surfacing a violated single-writer assumption.
    */
  def commit(s: SparkSession, anchor: String, e: Epoch): Unit = {
    val d = new Path(dir(anchor))
    val f = fs(s, d)
    if (!f.exists(d)) f.mkdirs(d)
    val dest = new Path(d, fileName(e.version))
    require(!f.exists(dest),
      s"IndexManifest.commit: epoch ${e.version} of $anchor already exists — " +
        "concurrent writer detected (the lifecycle is single-writer per index)")
    if (failNextCommit) {
      failNextCommit = false
      throw new RuntimeException(
        s"IndexManifest: injected crash before committing epoch ${e.version} of $anchor")
    }
    if (failCommitCountdown >= 0) {
      failCommitCountdown -= 1
      if (failCommitCountdown < 0)
        throw new RuntimeException(
          s"IndexManifest: injected crash before committing epoch ${e.version} of $anchor")
    }
    // writer-unique tmp name: two racers sharing one tmp path could
    // otherwise interleave (one overwrites the other's content before
    // either renames) and land the WRONG epoch body under the version
    val tmp = new Path(d,
      s".tmp_${fileName(e.version)}_${java.util.UUID.randomUUID().toString.take(8)}")
    val out = f.create(tmp, true)
    try out.write(serialize(e).getBytes("UTF-8"))
    finally out.close()
    // FileContext.rename without the OVERWRITE option is the landing
    // primitive: it throws if dest appeared since the check above, so a
    // concurrent race surfaces loudly — a plain FileSystem.rename on the
    // local FS maps to POSIX rename(2), which would silently replace the
    // winner's epoch. Guarantee scope (store-dependent): on HDFS this
    // rename is ATOMIC-exclusive (namenode-arbitrated); on the local
    // AbstractFileSystem it is a client-side exists check + POSIX rename,
    // so a true simultaneous race could in principle interleave — safe
    // here only under the documented single-writer-per-index discipline;
    // on object stores rename is a non-atomic copy, so a deployment there
    // must swap this landing step for the store's conditional
    // (if-absent) put, which is the same one-pointer primitive.
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      d.toUri, s.sparkContext.hadoopConfiguration)
    try fc.rename(tmp, dest)
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException |
          _: org.apache.hadoop.fs.ParentNotDirectoryException =>
        try f.delete(tmp, false) catch { case _: java.io.IOException => () }
        throw new IllegalArgumentException(
          s"IndexManifest.commit: epoch ${e.version} of $anchor already exists — " +
            "concurrent writer detected (the lifecycle is single-writer per index)")
    }
  }

  /** The as-of guard: a travel target whose base generation differs from
    * the live one would silently mix standing data from one generation
    * with stats/masks from another — refuse loudly instead.
    */
  def requireSameGeneration(
      s: SparkSession, anchor: String, ep: Option[Epoch], version: Long): Unit = {
    val curGen = current(s, anchor).map(_.baseGen).getOrElse(0L)
    val epGen = ep.map(_.baseGen).getOrElse(0L)
    require(epGen == curGen,
      s"as-of epoch $version of $anchor is from base generation $epGen but the " +
        s"index is at generation $curGen — an append or compaction rewrote the " +
        "standing data, so that epoch can no longer be reproduced")
  }

  /** Resolve the index's current data directory (build default when no
    * epoch redirects it).
    */
  def dataPath(s: SparkSession, anchor: String, default: String): String =
    current(s, anchor).flatMap(_.data).getOrElse(default)

  /** Resolve the index's current stats directory. */
  def statsPath(s: SparkSession, anchor: String, default: String): String =
    current(s, anchor).flatMap(_.stats).getOrElse(default)

  /** Drop the manifest entirely — builders call this so a rebuild over an
    * anchor that lived a previous life starts from the defaults instead of
    * resolving through a stale epoch.
    */
  def reset(s: SparkSession, anchor: String): Unit = {
    val d = new Path(dir(anchor))
    fs(s, d).delete(d, true)
    ()
  }

  // one `key<TAB>value` line per field; paths are our own (no tabs/newlines)
  private def serialize(e: Epoch): String = {
    val b = new StringBuilder
    b.append(s"version\t${e.version}\n")
    e.data.foreach(p => b.append(s"data\t$p\n"))
    e.stats.foreach(p => b.append(s"stats\t$p\n"))
    e.tombstones.foreach(p => b.append(s"tombstone\t$p\n"))
    e.deltas.foreach(p => b.append(s"delta\t$p\n"))
    b.append(s"basegen\t${e.baseGen}\n")
    e.ingestHwm.foreach(h => b.append(s"hwm\t$h\n"))
    e.ingestStream.foreach(t => b.append(s"hwmstream\t$t\n"))
    b.toString
  }

  private def parse(version: Long, body: String): Epoch = {
    val kvs = body.linesIterator.filter(_.nonEmpty).toSeq.map { line =>
      val i = line.indexOf('\t')
      require(i > 0, s"IndexManifest: malformed line '$line'")
      (line.substring(0, i), line.substring(i + 1))
    }
    Epoch(
      version,
      kvs.collectFirst { case ("data", v) => v },
      kvs.collectFirst { case ("stats", v) => v },
      kvs.collect { case ("tombstone", v) => v }.toVector,
      kvs.collect { case ("delta", v) => v }.toVector,
      kvs.collectFirst { case ("basegen", v) => v.toLong }.getOrElse(0L),
      kvs.collectFirst { case ("hwm", v) => v.toLong },
      kvs.collectFirst { case ("hwmstream", v) => v })
  }
}
