package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Single-pointer commit manifest shared by every persisted index family —
  * the poor-man's transaction log that closes the lifecycle's crash
  * windows with ONE mechanism (reference anchor: the reference's per-run
  * artifact lifecycle is atomic by construction, `app.py:148-155` — an
  * artifact is either fully present or fully absent; the manifest gives
  * the multi-component indexes the same all-or-nothing property).
  *
  * Layout: `<anchor>_manifest/v<0-padded version>.mf`, one tiny text file
  * per version. Readers resolve the CURRENT epoch by listing the dir and
  * taking the highest version whose file carries the `committed=true`
  * terminator as its last line — a torn write (crash mid-create) lacks the
  * terminator and is skipped, so a reader can never observe a
  * half-committed epoch. Writers prepare every artifact (stats files,
  * tombstone fragments, rewritten data directories) under NEW names that
  * no committed manifest references, then publish them all with one
  * `create(overwrite = false)` of the next version file — the single atom
  * every store provides (HDFS create, object-store put-if-absent),
  * replacing the directory RENAMES the pre-manifest lifecycle relied on
  * (atomic on HDFS, nonatomic copies on S3/GCS). Create-no-overwrite also
  * gives optimistic concurrency: of two writers racing to version N+1 one
  * wins the create and the other reloads and retries its transform.
  *
  * What a manifest names:
  *   - `entries` — component pointers (current data directory, stats
  *     file), generic string keys so each family declares only what it
  *     has;
  *   - `tombstones` — the committed tombstone FRAGMENT directories: a
  *     fragment written but not yet listed does not exist, so a delete
  *     that must also move a stats pointer lands both in the same version
  *     (the atomicity `deleteFromSearchIndex` needs), and a compaction
  *     publishes its rewritten data dir and the empty tombstone list as
  *     one epoch.
  *
  * Absence of a manifest means the index is in its pristine as-built
  * layout — every component at its logical path, no tombstones — so
  * probes of a never-maintained index resolve without any manifest read
  * beyond one existence check, and the common case pays nothing.
  *
  * Superseded artifacts (old data dirs, folded fragments) are reclaimed
  * BEST-EFFORT after the commit; a crash before reclaim leaves
  * unreferenced garbage, never an inconsistent epoch. Reclaim racing an
  * in-flight probe that resolved the PRIOR epoch is the same caveat the
  * rename-based swap had — maintenance ops are single-writer by contract.
  */
object IndexManifest {

  /** One committed epoch: component pointers + the live fragment list. */
  case class State(version: Long, entries: Map[String, String], tombstones: Seq[String])

  /** Manifest directory for an index anchor (sibling of the data dir,
    * like the tombstone sidecar — move-invariant across compactions for
    * stable anchors).
    */
  def dir(anchor: String): String = anchor.stripSuffix("/") + "_manifest"

  private def fsOf(s: SparkSession, p: Path): FileSystem =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  private def fileFor(d: Path, version: Long): Path =
    new Path(d, f"v$version%016d.mf")

  private def serialize(st: State): String = {
    val sb = new StringBuilder
    sb.append("version=").append(st.version).append('\n')
    st.entries.toSeq.sortBy(_._1).foreach { case (k, v) =>
      require(!k.contains('=') && !k.contains('\n') && !v.contains('\n'),
        s"IndexManifest: illegal key/value ($k, $v)")
      sb.append("e:").append(k).append('=').append(v).append('\n')
    }
    st.tombstones.foreach { t =>
      require(!t.contains('\n'), s"IndexManifest: illegal fragment path $t")
      sb.append("t=").append(t).append('\n')
    }
    sb.append("committed=true\n")
    sb.toString
  }

  /** Parse one manifest file; None when torn (no terminator) or garbled. */
  private def parse(fs: FileSystem, p: Path): Option[State] = {
    val in = fs.open(p)
    val bytes =
      try {
        val n = fs.getFileStatus(p).getLen.toInt
        val buf = new Array[Byte](n)
        in.readFully(0, buf)
        buf
      } finally in.close()
    val lines = new String(bytes, UTF_8).split("\n", -1).toSeq.filter(_.nonEmpty)
    if (lines.lastOption.contains("committed=true")) {
      val version = lines.collectFirst {
        case l if l.startsWith("version=") => l.stripPrefix("version=").toLong
      }
      version.map { v =>
        val entries = lines.collect {
          case l if l.startsWith("e:") =>
            val kv = l.stripPrefix("e:")
            val i = kv.indexOf('=')
            kv.take(i) -> kv.drop(i + 1)
        }.toMap
        val tombs = lines.collect { case l if l.startsWith("t=") => l.stripPrefix("t=") }
        State(v, entries, tombs)
      }
    } else None
  }

  /** The highest committed epoch, or None for a never-maintained index. */
  def load(s: SparkSession, anchor: String): Option[State] = {
    val d = new Path(dir(anchor))
    val fs = fsOf(s, d)
    if (!fs.exists(d)) None
    else
      fs.listStatus(d).map(_.getPath)
        .filter(_.getName.endsWith(".mf"))
        .sortBy(_.getName)(Ordering[String].reverse)
        .iterator
        .flatMap(p => parse(fs, p))
        .nextOption()
  }

  /** Resolve a component pointer, defaulting to the pristine layout. */
  def resolve(s: SparkSession, anchor: String, key: String, default: String): String =
    load(s, anchor).flatMap(_.entries.get(key)).getOrElse(default)

  /** Commit the next epoch: apply `f` to the current state (pristine
    * `State(0, Map.empty, Nil)` when no manifest exists) and publish the
    * result as version+1 via create-no-overwrite. On losing a race the
    * transform re-applies over the winner's state (optimistic
    * concurrency); a DEAD writer's torn file at the target version is
    * reclaimed and overwritten — readers never saw it.
    */
  def commit(s: SparkSession, anchor: String)(
      f: State => (Map[String, String], Seq[String])): State = {
    val d = new Path(dir(anchor))
    val fs = fsOf(s, d)
    fs.mkdirs(d)
    var attempts = 0
    while (attempts < 8) {
      val cur = load(s, anchor).getOrElse(State(0L, Map.empty, Nil))
      val (entries, tombs) = f(cur)
      val next = State(cur.version + 1, entries, tombs)
      val file = fileFor(d, next.version)
      if (fs.exists(file) && parse(fs, file).isEmpty) {
        // torn debris from a crashed writer — no reader ever accepted it
        fs.delete(file, false)
      }
      try {
        val out = fs.create(file, false)
        try out.write(serialize(next).getBytes(UTF_8))
        finally out.close()
        return next
      } catch {
        case _: java.io.IOException =>
          attempts += 1 // lost the create race — reload and re-apply
      }
    }
    throw new IllegalStateException(
      s"IndexManifest.commit: could not commit at $anchor after $attempts attempts")
  }

  /** Physically remove an index's manifest dir — ONLY for anchors that
    * became unreachable (a location-anchored family after its location
    * moved) or for test teardown. Never call on a live anchor.
    */
  def drop(s: SparkSession, anchor: String): Unit = {
    val d = new Path(dir(anchor))
    fsOf(s, d).delete(d, true)
    ()
  }

  /** Best-effort reclaim of superseded artifact paths (old data dirs,
    * folded tombstone fragments). Failures are swallowed: garbage is
    * acceptable, a failed commit is not.
    */
  def reclaim(s: SparkSession, paths: Seq[String]): Unit =
    paths.foreach { raw =>
      try {
        val p = new Path(raw)
        fsOf(s, p).delete(p, true)
      } catch { case _: java.io.IOException => () }
    }
}

/** Test-only crash injection for the lifecycle's commit protocol: specs
  * arm a named point, the next maintenance op that reaches it throws
  * (one-shot — the point disarms as it fires, so the spec's retry/redo
  * path runs clean). Production code never arms anything, and a `hit` on
  * an unarmed point is a volatile read.
  */
private[graft] object CrashPoints {
  final class InjectedCrash(val point: String)
      extends RuntimeException(s"crash-injection: $point")

  @volatile private var armed: Set[String] = Set.empty

  def arm(point: String): Unit = synchronized { armed += point }
  def disarmAll(): Unit = synchronized { armed = Set.empty }

  def hit(point: String): Unit =
    if (armed(point)) {
      synchronized { armed -= point }
      throw new InjectedCrash(point)
    }
}
