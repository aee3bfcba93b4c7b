package graft

import graft.operators.DedupQueries
import org.apache.spark.sql.DataFrame

/** Dedup internals on synthetic corpora the driver test data can't produce:
  * the sf documents table has NO exact duplicates (dedup_exact emits one row
  * per doc), so the exact-dup collapse inside minhashPairs and the member
  * re-expansion need their own fixture with real duplicate groups.
  */
class DedupSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  /** Reference implementation of the banded-MinHash near-dup semantics —
    * per-document banding with NO exact-dup collapse: a pair is reported iff
    * it collides in >= 1 of the 4 bands AND exact shingle Jaccard >= 0.6.
    * This is the contract minhashPairs must preserve while collapsing.
    */
  private def refPairs(docs: Seq[(Long, String)]): Set[(Long, Long, Double)] = {
    def shingles(t: String): Set[String] =
      t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    def sig(t: String): Seq[String] = {
      val hs = t.split(" ").sliding(3).map(w => md5hex(w.mkString(" "))).toSeq
      (0 until 8).map(i => hs.map(_.substring(4 * i, 4 * i + 4)).min)
    }
    def bandKeys(t: String): Seq[String] = {
      val m = sig(t)
      (0 until 4).map(j => md5hex(m(2 * j) + m(2 * j + 1)))
    }
    (for {
      (ia, ta) <- docs
      (ib, tb) <- docs
      if ia < ib
      if bandKeys(ta).zip(bandKeys(tb)).exists { case (x, y) => x == y }
      sa = shingles(ta)
      sb = shingles(tb)
      inter = sa.intersect(sb).size
      jac = inter.toDouble / (sa.size + sb.size - inter)
      if jac >= 0.6
    } yield (ia, ib, jac)).toSet
  }

  test("minhashPairs with exact-dup collapse matches per-document banding semantics") {
    import spark.implicits._
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val aNear = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"
    val other = "one two three four five six seven eight nine ten eleven twelve"
    val docs = Seq(
      (1L, a), (2L, a), (3L, a), // exact-duplicate group of 3
      (4L, aNear), (5L, aNear),  // exact-duplicate group of 2, near-dup of the first
      (6L, other),
      (7L, "completely different words entirely unrelated content goes here for control"))
    val got = DedupQueries.minhashPairs(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = refPairs(docs)
    assert(got == want, s"got $got\nwant $want")
    // the collapse must still surface intra-group pairs at jac 1.0
    assert(Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L))
      .forall(p => got.contains((p._1, p._2, 1.0))), got)
    // cross-group expansion is all-or-nothing: if the representatives pair,
    // every member pair (3×2) must appear with the same jaccard
    val crossAB = got.filter { case (x, y, _) => x <= 3 && y >= 4 && y <= 5 }
    assert(crossAB.isEmpty || crossAB.size == 6, crossAB)
  }

  test("propagateLabels matches union-find on random graphs") {
    import spark.implicits._
    // reference: weighted-quickunion union-find, labels = min doc_id per
    // component — the ground truth the distributed loop must reproduce
    def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val verts = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      verts.map(v => v -> find(v)).toMap
    }
    // fixed-seed random graphs: chains, stars, and cycles arise naturally
    val rnd = new scala.util.Random(42)
    val ckpt = (df: org.apache.spark.sql.DataFrame) => df.localCheckpoint(false)
    for (trial <- 1 to 8) {
      val n = 2 + rnd.nextInt(25)
      val pairs = Seq.fill(1 + rnd.nextInt(30)) {
        val a = rnd.nextInt(n).toLong
        val b = (a + 1 + rnd.nextInt(n - 1)) % n // guaranteed != a
        (math.min(a, b), math.max(a, b))
      }.distinct
      val got = DedupQueries.propagateLabels(pairs.toDF("doc_a", "doc_b"), ckpt)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == unionFind(pairs), s"trial $trial pairs $pairs:\n$got\nvs ${unionFind(pairs)}")
    }
  }

  test("twoStarComponents matches union-find on random graphs and a long path") {
    import spark.implicits._
    def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val verts = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      verts.map(v => v -> find(v)).toMap
    }
    val ckpt = (df: org.apache.spark.sql.DataFrame) => df.localCheckpoint(false)
    val rnd = new scala.util.Random(7)
    val trials = Seq.fill(5) {
      val n = 2 + rnd.nextInt(25)
      Seq.fill(1 + rnd.nextInt(30)) {
        val a = rnd.nextInt(n).toLong
        val b = (a + 1 + rnd.nextInt(n - 1)) % n
        (math.min(a, b), math.max(a, b))
      }.distinct
    } :+ // the case two-star exists for: a 30-vertex PATH (diameter 29,
      // where label propagation needs 30 rounds; two-star stays O(log²))
      (0L until 29L).map(i => (100L + i, 101L + i))
    for ((pairs, trial) <- trials.zipWithIndex) {
      val got = DedupQueries.twoStarComponents(pairs.toDF("a", "b"), ckpt)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == unionFind(pairs), s"trial $trial pairs $pairs:\n$got")
    }
  }

  test("propagateLabels finds connected components under both checkpointers") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 10L), (5L, 6L), (7L, 8L), (8L, 9L))
      .toDF("doc_a", "doc_b")
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 7L, 9L -> 7L)
    val checkpointers: Seq[DataFrame => DataFrame] = Seq(
      DedupQueries.reliableCheckpoint(spark),         // fleet path: durable files
      df => df.localCheckpoint(false))                // test path: executor blocks
    for (ckpt <- checkpointers) {
      val got = DedupQueries.propagateLabels(pairs, ckpt)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, got)
    }
  }

  test("dedup_semantic: every vector verdicted once, dup_of is a lower id in the same cell") {
    val rows = SparkEntry.queries("dedup_semantic")(spark, sfDir).collect()
    val n = Tables.embeddings(spark, sfDir).count()
    assert(rows.length == n)                       // total function of the corpus
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    val cellOf = rows.map(r => r.getLong(0) -> r.getLong(3)).toMap
    rows.foreach { r =>
      val (vid, verdict) = (r.getLong(0), r.getString(1))
      if (verdict == "drop") {
        val rep = r.getLong(2)
        assert(rep < vid, s"representative $rep !< dropped $vid")
        assert(cellOf(rep) == r.getLong(3), s"$vid dup_of $rep crosses cells")
      } else assert(r.isNullAt(2), s"keep row $vid carries dup_of")
    }
  }

  test("stripSpans drops exactly the cross-document spans and reassembles in order") {
    import spark.implicits._
    // spans are non-overlapping 4-token windows here (spanTokens = 4):
    // "h1 h2 h3 h4" is a shared header span in docs 1 and 2; every other
    // span is unique. doc 3 is ALL boilerplate (both spans shared with 4).
    val docs = Seq(
      (1L, "h1 h2 h3 h4 own a b c tail1"),
      (2L, "h1 h2 h3 h4 other d e f tail2"),
      (3L, "x1 x2 x3 x4 y1 y2 y3 y4"),
      (4L, "x1 x2 x3 x4 y1 y2 y3 y4"),
      (5L, "solo words only never repeated anywhere at all"))
    val got = graft.operators.TextQueries
      .stripSpans(docs.toDF("doc_id", "text"), spanTokens = 4, minDocs = 2)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    // doc 1: 3 spans ("h1 h2 h3 h4" | "own a b c" | "tail1"), header dropped
    assert(got(0) == (1L, 3L, 1L, 15L, md5hex("own a b c tail1")), got(0).toString)
    assert(got(1) == (2L, 3L, 1L, 17L, md5hex("other d e f tail2")), got(1).toString)
    // docs 3/4: every span shared => rewritten to the empty string, row kept
    assert(got(2) == (3L, 2L, 2L, 0L, md5hex("")), got(2).toString)
    assert(got(3) == (4L, 2L, 2L, 0L, md5hex("")), got(3).toString)
    // doc 5: nothing shared, text unchanged
    assert(got(4) == (5L, 2L, 0L, 46L, md5hex("solo words only never repeated anywhere at all")),
      got(4).toString)
  }
}
