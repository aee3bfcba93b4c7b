package graft

import graft.operators.{DedupQueries, TextQueries}
import org.apache.spark.sql.DataFrame

/** Winnowing fingerprint selection (text_winnow / dedup_winnow_pairs)
  * against an INDEPENDENT in-JVM reference implementation, plus the two
  * properties the family exists for:
  *
  *  1. the detection guarantee — a verbatim run of >= W + K − 1 = 8 tokens
  *     shared between two docs shares >= 1 selected fingerprint, and a run
  *     of >= 2W + K − 1 = 13 tokens survives the MinShared = 2 pair cut;
  *  2. position robustness — prepending junk shifts every gram position
  *     but local minima re-align, so the shared-fingerprint set is intact
  *     (the property every every-Nth-gram sampling scheme lacks).
  */
class WinnowSpec extends SparkSpec {

  private val K = 4
  private val W = 5
  private val POS = 1048576L

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private def md5Int(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)

  /** Reference winnowing: every gram position starts a window (tail windows
    * partial — the library's documented deviation), min of the composite
    * c = h·2^20 + (2^20 − 1 − p) per window, distinct (pos, fp).
    */
  private def refWinnow(text: String): Set[(Long, Long)] = {
    val toks = text.split(" ")
    if (toks.length < K) return Set.empty
    val g = toks.length - K + 1
    val c = (0 until g).map { p =>
      md5Int(toks.slice(p, p + K).mkString(" ")) * POS + (POS - 1 - p)
    }
    (0 until g).map { q =>
      val cmin = (q until math.min(q + W, g)).map(c).min
      (POS - 1 - cmin % POS, cmin / POS)
    }.toSet
  }

  private def docsDf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def selectedOf(df: DataFrame): Map[Long, Set[(Long, Long)]] =
    TextQueries.winnowSelected(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (d, rs) => d -> rs.map(r => (r._2, r._3)).toSet }

  test("winnowSelected matches the reference implementation exactly") {
    val fixtures = Seq(
      0L -> "the quick brown fox jumps over the lazy dog again and again today",
      1L -> "alpha beta gamma delta", // exactly K tokens: one gram, one window
      2L -> "one two three", // < K tokens: no grams, no fingerprints
      3L -> "rep rep rep rep rep rep rep rep rep rep", // total hash ties: rightmost-min rule decides
      4L -> (0 until 60).map(i => s"w${i % 7}").mkString(" ")) // periodic text
    val got = selectedOf(docsDf(fixtures: _*))
    for ((id, text) <- fixtures) {
      val want = refWinnow(text)
      assert(got.getOrElse(id, Set.empty) == want,
        s"doc $id: got ${got.getOrElse(id, Set.empty)}, want $want")
    }
  }

  test("every doc with >= 1 gram selects >= 1 fingerprint, positions in range") {
    val docs = Tables.documents(spark, sfDir)
    val sel = TextQueries.winnowSelected(docs).collect()
    assert(sel.nonEmpty)
    val grams = docs.selectExpr("doc_id",
      "CAST(greatest(size(split(text, ' ')) - 3, 0) AS BIGINT) AS g").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perDoc = sel.groupBy(_.getLong(0))
    for ((id, g) <- grams if g > 0)
      assert(perDoc.contains(id), s"doc $id has $g grams but no fingerprint")
    for (r <- sel) {
      val (id, pos) = (r.getLong(0), r.getLong(1))
      assert(pos >= 0 && pos < grams(id), s"doc $id: selected pos $pos outside [0, ${grams(id)})")
    }
    // the density the paper proves: E[selected/grams] = 2/(W+1) = 1/3 —
    // corpus-level sanity that winnowing actually compresses the index
    val nSel = sel.length.toLong
    val nGrams = grams.values.sum
    assert(nSel * 2 < nGrams, s"winnowing kept $nSel of $nGrams grams — no compression")
  }

  test("8-token shared run shares a fingerprint; 13-token run survives the pair cut") {
    val run8 = "s1 s2 s3 s4 s5 s6 s7 s8"
    val run13 = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12 t13"
    val docs = docsDf(
      0L -> s"a1 a2 a3 a4 a5 $run8 a6 a7 a8 a9 a10",
      1L -> s"b1 b2 b3 $run8 b4 b5 b6 b7 b8 b9 b10 b11",
      2L -> s"c1 c2 c3 c4 $run13 c5 c6 c7",
      3L -> s"d1 d2 $run13 d3 d4 d5 d6 d7 d8",
      4L -> "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10 e11 e12 e13 e14 e15")
    val sel = selectedOf(docs)
    // fingerprint-level guarantee on the 8-token run
    val sharedFp01 = sel(0L).map(_._2).intersect(sel(1L).map(_._2))
    assert(sharedFp01.nonEmpty, "8-token shared run selected no common fingerprint")
    // pair-level guarantee on the 13-token run
    val pairs = DedupQueries.winnowPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pairs.exists(p => p._1 == 2L && p._2 == 3L && p._3 >= 2L),
      s"13-token shared run missing from the MinShared=2 pair join: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated doc paired: $pairs")
  }

  test("junk prefix shifts positions but not the shared fingerprint set") {
    val body = (0 until 40).map(i => s"x$i").mkString(" ")
    val docs = docsDf(
      0L -> body,
      1L -> s"junk1 junk2 junk3 junk4 junk5 junk6 $body")
    val sel = selectedOf(docs)
    val bodyFps = sel(0L).map(_._2)
    val shifted = sel(1L).map(_._2)
    // every interior fingerprint of the body re-selects under the shift;
    // only the first window (junk boundary grams now compete) may differ
    val missing = bodyFps -- shifted
    assert(missing.size <= 2,
      s"position shift lost ${missing.size} of ${bodyFps.size} fingerprints — selection is not local")
    assert(bodyFps.intersect(shifted).size >= bodyFps.size - 2)
  }

  test("a document past the 2^20-gram packing bound fails loudly with its doc_id") {
    // the r13 runtime guard, exercised: position bits past 2^20 would bleed
    // into the composite's hash field and silently corrupt fingerprints —
    // the row must raise instead (valid docs in the same frame still select)
    val tokens = POS.toInt + K // size(toks) - K == POS: first failing size
    val big = ("t " * tokens).trim
    val docs = docsDf(0L -> "a b c d e f g h i j", 1L -> big)
    val e = intercept[Exception] {
      TextQueries.winnowSelected(docs).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m =>
      m != null && m.contains("position-packing bound") && m.contains("doc_id 1")),
      s"wrong failure: ${messages(e).mkString(" | ")}")
    // one token under the bound passes and selects fingerprints
    val ok = docsDf(2L -> ("t " * (tokens - 1)).trim)
    assert(TextQueries.winnowSelected(ok).count() > 0)
  }

  test("deletion re-admits a df-capped fingerprint across the [2, cap] boundary") {
    // the probe-time df cap (winnowIncrementalPairs drops fps with
    // df > NGRAM_BLOCK_CAP over the STANDING index) must re-derive after a
    // takedown: with cap+1 identical corpus docs a probe of the same text
    // finds nothing (boilerplate suppression); deleting ONE corpus doc
    // drops df to exactly the cap and every fingerprint re-admits — the
    // same answer a rebuild over the survivors gives
    import org.apache.spark.sql.functions._
    val cap = DedupQueries.NGRAM_BLOCK_CAP
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val corpus = docsDf((0L to cap.toLong).map(i => i -> text): _*)
    spark.sql("DROP TABLE IF EXISTS winnow_cap_idx")
    val tmp = java.nio.file.Files.createTempDirectory("graft-wincap").toString
    val fps = TextQueries.winnowSelected(corpus)
      .select(col("doc_id"), col("fp")).distinct()
    fps.join(fps.groupBy("doc_id").agg(count(lit(1)).as("n_fp_c")), "doc_id")
      .write.mode("overwrite").bucketBy(8, "fp").sortBy("fp")
      .option("path", s"$tmp/idx").saveAsTable("winnow_cap_idx")
    val batch = TextQueries.winnowSelected(docsDf(1000L -> text))
      .select(col("doc_id"), col("fp")).distinct()
    // df = cap + 1 ⇒ every fp capped out ⇒ no pairs
    val before = DedupQueries.winnowIncrementalPairs(
      batch, DedupQueries.winnowIndexFrame(spark, "winnow_cap_idx")).collect()
    assert(before.isEmpty, s"expected boilerplate suppression, got ${before.length} pairs")
    // delete one corpus doc ⇒ df = cap ⇒ the batch doc pairs with ALL survivors
    DedupQueries.deleteFromWinnowIndex(spark, "winnow_cap_idx", Seq(0L))
    val after = DedupQueries.winnowIncrementalPairs(
      batch, DedupQueries.winnowIndexFrame(spark, "winnow_cap_idx")).collect()
    assert(after.length == cap, s"expected $cap re-admitted pairs, got ${after.length}")
    assert(after.forall(_.getDouble(3) == 1.0)) // identical text ⇒ full containment
  }
}
