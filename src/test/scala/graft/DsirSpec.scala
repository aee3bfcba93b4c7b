package graft

import java.nio.file.Files

/** DSIR importance weights on a corpus with a REAL domain shift (the driver
  * corpus's shared 31-word vocabulary makes lang-level distributions
  * indistinguishable — see the pipeline_dsir_weights honest note): the
  * target sample (lang=en, source=src0) speaks the fruit domain, half the
  * raw corpus speaks an unrelated vehicle domain. In-domain docs must
  * out-score off-domain docs, and the τ cut must keep the in-domain side.
  */
class DsirSpec extends SparkSpec {

  private lazy val shiftDir: String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dsir").toString
    val fruit = Seq("apple", "banana", "cherry", "plum", "grape", "melon")
    val vehicle = Seq("truck", "sedan", "wagon", "coupe", "rotor", "diesel")
    def doc(words: Seq[String], i: Int): String =
      (0 until 12).map(k => words((i + k) % words.length)).mkString(" ")
    val rows =
      // the small in-domain target sample the censuses train on
      (0 until 4).map(i => (i.toLong, doc(fruit, i), "en", "src0", 60L)) ++
        // raw corpus: in-domain docs outside the target sample...
        (10 until 20).map(i => (i.toLong, doc(fruit, i), "de", "src1", 60L)) ++
        // ...and off-domain docs the weights must rank below them
        (20 until 30).map(i => (i.toLong, doc(vehicle, i), "de", "src2", 60L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("in-domain docs out-score off-domain docs; the tau cut separates them") {
    val rows = SparkEntry.queries("pipeline_dsir_weights")(spark, shiftDir).collect()
    val byId = rows.map(r => r.getLong(0) -> (r.getLong(4), r.getBoolean(5))).toMap
    val inDomain = (10L until 20L).map(byId(_))
    val offDomain = (20L until 30L).map(byId(_))
    assert(inDomain.map(_._1).min > offDomain.map(_._1).max,
      s"in-domain llr ${inDomain.map(_._1)} vs off-domain ${offDomain.map(_._1)}")
    assert(inDomain.forall(_._2), s"tau cut dropped an in-domain doc: $inDomain")
    assert(offDomain.forall(!_._2), s"tau cut kept an off-domain doc: $offDomain")
  }

  test("systematic resampling draws exactly K copies, biased to the in-domain docs") {
    val out = SparkEntry.queries("pipeline_dsir_sample")(spark, shiftDir).collect()
    // multiplicities telescope to exactly K regardless of corpus size
    assert(out.map(_.getLong(4)).sum == 100L, out.toSeq)
    assert(out.forall(_.getLong(4) >= 1L))
    // heavier (in-domain) docs draw more copies in aggregate — pointwise
    // dominance isn't guaranteed: the +256 weight shift (sized for the
    // driver corpus's llr range) compresses this corpus's ±30-bit spread,
    // so neighboring docs can land equal multiplicities
    val byId = out.map(r => r.getLong(0) -> r.getLong(4)).toMap
    val inC = (10L until 20L).map(byId.getOrElse(_, 0L))
    val offC = (20L until 30L).map(byId.getOrElse(_, 0L))
    assert(inC.sum > offC.sum,
      s"in-domain copies $inC should out-draw off-domain $offC in total")
  }

  test("selection report attributes the kept mass to the in-domain sources") {
    val rep = SparkEntry.queries("pipeline_dsir_select")(spark, shiftDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rep(("de", "src1"))._2 == 10L, rep) // all in-domain docs selected
    assert(rep(("de", "src2"))._2 == 0L, rep)  // no off-domain doc selected
    assert(rep(("en", "src0"))._1 == 4L, rep)
  }
}
