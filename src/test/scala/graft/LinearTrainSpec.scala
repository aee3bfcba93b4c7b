package graft

import java.nio.file.Files

/** The batch perceptron's convergence contract, on a corpus where it can
  * actually learn (the driver corpus is label-structureless, so the
  * registered text_linear_train curve records thrash by design — see the
  * query's honest-measurement note). Each label's docs use a disjoint
  * vocabulary, so the data is linearly separable and the batch loop must
  * reach zero mistakes and stop early.
  */
class LinearTrainSpec extends SparkSpec {

  /** 3 labels × 8 docs, disjoint per-label vocabularies (md5 buckets are
    * fixed constants for fixed tokens, so a hash collision — were one to
    * make the corpus non-separable — would fail deterministically here,
    * not flakily).
    */
  private lazy val sepDir: String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-linear-sep").toString
    val vocab = Map(
      "aa" -> Seq("apple", "apricot", "avocado"),
      "bb" -> Seq("banana", "blueberry", "bilberry"),
      "cc" -> Seq("cherry", "cranberry", "currant"))
    val rows = for {
      (lab, words) <- vocab.toSeq
      i <- 0 until 8
    } yield {
      val text = (0 until 6).map(k => words((i + k) % words.length)).mkString(" ")
      (lab.hashCode.toLong * 100 + i, text, lab, "src0", text.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("batch perceptron reaches zero mistakes and stops early on separable data") {
    val curve = SparkEntry.queries("text_linear_train")(spark, sepDir).collect()
    assert(curve.nonEmpty)
    val last = curve.last
    assert(last.getLong(1) == 0L,
      s"expected convergence, curve = ${curve.toSeq}")
    // every non-final round had mistakes (the stop-prefix contract: the
    // curve records executed rounds only, ending at the first zero)
    assert(curve.dropRight(1).forall(_.getLong(1) > 0L), curve.toSeq)
    assert(curve.length < 4, s"expected early stop inside the budget: ${curve.toSeq}")
  }

  test("trained model classifies the separable corpus perfectly") {
    val out = SparkEntry.queries("text_linear_classify")(spark, sepDir).collect()
    assert(out.length == 24)
    assert(out.forall(_.getBoolean(5)), out.filterNot(_.getBoolean(5)).toSeq)
    // margins are strictly positive once separated (no ties at the argmax)
    assert(out.forall(_.getLong(3) > 0L), out.toSeq)
  }

  test("curve is budget-invariant: a larger budget replays the same executed prefix") {
    val (c4, l4, w4) = graft.operators.TextQueries.linearTrain(spark, sepDir, 4)
    val (c8, l8, w8) = graft.operators.TextQueries.linearTrain(spark, sepDir, 8)
    assert(l4 == l8)
    assert(c4 == c8, s"$c4 vs $c8") // both stop at the same zero-mistake round
    assert(w4 == w8)
  }

  test("confusion matrix is diagonal on the separable corpus") {
    val out = SparkEntry.queries("text_linear_confusion")(spark, sepDir).collect()
    assert(out.length == 3, out.toSeq)
    assert(out.forall(r => r.getString(0) == r.getString(1) && r.getLong(2) == 8L),
      out.toSeq)
  }
}
