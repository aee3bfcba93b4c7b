package graft

import graft.operators.TextQueries
import org.apache.spark.sql.functions._

/** Naive-Bayes classifier behavior beyond the oracle pair: the registered
  * queries pin exactness on the driver corpus (which is label-structureless,
  * so NB there collapses to the prior — the honest expected answer); this
  * spec proves the SAME code actually LEARNS when the corpus has per-label
  * token signal, and differentially tests the stacked-column Spark scoring
  * against a plain-Scala reference model.
  */
class TextNbSpec extends SparkSpec {

  /** Deterministic labeled corpus WITH signal: each label draws 80% of its
    * tokens from its own 4-word field vocabulary and 20% from a shared
    * noise pool — the separable case a multinomial NB must ace.
    */
  private def signalCorpus = {
    import spark.implicits._
    val fields = Map(
      "bio" -> Seq("cell", "gene", "protein", "enzyme"),
      "law" -> Seq("court", "statute", "plaintiff", "verdict"),
      "math" -> Seq("lemma", "theorem", "proof", "axiom"))
    val noise = Seq("the", "a", "of", "and", "with")
    val rnd = new scala.util.Random(42)
    val rows = fields.toSeq.sortBy(_._1).flatMap { case (label, vocab) =>
      (0 until 30).map { i =>
        val n = 20 + rnd.nextInt(20)
        val toks = (0 until n).map { _ =>
          if (rnd.nextInt(5) < 4) vocab(rnd.nextInt(vocab.size))
          else noise(rnd.nextInt(noise.size))
        }
        (label.hashCode.toLong * 1000 + i, toks.mkString(" "), label)
      }
    }
    rows.toDF("doc_id", "text", "lang")
  }

  test("NB learns a corpus with per-label signal: accuracy ~1, positive margins") {
    val docs = signalCorpus
    val out = TextQueries.nbClassify(docs).collect()
    assert(out.length == 90)
    val correct = out.count(_.getBoolean(5))
    assert(correct >= 88, s"NB should ace the separable corpus, got $correct/90")
    // margins are real confidence, not ties: every correct prediction beats
    // the runner-up by a positive bit count
    assert(out.filter(_.getBoolean(5)).forall(_.getLong(3) > 0),
      "correct predictions must have positive runner-up margin")
  }

  test("Spark NB scores equal a plain-Scala reference model bit-for-bit") {
    val docs = signalCorpus
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // reference model: multinomial NB with Laplace +1 on the bit_length grid
    def bl(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong
    val toks = rows.map { case (id, t, l) => (id, t.split(" ").toSeq, l) }
    val labels = rows.map(_._3).distinct.sorted
    val tf = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    toks.foreach { case (_, ts, l) => ts.foreach(t => tf((l, t)) += 1) }
    val totalTf = labels.map(l => l -> tf.collect { case ((`l`, _), n) => n }.sum).toMap
    val nDocsL = labels.map(l => l -> rows.count(_._3 == l).toLong).toMap
    val nDocs = rows.length.toLong
    val vocabN = tf.keys.map(_._2).toSeq.distinct.size.toLong
    val expected = toks.map { case (id, ts, _) =>
      val bits = labels.map { l =>
        l -> (ts.size * bl(totalTf(l) + vocabN) -
          ts.map(t => bl(tf((l, t)) + 1)).sum +
          bl(nDocs) - bl(nDocsL(l)))
      }
      id -> bits.toMap
    }.toMap
    val got = TextQueries.nbScores(docs).collect()
    assert(got.length == 90 * labels.size)
    got.foreach { r =>
      val (id, l, bits) = (r.getLong(0), r.getString(1), r.getLong(2))
      assert(bits == expected(id)(l), s"doc $id label $l: $bits != ${expected(id)(l)}")
    }
  }
}
