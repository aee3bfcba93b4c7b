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

  test("BPE and WordPiece objectives genuinely diverge on the corpus") {
    // same skeleton, different argmax: frequency (BPE) vs likelihood
    // pair_n/(lhs_n·rhs_n) (WordPiece). Round 1 shares the identical
    // census, so WP's round-1 pick can never out-COUNT BPE's (which
    // maximizes the count), and if the picks differ the count must be
    // strictly lower — the objective trade made visible.
    val rounds = 6
    val (bm, _) = TextQueries.bpeTrain(spark, sfDir, rounds)
    val (wm, _) = TextQueries.wpTrain(spark, sfDir, rounds)
    assert(bm.size == rounds && wm.size == rounds)
    info("BPE: " + bm.map(m => s"${m._2}+${m._3}(n=${m._5})").mkString(" "))
    info("WP : " + wm.map(m => s"${m._2}+${m._3}(n=${m._5},s=${m._6})").mkString(" "))
    assert(wm.head._5 <= bm.head._5,
      "WP round-1 pick cannot have a higher pair count than BPE's argmax-count pick")
    val diverge = bm.zip(wm).indexWhere { case (b, w) => (b._2, b._3) != (w._2, w._3) }
    assert(diverge >= 0, "merge sequences must diverge — otherwise the objective is vacuous")
    info(s"first divergence at merge rank ${diverge + 1}")
    if (diverge == 0)
      assert(wm.head._5 < bm.head._5,
        "differing round-1 picks must trade count for likelihood")
  }

  test("WP integer score chain matches BigInt reference — no int64 overflow") {
    // the long chain score_nano = n * 1e9 div (ua * ub) evaluated by the
    // engine must equal exact BigInt arithmetic across the documented
    // headroom (per-symbol census counts up to ~2e9: ua·ub ≤ 4.6e18 and
    // n·1e9 ≤ 2e18 both stay inside int64; beyond that the trainer needs
    // a wider grid, and DuckDB's overflow error makes the breach loud)
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val cases = (1 to 200).map { _ =>
      val ua = 1L + (math.abs(rnd.nextLong()) % 2000000000L)
      val ub = 1L + (math.abs(rnd.nextLong()) % 2000000000L)
      val n = 1L + (math.abs(rnd.nextLong()) % math.min(ua, ub))
      (n, ua, ub)
    }
    val got = cases.toDF("n", "ua", "ub")
      .selectExpr("n", "ua", "ub", "n * 1000000000L div (ua * ub) AS s")
      .collect()
    got.foreach { r =>
      val (n, ua, ub, s) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val expect = BigInt(n) * 1000000000L / (BigInt(ua) * ub)
      assert(BigInt(s) == expect, s"n=$n ua=$ua ub=$ub: $s != $expect")
    }
  }
}
