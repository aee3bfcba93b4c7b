package graft

/** Independent in-JVM references for the r12 curation additions:
  *
  *  - `text_gopher_rules` — every per-doc rule recomputed from the raw
  *    text with plain Scala collections and compared row-for-row (the
  *    cross-multiplication thresholds must mean exactly what the prose
  *    says at every doc length);
  *  - `pipeline_mix_temperature` — the α = 1/2 apportionment recomputed
  *    with BigInt integer sqrt + largest-remainder in the JVM, then the
  *    REALIZED copy multiset checked against it: Σ copies == budget
  *    exactly, per-lang copy counts == target_i, and copy indices are the
  *    dense 1..c_i per doc;
  *  - `search_wand_bound` — the safety invariant the operator exists for:
  *    zero false skips (no doc the upper-bound test discards could have
  *    entered the top-K), at every scale factor the suite touches.
  */
class MixRulesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val stopwords = Set("the", "a", "of", "and", "to", "is", "in")

  test("text_gopher_rules matches an independent per-doc reference") {
    val got = SparkEntry.queries("text_gopher_rules")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5), r.getLong(6), r.getBoolean(7)))
      .toMap

    val raw = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(raw.nonEmpty && got.keySet == raw.keySet)

    raw.foreach { case (id, text) =>
      val toks = text.split(" ")
      val n = toks.length.toLong
      val ch = toks.map(_.length.toLong).sum
      val nstop = toks.count(stopwords.contains).toLong
      val ndis = toks.distinct.length.toLong
      val maxtf = toks.groupBy(identity).values.map(_.length).max.toLong
      val exp = (
        n >= 30 && n <= 100000,
        3 * n <= ch && ch <= 10 * n,
        nstop >= 2,
        5 * maxtf <= n,
        10 * ndis >= 3 * n)
      val nFail = exp.productIterator.count(_ == false).toLong
      assert(got(id) == (exp._1, exp._2, exp._3, exp._4, exp._5, nFail, nFail == 0L),
        s"doc $id: got ${got(id)}, expected $exp with n_fail=$nFail")
    }
    // the battery must discriminate on this corpus, not rubber-stamp it
    assert(got.values.exists(_._7) && got.values.exists(!_._7),
      "expected both passing and failing docs under the rule battery")
  }

  /** Exact integer sqrt by Newton's method on BigInt — the reference the
    * query's floor(sqrt(double))±1 correction must agree with.
    */
  private def isqrt(x: BigInt): BigInt = {
    if (x < 2) return x
    var g = BigInt(math.sqrt(x.toDouble).toLong + 1)
    while (g * g > x) g = (g + x / g) / 2
    g
  }

  test("pipeline_mix_temperature realizes the exact α=1/2 apportionment") {
    val counts = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val budget = counts.values.sum
    val s = counts.map { case (l, n) => l -> isqrt(BigInt(n) * 1000000) }
    val stot = s.values.sum
    val base = s.map { case (l, v) => l -> (BigInt(budget) * v / stot).toLong }
    val frac = s.map { case (l, v) => l -> (BigInt(budget) * v % stot) }
    val extra = budget - base.values.sum
    val order = frac.toSeq.sortBy { case (l, f) => (-f, l) }.map(_._1)
    val target = base ++ order.take(extra.toInt).map(l => l -> (base(l) + 1L))
    assert(target.values.sum == budget, "apportionment must sum to the budget")

    val got = SparkEntry.queries("pipeline_mix_temperature")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length.toLong == budget, s"realized rows ${got.length} != budget $budget")
    val perLang = got.groupBy(_._1).map { case (l, rs) => l -> rs.length.toLong }
    assert(perLang == target,
      s"per-lang realized counts $perLang != reference targets $target")
    // copy indices dense 1..c per doc
    got.groupBy(r => (r._1, r._2)).foreach { case ((l, id), rs) =>
      val cs = rs.map(_._3).sorted.toSeq
      assert(cs == (1L to cs.length.toLong),
        s"doc ($l,$id) copies not dense: $cs")
    }
  }

  test("gopherRulesOf survives degenerate docs with the documented semantics") {
    // empty text tokenizes to [""] (n = 1, ch = 0); single-char and
    // all-stopword docs exercise every rule boundary — no crash, no NULLs,
    // and the rule values follow the cross-multiplication definitions
    import spark.implicits._
    val rows = graft.operators.TextQueries.gopherRulesOf(
      Seq(
        (1L, ""),
        (2L, "a"),
        (3L, "the the the the the"),
        (4L, ("word " * 40).trim))
        .toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.size == 4)
    // empty: n=1 ch=0 → fails wordcount (1 < 30) and meanwl (3·1 > 0)
    assert(!rows(1L).getBoolean(1) && !rows(1L).getBoolean(2))
    // all-stopword doc: stopword rule passes (5 >= 2), maxtf fails (5·5 > 5)
    assert(rows(3L).getBoolean(3) && !rows(3L).getBoolean(4))
    // 40 identical words: wordcount passes, ttr fails (10·1 < 3·40)
    assert(rows(4L).getBoolean(1) && !rows(4L).getBoolean(5))
    rows.values.foreach(r => assert(!(0 until 8).exists(r.isNullAt), r.toString))
  }

  test("search_wand_bound: the upper-bound skip test never lies") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { d =>
      val rows = SparkEntry.queries("search_wand_bound")(spark, d).collect()
      assert(rows.length == 4, s"$d: expected one row per query")
      rows.foreach { r =>
        val (cands, skip, falseSkips, theta) =
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        assert(falseSkips == 0L, s"$d q=${r.getLong(0)}: UB safety violated")
        assert(skip >= 0L && skip <= cands && theta > 0L)
      }
    }
  }
}
