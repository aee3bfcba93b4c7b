package graft

import org.apache.spark.sql.functions._

/** BM25 + hybrid retrieval semantics (SearchQueries). Exact-value parity
  * with DuckDB is the driver's job; here we pin the ranking invariants the
  * integer-grid scoring must uphold.
  */
class SearchSpec extends SparkSpec {

  private lazy val bm25 = SparkEntry.queries("search_bm25_topk")(spark, sfDir).collect()
  private lazy val hybrid = SparkEntry.queries("search_hybrid_rrf")(spark, sfDir).collect()

  test("WAND-executed serving: pruned probe equals unpruned, skips match the audit") {
    // the search_wand_bound audit proves which candidates are skippable;
    // this pins that the serving path actually TAKES the skip without
    // losing a row: (1) the inline wand entry equals the unpruned entry,
    // (2) the index-served wand probe equals the unpruned index probe,
    // (3) per query: candidate counts match the audit, the realized skip
    // is positive and never exceeds the audit's provable n_skippable
    // (θ_est ≤ θ_true, so the executed prune is a subset of the provable
    // one).
    import graft.operators.SearchQueries
    val wandInline = SparkEntry.queries("search_bm25_wand")(spark, sfDir).collect()
    assert(wandInline.nonEmpty && wandInline.toSeq == bm25.toSeq)
    val tmp = java.nio.file.Files.createTempDirectory("graft-wand").toString
    SearchQueries.writeSearchIndex(spark, sfDir, "wand_idx", s"$tmp/wand_idx")
    val unpruned = SearchQueries.bm25TopkFromIndex(spark, "wand_idx", s"$tmp/wand_idx")
      .collect()
    val (topk, counts) = SearchQueries.bm25WandProbeIndex(
      spark, "wand_idx", s"$tmp/wand_idx",
      spark.createDataFrame(Seq(
        (0L, "spark"), (0L, "join"), (0L, "fast"),
        (1L, "hash"), (1L, "table"), (1L, "scan"),
        (2L, "vector"), (2L, "stream"), (2L, "window"),
        (3L, "customer"), (3L, "order"), (3L, "query"))).toDF("q_id", "term"))
    assert(topk.orderBy("q_id", "rank").collect().toSeq == unpruned.toSeq)
    val audit = SparkEntry.queries("search_wand_bound")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = counts.collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (qid, nCands, nScored) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (auditCands, auditSkippable) = audit(qid)
      assert(nCands == auditCands, s"q$qid: $nCands cands vs audit $auditCands")
      val skipped = nCands - nScored
      if (auditSkippable > 0)
        assert(skipped > 0, s"q$qid: audit proves $auditSkippable skippable " +
          s"but the serving path skipped nothing ($nCands cands)")
      assert(skipped <= auditSkippable,
        s"q$qid: skipped $skipped > provable $auditSkippable — unsafe prune")
    }
  }

  test("bm25 returns a full top-k per query, ranked by descending score") {
    assert(bm25.nonEmpty)
    val byQ = bm25.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L))
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length))
      // scores non-increasing in rank; doc_id breaks ties ascending
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val (sa, sb) = (a.getLong(3), b.getLong(3))
          assert(sa > sb || (sa == sb && a.getLong(2) < b.getLong(2)))
        case _ =>
      }
    }
  }

  test("bm25 scores are positive and docs actually contain a query term") {
    assert(bm25.forall(_.getLong(3) > 0))
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val terms = Map(
      0L -> Set("spark", "join", "fast"), 1L -> Set("hash", "table", "scan"),
      2L -> Set("vector", "stream", "window"), 3L -> Set("customer", "order", "query"))
    bm25.foreach { r =>
      assert(docs(r.getLong(2)).intersect(terms(r.getLong(0))).nonEmpty,
        s"doc ${r.getLong(2)} ranked for q${r.getLong(0)} without any query term")
    }
  }

  test("integer BM25 score chain matches BigInt reference — no int64 overflow") {
    // differential guard for the floor-division chain: evaluate the ACTUAL
    // Spark expression on randomized inputs across the documented envelope
    // (N up to 1e6 docs per shard) and compare against exact BigInt
    // arithmetic — equality proves every intermediate stayed in int64
    import graft.operators.SearchQueries
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(300) {
      val n = 1L + rnd.nextInt(1000000)
      val df = 1L + (rnd.nextLong().abs % n)
      val dl = 1L + rnd.nextInt(10000)
      val tf = 1L + (rnd.nextLong().abs % dl)
      val tt = n * (1L + rnd.nextInt(10000)) // corpus tokens: N * avgdl
      (tf, df, dl, n, tt)
    }
    val got = rows.toDF("tf", "df", "dl", "n_docs", "tt")
      .withColumn("s", expr(SearchQueries.scoreExpr("div")))
      .select("s").collect().map(_.getLong(0))
    def ref(tf: BigInt, df: BigInt, dl: BigInt, n: BigInt, tt: BigInt): BigInt = {
      val idf = ((n * 2 - df * 2 + 1) * 1000000) / (df * 2 + 1)
      val avgdlM = (tt * 1000) / n
      val normM = 250 + (dl * 750 * 1000) / avgdlM
      val denomM = tf * 1000 + (normM * 1200) / 1000
      val tfsat = (tf * 2200 * 1000000) / denomM
      (idf * tfsat) / 1000000
    }
    rows.zip(got).foreach { case ((tf, df, dl, n, tt), s) =>
      val expect = ref(tf, df, dl, n, tt)
      assert(BigInt(s) == expect, s"tf=$tf df=$df dl=$dl n=$n tt=$tt: $s != $expect")
    }
  }

  test("phrase match equals a naive in-memory bigram count") {
    // independent witness beside the DuckDB oracle: recount every phrase
    // occurrence with a plain Scala sliding window over the collected docs
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val phrases = Map(0L -> ("table", "hash"), 1L -> ("customer", "join"),
      2L -> ("vector", "small"))
    val expected = phrases.toSeq.flatMap { case (p, (w1, w2)) =>
      docs.flatMap { case (id, toks) =>
        val n = toks.sliding(2).count {
          case Seq(a, b) => a == w1 && b == w2
          case _ => false
        }
        if (n > 0) Some((p, id, n.toLong)) else None
      }.sortBy { case (_, id, n) => (-n, id) }.take(10)
        .zipWithIndex.map { case ((pp, id, n), i) => (pp, i + 1L, id, n) }
    }.toSet
    val got = SparkEntry.queries("search_phrase_match")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("hybrid rrf fuses both lists: members of both outrank single-list strays") {
    assert(hybrid.nonEmpty)
    // every rrf value decomposes as a sum of at most two reciprocal-rank
    // contributions on the micro grid: 1e6/(60+r), r in 1..10
    val single = (1 to 10).map(r => 1000000L / (60 + r)).toSet
    val valid = single ++ (for (a <- single; b <- single) yield a + b)
    hybrid.foreach(r => assert(valid.contains(r.getLong(3)), r.toString))
    // rank 1 per query carries at least one contribution, descending order
    hybrid.groupBy(_.getLong(0)).values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(sorted.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    }
  }

  test("MMR rerank: first pick is the BM25 winner, 5 distinct picks, diversity binds") {
    val bm = SparkEntry.queries("search_bm25_topk")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) // (q_id, rank, doc_id)
    val mmr = SparkEntry.queries("search_mmr_rerank")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) // (q_id, pick_order, doc_id)
    val byQ = mmr.groupBy(_._1)
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, picks) =>
      assert(picks.length == 5 && picks.map(_._3).distinct.length == 5, s"q=$q $picks")
      // pick 1 == the undiversified BM25 rank 1 (no selected set to penalize yet)
      val top1 = bm.find(r => r._1 == q && r._2 == 1L).get._3
      assert(picks.minBy(_._2)._3 == top1, s"q=$q pick1 != bm25 rank1")
      // every pick came from the BM25 top-10 candidate pool
      val pool = bm.filter(_._1 == q).map(_._3).toSet
      assert(picks.forall(p => pool.contains(p._3)), s"q=$q picked outside pool")
    }
    // the diversity term must actually bind somewhere: at least one query's
    // MMR top-5 differs from its plain BM25 top-5 (λ=0.7 over near-uniform
    // token-soup docs reorders at least one pick on this corpus)
    val reordered = byQ.exists { case (q, picks) =>
      val plain5 = bm.filter(r => r._1 == q && r._2 <= 5L).sortBy(_._2).map(_._3).toSeq
      picks.sortBy(_._2).map(_._3).toSeq != plain5
    }
    assert(reordered, "MMR == plain top-5 for every query — diversity term inert")
  }
}
