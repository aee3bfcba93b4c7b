package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Short-input edge cases the driver corpus can't produce (its docs all
  * have >= 10 tokens): sub-5-char texts and sub-8-token docs must be
  * EXCLUDED by the n-gram queries — not crash the job (Spark's
  * sequence(a, negative) runs descending) and not diverge from DuckDB's
  * empty-range exclusion. Runs the registered queries against a synthetic
  * documents.parquet shaped like the test data.
  */
class EdgeCorpusSpec extends SparkSpec {

  private lazy val edgeDir: String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-edge").toString
    val long1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    Seq(
      (1L, "abc", "en", "src0", 3L),                       // < 5 chars: no 5-gram key
      (2L, "one two three", "en", "src0", 13L),            // 3 tokens: no 8-gram
      (3L, long1, "en", "src1", long1.length.toLong),
      (4L, long1, "en", "src1", long1.length.toLong),      // near/exact dup of 3
      (5L, "tiny doc", "en", "src3", 8L),                  // 2-token exact dups:
      (6L, "tiny doc", "en", "src3", 8L),                  //   no shingles ⇒ never pair
      (10L, long1 + " extra", "en", "src2", 0L))           // doc_id % 10 == 0: benchmark slice
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dedup_ngram_jaccard excludes sub-5-char texts instead of crashing") {
    val out = SparkEntry.queries("dedup_ngram_jaccard")(spark, edgeDir).collect()
    // doc 1 can never appear; docs 3/4 are identical → jaccard 1.0 pair
    assert(!out.exists(r => r.getLong(0) == 1L || r.getLong(1) == 1L))
    assert(out.exists(r => r.getLong(0) == 3L && r.getLong(1) == 4L))
  }

  test("dedup_minhash_lsh never pairs sub-3-token exact duplicates") {
    // per-document banding can't pair shingle-less docs (and neither can
    // the DuckDB oracle), so the exact-dup collapse must not emit their
    // intra-group jac-1.0 pairs either
    val out = SparkEntry.queries("dedup_minhash_lsh")(spark, edgeDir).collect()
    assert(!out.exists(r => r.getLong(0) == 5L || r.getLong(1) == 6L), out.toSeq)
    assert(out.exists(r => r.getLong(0) == 3L && r.getLong(1) == 4L &&
      r.getDouble(2) == 1.0), out.toSeq)
  }

  test("dedup_incremental flags the batch doc that near-matches the corpus") {
    // threshold = (10+1)*4 div 5 = 8 ⇒ batch = {10}, corpus = {1..6};
    // doc 10 extends the duplicated long text ⇒ near_dup against doc 3
    val out = SparkEntry.queries("dedup_incremental")(spark, edgeDir).collect()
    assert(out.length == 1, out.toSeq)
    val r = out.head
    assert(r.getLong(0) == 10L && r.getString(1) == "near_dup" && r.getLong(2) == 3L, r)
  }

  test("every documents-only query survives the short-doc corpus") {
    // the full text/dedup/multimodal surface must tolerate degenerate docs
    // (ANSI array indexing turns silent garbage into runtime throws); this
    // sweep would have caught the dedup_incremental crash before release
    val docQueries = SparkEntry.registry.map(_.name).filter(n =>
      n.startsWith("text_") || n.startsWith("multimodal_") ||
        n.startsWith("pipeline_") ||
        // lexical search reads documents only (hybrid and the eval audit
        // also need embeddings for the vector list)
        (n.startsWith("search_") && !n.contains("hybrid") && !n.contains("eval")) ||
        (n.startsWith("dedup_") && !n.contains("embedding") &&
          // keep-latest dedups ORDERS (CDC snapshot), not documents;
          // the semantic-dedup family operates on the EMBEDDINGS table
          n != "dedup_keep_latest" && !n.startsWith("dedup_semantic")))
    for (name <- docQueries) {
      val rows = SparkEntry.queries(name)(spark, edgeDir).collect()
      assert(rows != null, name) // reaching here means no throw
    }
  }

  test("bounded ewma fold equals the unbounded fold on a hot-key corpus") {
    // the skew-bomb fix: q_events_ewma folds only the trailing EWMA_TAIL=64
    // events per user. On a 20k-event hot key (plus normal users) the
    // bounded and unbounded folds must agree exactly — by the closed form
    // floor((a0 + Σ 2^(i-1) v_i) / 2^64) the truncated prefix contributes 0
    // unless the weighted tail sum sits within a0 of a 2^64 multiple (see
    // the query's scale note). Values cycle through primes to exercise both
    // parities in the floor chain.
    import spark.implicits._
    val hot = (0 until 20000).map(i =>
      (100000L + i, new java.sql.Timestamp(1700000000000L + i * 1000L),
        7L, "click", (Seq(101, 211, 307, 401, 503)(i % 5) + i % 97).toDouble / 100.0))
    val normal = for (u <- 1L to 5L; i <- 0 until 50) yield
      (u * 1000 + i, new java.sql.Timestamp(1700000000000L + i * 60000L),
        u, "view", (i * 13 % 89).toDouble / 100.0 + u)
    val ev = (hot ++ normal)
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val bounded = graft.operators.EventQueries
      .ewmaOver(ev, Some(graft.operators.EventQueries.EWMA_TAIL)).collect()
    val full = graft.operators.EventQueries.ewmaOver(ev, None).collect()
    assert(bounded.toSeq == full.toSeq)
    // the count column still reflects the FULL history, not the tail
    assert(bounded.find(_.getLong(0) == 7L).get.getLong(1) == 20000L)
  }

  test("pipeline_decontaminate skips sub-8-token docs instead of crashing") {
    val out = SparkEntry.queries("pipeline_decontaminate")(spark, edgeDir).collect()
    // doc 2 (3 tokens) must not appear on either side; docs 3/4 share all
    // their 8-grams with benchmark doc 10 (its prefix)
    assert(!out.exists(r => r.getLong(0) == 2L))
    assert(out.exists(r => r.getLong(0) == 3L && r.getLong(1) == 10L))
    assert(out.exists(r => r.getLong(0) == 4L && r.getLong(1) == 10L))
  }
}
