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

  test("the WAND pool curve on a zero-candidate corpus is one all-zero row per pool size") {
    // no edge-corpus doc contains any QUERY_TERMS term, so the curve's
    // every count is zero — but the ROWS must still appear (one per pool
    // multiple, from the Scala side's global aggregates), and the DuckDB
    // oracle drives its rows from the pool table for exactly this reason
    // (review-found: a wscored-driven GROUP BY returned ZERO rows here,
    // silently breaking the inline==oracle pairing)
    val out = SparkEntry.queries("search_wand_pool_curve")(spark, edgeDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(1L, 2L, 5L, 10L).map(m => (m, 0L, 0L, 0L)), out.toSeq)
  }

  test("the curation ledger claims each document at the right stage, including exact_dup") {
    // the driver corpus has no exact duplicates among gopher-PASSING
    // train docs (its dups are short), so the ledger's exact_dup branch
    // needs a purpose-built corpus: ids 1/2 are identical passing texts
    // (1 is the min-id representative, 2 must read exact_dup), 3 is a
    // passing text whose words the eval doc 10 reproduces (contaminated),
    // 4 fails the word-count rule (gopher), 10 is the eval slice
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ledger").toString
    val pass1 = ("the quick brown foxes jumped over lazy dogs while seven " +
      "wizards brewed strong potions under bright moonlight casting golden " +
      "shadows across frozen rivers and silent valleys where ancient stones " +
      "guarded secret pathways")
    val pass2 = ("the busy harbor welcomed twelve merchant vessels carrying " +
      "spices silks copper ingots and woven carpets from distant southern " +
      "ports while dockhands loaded heavy crates onto waiting wagons bound " +
      "for northern market towns")
    Seq(
      (1L, pass1, "en", "s0", pass1.length.toLong),
      (2L, pass1, "en", "s0", pass1.length.toLong),
      (3L, pass2, "en", "s1", pass2.length.toLong),
      (4L, "tiny doc", "en", "s1", 8L),
      (10L, pass2, "en", "s2", pass2.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("pipeline_curate_ledger")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq(1L -> "kept", 2L -> "exact_dup", 3L -> "contaminated",
      4L -> "gopher", 10L -> "eval_set"), got)
  }

  test("every documents-only query survives the short-doc corpus") {
    // the full text/dedup/multimodal surface must tolerate degenerate docs
    // (ANSI array indexing turns silent garbage into runtime throws); this
    // sweep would have caught the dedup_incremental crash before release
    val docQueries = SparkEntry.registry.map(_.name).filter(n =>
      n.startsWith("text_") ||
        // cross-modal retrieval ranks through the EMBEDDINGS table
        (n.startsWith("multimodal_") && !n.contains("crossmodal")) ||
        // the semantic decontaminator and hard-negative miner score
        // EMBEDDINGS-table vectors (they sweep with the vector corpus
        // below), as do their _ivf index-scale twins
        (n.startsWith("pipeline_") && n != "pipeline_decontaminate_semantic" &&
          n != "pipeline_hard_negatives" && !n.endsWith("_ivf")) ||
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

  test("every embeddings query survives the tie-heavy small corpus") {
    // the docs/events-sweep discipline applied to the VECTOR surface: a
    // corpus the driver can't produce — exact duplicate embeddings (every
    // cosine tie-break fires, dup seeds would silently shrink a trained
    // grid if the duplicates landed in the seed range), a near-zero vector
    // (tiny but nonzero norm — stresses the cos denominators without the
    // designed zero-norm guards), extreme magnitudes, and n barely above
    // N_SEEDS so every cell is tiny. ANSI mode turns silent garbage into
    // throws, so reaching collect() is the assertion. The first N_SEEDS=16
    // ids stay pairwise-distinct by construction: trainedSeedSet's
    // duplicate-seed guard is a DESIGNED loud failure, not an edge bug,
    // so the corpus steers around it (duplicates live at ids 20/21).
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-edge-vec").toString
    def vec(seed: Int): Seq[Float] =
      { val r = new scala.util.Random(seed); Seq.fill(64)(r.nextFloat() * 2 - 1) }
    val base = (0 until 20).map(i => (i.toLong, vec(i), i % 4))
    val rows = base ++ Seq(
      (20L, vec(3), 0),                                   // exact dup of id 3
      (21L, vec(3), 1),                                   // second dup: a 3-way tie
      (22L, Seq.fill(64)(1e-30f), 2),                     // near-zero norm
      // extreme-but-in-envelope magnitude: the grid-exact censuses snap
      // x_i·x_j to the 1e-9 grid in int64, which bounds the input envelope
      // (see gramOf's note) — 1e3 is 1000× unit scale yet safely inside;
      // 1e15 overflows the cast BY DESIGN (ANSI throws loudly, verified
      // while building this sweep, rather than wrapping silently)
      (23L, vec(23).map(x => x * 1e3f), 3),
      (24L, vec(24), 0))
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val vecQueries = SparkEntry.registry.map(_.name).filter(n =>
      n.startsWith("ann_") || n.startsWith("dedup_semantic") ||
        n == "dedup_embedding_pairs" || n == "pipeline_decontaminate_semantic" ||
        n == "pipeline_hard_negatives" || n == "pipeline_decontaminate_ivf" ||
        n == "pipeline_hard_negatives_ivf")
    for (name <- vecQueries) {
      val out = SparkEntry.queries(name)(spark, dir).collect()
      assert(out != null, name) // reaching here means no throw
      graft.operators.Materialize.releaseAll(spark)
      spark.sharedState.cacheManager.clearCache()
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

  test("every events query survives the degenerate events corpus") {
    // the docs-sweep discipline applied to the events surface: total
    // timestamp ties (every window tie-break fires), a single-event user
    // (one-row windows and empty lag frames), NULL user_id / event_type
    // (three-valued predicates and null group keys), and a negative value.
    // The driver corpus is too well-behaved to produce any of these; ANSI
    // mode turns silent garbage into runtime throws, so reaching collect()
    // is the assertion. ts is written as a plain nanos LONG — the same
    // value Tables.events derives from the driver's TIMESTAMP(NANOS).
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-edge-events").toString
    val base = 1700000000L * 1000000000L
    val day = 86400L * 1000000000L
    Seq(
      (1L, base, Option(1L), Option("view"), 1.0, Option("""{"k":1}""")),
      (2L, base, Option(1L), Option("click"), 2.0, Option("""{"k":2}""")),
      (3L, base, Option(1L), Option("purchase"), 3.0, Option("""{"k":3}""")),
      (4L, base, Option(1L), Option("error"), 4.0, Option.empty[String]),
      (5L, base, Option(1L), Option("view"), 5.0, Option("""{"k":5}""")),
      (6L, base + day, Option(2L), Option("purchase"), 10.0, Option("{}")),
      (7L, base + 2 * day, Option(2L), Option("view"), 10.0, Option("{}")),
      (8L, base, Option.empty[Long], Option("view"), -1.0, Option("{}")),
      (9L, base + 1L, Option(3L), Option.empty[String], 0.0, Option("{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val evQueries = SparkEntry.registry.map(_.name).filter(_.startsWith("q_events_"))
    assert(evQueries.size >= 12)
    for (name <- evQueries) {
      val rows = SparkEntry.queries(name)(spark, dir).collect()
      assert(rows != null, name) // reaching here means no throw
    }
    // spot semantics: user 1's streak run at the tied instant is one day
    val st = SparkEntry.queries("q_events_streaks")(spark, dir)
      .filter(col("user_id") === 1L).head()
    assert(st.getLong(1) == 1L && st.getLong(3) == 1L, st) // one active day
    val st2 = SparkEntry.queries("q_events_streaks")(spark, dir)
      .filter(col("user_id") === 2L).head()
    assert(st2.getLong(1) == 2L && st2.getLong(3) == 2L, st2) // 2-day streak
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
