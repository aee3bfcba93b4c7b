package graft

/** Physical-plan regression guard: the properties that make these plans
  * scale (pushdown, broadcast dims, partial aggregation, codegen) must
  * survive future edits — the same checks as the round-2 manual audit.
  * Note AQE legitimately turns small shuffle joins into broadcasts at test
  * scale, so fact⋈fact queries assert "some hash join", not SMJ.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("filters and projections push into the parquet scan") {
    val p = plan("q_filter_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
    assert(p.contains("ReadSchema: struct<l_orderkey"), p)
    assert(!p.contains("l_comment"), "projection not pruned")
  }

  test("dimension joins broadcast") {
    assert(plan("q_join_broadcast").contains("BroadcastHashJoin"))
    assert(plan("q_tpch_q3").contains("BroadcastHashJoin"))
    assert(plan("q_tpch_q5").contains("BroadcastHashJoin"))
  }

  test("aggregations are partial (map-side combine) before the shuffle") {
    val p = plan("q1_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // partial + final
  }

  test("ANN brute force broadcasts the query side, never the corpus") {
    val p = plan("ann_bruteforce_topk")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("graft_dot projections stay inside whole-stage codegen") {
    // AQE prints codegen markers only on the final (post-execution) plan
    val df = SparkEntry.queries("ann_lsh_buckets")(spark, sfDir)
    df.collect() // count() would execute a different QueryExecution
    val p = df.queryExecution.executedPlan.toString
    val dotLine = p.linesIterator.find(_.contains("graft_dot")).getOrElse("")
    assert(dotLine.contains("*("), p)
  }

  test("no accidental cartesian products in the dedup joins") {
    for (q <- Seq("dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_embedding_lsh")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product:\n$p")
    }
  }

  test("decontamination broadcasts the benchmark grams, never shuffles the corpus") {
    val p = plan("pipeline_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("the curation ledger broadcasts only the eval grams; no cartesian anywhere") {
    // the end-to-end composition must keep each stage's documented shape:
    // eval-gram membership broadcasts (one BroadcastHashJoin at least),
    // the O(corpus) verdict-flag frames must NOT be force-broadcast (the
    // review-found driver-OOM contradiction — at test scale AQE may still
    // CHOOSE broadcasts for them, which is why the pin is the absence of
    // cartesians/BNLJ plus the presence of the gram broadcast rather
    // than a join-strategy count), and no stage degenerates to a
    // cartesian or nested-loop product
    val p = plan("pipeline_curate_ledger")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("TPC-H q10/q18 keep dimension broadcasts and partial aggregation") {
    val p10 = plan("q_tpch_q10")
    assert(p10.contains("BroadcastHashJoin"), p10)
    val p18 = plan("q_tpch_q18")
    assert("HashAggregate".r.findAllIn(p18).size >= 2, p18) // partial + final on quantity sum
  }

  test("TPC-H q7 broadcasts all four dimensions; no cartesian anywhere") {
    val p = plan("q_tpch_q7")
    // supplier, customer, nation×2 all ride broadcast joins; the only
    // non-broadcast join is the lineitem⋈orders fact join
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ngram candidate generation is an equi-join on the content block key") {
    val p = plan("dedup_ngram_jaccard")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the blk = blk self-join must plan as a hash-partitioned equi-join
    assert(p.linesIterator.exists(l =>
      (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin")) && l.contains("blk")), p)
  }

  test("TPC-H q13 keeps the outer join outer (zero-order customers survive)") {
    val p = plan("q_tpch_q13")
    // the priority filter must ride the join condition, not a WHERE that
    // would let the optimizer rewrite LeftOuter → Inner
    assert(p.contains("LeftOuter") || p.contains("RightOuter"), p)
    val zero = SparkEntry.queries("q_tpch_q13")(spark, sfDir)
      .filter("c_count = 0").collect()
    assert(zero.nonEmpty && zero.head.getLong(1) > 0,
      "zero-order customer bucket missing")
  }

  test("TPC-H q21 plans semi + anti as equi-joins on l_orderkey, no cartesian") {
    val p = plan("q_tpch_q21")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("neither profiler pays Expand; approx stays one sketch-sized exchange") {
    val approx = plan("q_profile_columns_approx")
    assert(!approx.contains("Expand"), approx)
    // sketches merge map-side (partial HLL) and exactly one exchange moves
    // the fixed-size sketch buffers, not rows
    assert(approx.contains("partial_approx_count_distinct"), approx)
    assert("Exchange".r.findAllIn(approx).size == 1, approx)
    // [r14] the exact witness no longer expands either: its multi-distinct
    // became four per-column two-level aggregates (measured 5.7 → 1.0 s at
    // sf0.1). Pin the no-Expand shape AND the remaining honest asymmetry —
    // the exact path still moves one exchange of DISTINCT VALUES per
    // profiled column (unbounded in the cardinality), where the approx
    // path's single exchange is sketch-sized whatever the data.
    val exact = plan("q_profile_columns")
    assert(!exact.contains("Expand"), exact)
    assert("partial_count\\(distinct".r.findAllIn(exact.toLowerCase).isEmpty, exact)
    assert("Exchange hashpartitioning".r.findAllIn(exact).size >= 4,
      s"expected one distinct exchange per profiled column:\n$exact")
  }

  test("TPC-H q4 plans the EXISTS as a left-semi join; q14 broadcasts part") {
    val p4 = plan("q_tpch_q4")
    assert(p4.contains("LeftSemi"), p4)
    assert(!p4.contains("CartesianProduct"), p4)
    val p14 = plan("q_tpch_q14")
    assert(p14.contains("BroadcastHashJoin"), p14)
  }

  test("PQ family: flat PQ is the documented broadcast scan; IVF-PQ prunes first") {
    // flat PQ intentionally scans every code row (compressed exhaustive
    // scan — the documented trade), so its one nested-loop join must be
    // the 10-row broadcast distance table, nothing larger
    val flat = plan("ann_pq_topk")
    assert(!flat.contains("CartesianProduct"), flat)
    // IVF-PQ's candidate set comes from equi-joins (probes ⋈ assignment ⋈
    // codes); the only acceptable nested loop is the tiny probes×seeds pass
    val ivfpq = plan("ann_ivfpq_topk")
    assert(!ivfpq.contains("CartesianProduct"), ivfpq)
    assert(ivfpq.contains("BroadcastHashJoin"), ivfpq)
  }

  test("pagerank derives the co-purchase edge table exactly once") {
    // the directed edges are materialized BEFORE the undirected union —
    // Spark does not deduplicate common subplans across union branches, so
    // caching after the union would run the basket self-join + support
    // aggregate twice. Pinned: every consumer (degree + both contribution
    // rounds, two union branches each) reads the cache, so the final plan
    // touches lineitem zero times — the expensive derivation happened once,
    // inside the single materialization job.
    // tree walk, not string match: the plan STRING prints the cached
    // derivation inside InMemoryRelation, but InMemoryTableScanExec is a
    // leaf of the executed tree — a collect stops there, so any
    // FileSourceScanExec found is a genuinely re-executed scan
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[SparkPlan] =
      p.collect { case n => Seq(n) }.flatten ++
        p.collect { case a: AdaptiveSparkPlanExec => walk(a.executedPlan) }.flatten ++
        p.collect { case q: QueryStageExec => walk(q.plan) }.flatten
    val df = SparkEntry.queries("q_pagerank_iter")(spark, sfDir)
    val nodes = walk(df.queryExecution.executedPlan)
    val liScans = nodes.collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("lineitem")) => f
    }
    assert(liScans.isEmpty, s"lineitem re-scanned outside the cache:\n${df.queryExecution.executedPlan}")
    assert(nodes.count(_.isInstanceOf[InMemoryTableScanExec]) >= 2,
      df.queryExecution.executedPlan.toString)
  }

  test("TPC-H decorrelation family: q17/q2 window-decorrelate on ONE fact scan") {
    // the correlated-scalar shapes must NOT plan as fact self-joins: the
    // per-group aggregate is a window over the already-filtered fact, so
    // each query reads lineitem exactly once and nothing is cartesian
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[SparkPlan] =
      p.collect { case n => Seq(n) }.flatten ++
        p.collect { case a: AdaptiveSparkPlanExec => walk(a.executedPlan) }.flatten ++
        p.collect { case q: QueryStageExec => walk(q.plan) }.flatten
    for (q <- Seq("q_tpch_q17", "q_tpch_q2", "q_tpch_q9")) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      val nodes = walk(df.queryExecution.executedPlan)
      val liScans = nodes.collect {
        case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("lineitem")) => f
      }
      assert(liScans.size == 1, s"$q scans lineitem ${liScans.size}× (want 1)")
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$q went cartesian:\n$p")
      assert(p.contains("Window"), s"$q lost the window decorrelation:\n$p")
      assert(p.contains("BroadcastHashJoin"), s"$q lost the broadcast dims:\n$p")
    }
  }

  test("TPC-H q20 reads the pairs aggregate from cache; IN plans as left-semi") {
    // pairs feeds BOTH the scalar threshold and the IN filter — without the
    // Materialize the fact aggregate would execute twice (branch subplans
    // are never shared); the only lineitem scan lives inside the
    // materialization job, so the final plan touches lineitem zero times
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[SparkPlan] =
      p.collect { case n => Seq(n) }.flatten ++
        p.collect { case a: AdaptiveSparkPlanExec => walk(a.executedPlan) }.flatten ++
        p.collect { case q: QueryStageExec => walk(q.plan) }.flatten
    val df = SparkEntry.queries("q_tpch_q20")(spark, sfDir)
    val nodes = walk(df.queryExecution.executedPlan)
    val liScans = nodes.collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("lineitem")) => f
    }
    assert(liScans.isEmpty,
      s"lineitem re-scanned outside the pairs cache:\n${df.queryExecution.executedPlan}")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), s"IN did not plan as a semi join:\n$p")
  }

  test("TPC-H q8/q9/q19 broadcast dimensions, no cartesian; q16 anti-joins the NOT IN") {
    for (q <- Seq("q_tpch_q8", "q_tpch_q9", "q_tpch_q19")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q went cartesian:\n$p")
      assert(p.contains("BroadcastHashJoin"), s"$q lost the broadcast dims:\n$p")
    }
    val p16 = plan("q_tpch_q16")
    assert(p16.contains("LeftAnti"), s"NOT IN did not plan as anti join:\n$p16")
  }

  test("TPC-H q11/q15 read their Materialized aggregate from cache") {
    // both queries consume one expensive fact aggregate from two branches
    // (scalar threshold/max + the filter) — the q20 branch-sharing
    // discipline: the final plan must not re-scan lineitem
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[SparkPlan] =
      p.collect { case n => Seq(n) }.flatten ++
        p.collect { case a: AdaptiveSparkPlanExec => walk(a.executedPlan) }.flatten ++
        p.collect { case q: QueryStageExec => walk(q.plan) }.flatten
    for (q <- Seq("q_tpch_q11", "q_tpch_q15")) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      val liScans = walk(df.queryExecution.executedPlan).collect {
        case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("lineitem")) => f
      }
      assert(liScans.isEmpty,
        s"$q re-scans lineitem outside the cache:\n${df.queryExecution.executedPlan}")
    }
  }

  test("filtered ANN pushes the metadata predicate to the corpus scan") {
    // hybrid search's scale property: the label filter must reach the
    // parquet scan (only matching rows are decoded/assigned), not run
    // post-assignment
    val p = plan("ann_filtered_topk")
    assert(p.contains("EqualTo(label,3)"), p)
  }

  test("BM25 broadcasts query terms and df; top-k plans as WindowGroupLimit") {
    // the lexical-search scale contract: the postings side joins the query
    // set and per-term df as BROADCASTS (a conf regression shuffling the
    // postings for a 12-row query join would be invisible in results), and
    // the rank<=k filter must reach the WindowGroupLimit operator so
    // per-partition top-k prunes before the window shuffle
    val p = plan("search_bm25_topk")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("prefix-filter dedup: every join is an equi-join, no cartesian") {
    val p = plan("dedup_prefix_filter")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("substring-dedup pair generation is an equi-join on the gram digest") {
    val p = plan("dedup_substring")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the g = g self-join must plan as a hash equi-join on the digest, with
    // the doc_id < doc_id orientation as a join condition, not a cross
    assert(p.linesIterator.exists(l =>
      (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin")) && l.contains("g#")), p)
  }

  test("Bloom runtime filter: three broadcast semi-joins prune the fact side") {
    // the pre-filter must plan as broadcast left-semi probes of the ≤ m-row
    // position set (a shuffled semi here would cost more than the join it
    // guards), and the filter must actually prune: pass < probe rows, with
    // zero escaping matches (no false negatives, by construction)
    val p = plan("q_join_bloom")
    assert("BroadcastHashJoin .*LeftSemi".r.findAllIn(p).size >= 3, p)
    assert(!p.contains("CartesianProduct"), p)
    val st = SparkEntry.queries("q_join_bloom_stats")(spark, sfDir).collect().head
    val (nProbe, nPass, nMatch) =
      (st.getLong(st.fieldIndex("n_probe")), st.getLong(st.fieldIndex("n_bloom_pass")),
        st.getLong(st.fieldIndex("n_match")))
    assert(nPass < nProbe, s"bloom did not prune: $nPass of $nProbe passed")
    assert(nPass >= nMatch, "bloom dropped a true match (false negative)")
  }

  test("CDC apply: changelog shuffles once — compaction partitioning feeds the merge") {
    // the q_cdc_apply scale contract: latest-wins compaction plans as
    // WindowGroupLimit (per-partition top-1 prunes BEFORE the shuffle, so a
    // hot key's op history never materializes full ranks), and the window's
    // hash partitioning on the merge key is REUSED by the full-outer join —
    // no exchange may sit between the Window and the SortMergeJoin. String
    // shape: in the executed plan the join's streamed/buffered sides appear
    // as children; an Exchange between Window and SortMergeJoin would print
    // on the path from the join to the window.
    val p = plan("q_cdc_apply")
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("CartesianProduct"), p)
    // at most: base side (k), changelog side (k), agg (status), sort
    // (range) — a 5th exchange means the reuse broke
    val exchanges = "Exchange (hash|range)partitioning".r.findAllIn(p).size
    assert(exchanges <= 4, s"$exchanges exchanges:\n$p")
    // tree check (string order interleaves the two join subtrees): walking
    // DOWN from the join's changelog side, a Window must appear before any
    // shuffle — the compaction's partitioning feeds the merge directly
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    def walk(n: SparkPlan): Seq[SparkPlan] =
      n.collect { case x => Seq(x) }.flatten ++
        n.collect { case a: AdaptiveSparkPlanExec => walk(a.executedPlan) }.flatten ++
        n.collect { case q: QueryStageExec => walk(q.plan) }.flatten
    val df = SparkEntry.queries("q_cdc_apply")(spark, sfDir)
    val smj = walk(df.queryExecution.executedPlan).collectFirst {
      case j: SortMergeJoinExec => j
    }.getOrElse(fail(s"no SortMergeJoin:\n$p"))
    def windowBeforeShuffle(n: SparkPlan): Option[Boolean] = n match {
      case _: WindowExec => Some(true)
      case _: ShuffleExchangeExec => Some(false)
      case other => other.children.view.flatMap(windowBeforeShuffle).headOption
    }
    val sides = Seq(smj.left, smj.right).flatMap(windowBeforeShuffle)
    assert(sides.contains(true), s"no join side reaches a Window shuffle-free:\n$p")
  }

  test("k-center assignment is join-free map scoring: literal centers, one aggregate") {
    // the kcenterTrain scale contract served through ann_kcenter_assign:
    // centers are baked in as literal columns, so the corpus-side scoring
    // has NO join operator of any kind — just a projection feeding the
    // K-group aggregate (partial + final) and the output sort
    val p = plan("ann_kcenter_assign")
    assert(!p.contains("Join"), s"scoring should be join-free:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // map-side combine
  }

  test("dsir sampling windows per-source and broadcasts the offset table") {
    // the prefix-sum scale contract: the cumulative sum is a per-SOURCE
    // window (parallel across sources), never a global single-partition
    // window, and the control-plane offset table rides a broadcast join
    val p = plan("pipeline_dsir_sample")
    val winLine = p.linesIterator.find(_.contains("windowspecdefinition"))
      .getOrElse(fail(s"no window in plan:\n$p"))
    assert(winLine.contains("source#"),
      s"window must partition by source, not run globally:\n$winLine")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("perceptron serving scores through a broadcast weight join") {
    // text_linear_classify's corpus side: the feature census partial-aggs
    // before its shuffle, and the 65-row weight table joins as a broadcast
    // — the corpus never shuffles for the scoring itself
    val p = plan("text_linear_classify")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("dsir weights broadcast the target census; no cartesian beyond the 1-row globals") {
    val p = plan("pipeline_dsir_weights")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("priority sampling plans as TakeOrdered — per-partition heaps, no corpus sort") {
    // the one-pass weighted-sample contract: a map-only priority projection
    // into TakeOrderedAndProject (k·P rows move), never a global Sort+Limit
    val p = plan("pipeline_sample_priority")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), s"global sort leaked:\n$p")
  }

  test("bloom decontamination: fixed-geometry position sets ride broadcast semi-joins") {
    val p = plan("pipeline_decontaminate_bloom")
    // both per-hash membership tests must be broadcast (the bitset stand-in)
    assert("BroadcastHashJoin.*LeftSemi".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("priority-sampling HT estimator: unit bridge holds (estimate brackets truth)") {
    val r = SparkEntry.queries("pipeline_sample_priority_est")(spark, sfDir).collect()
    assert(r.length == 1)
    val (truth, est, n) = (r(0).getAs[Long]("exact_total_tokens"),
      r(0).getAs[Long]("ht_est_tokens"), r(0).getAs[Long]("n_sample"))
    assert(n == 100, s"sample size $n")
    // τ mis-scaled by 2^40 collapses est to Σ_sample w_i (≈ truth·k/N ≈
    // 20% here); correct 2^20 bridging keeps a k=100-of-500 draw within
    // a loose ±50% of the corpus total. This pins the scale, not luck.
    assert(est > truth / 2 && est < truth * 2, s"est $est vs truth $truth")
  }

  test("gopher rules are one map-only projection — no exchange below the output sort") {
    // the rule battery's scale contract: a pure scan-side projection that
    // fuses into whatever consumes it; the only exchange in the plan is
    // the final total-order sort's range partitioning
    val p = plan("text_gopher_rules")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Exchange hashpartitioning"),
      s"rule projection must not shuffle:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"rule projection must not join:\n$p")
  }

  test("temperature mix: allocation is control-plane, corpus pays census + rank window") {
    // the n_langs-row apportionment must reach the per-doc realization as
    // a BROADCAST join (the corpus is never shuffled against the
    // allocation table), the corpus scan must prune to (doc_id, lang),
    // and the only cross joins are the declared 1-row bounds. (Exchange
    // COUNT is deliberately not pinned: the allocation control plane
    // aggregates ≤ n_langs-row frames several times, which is free but
    // textually indistinguishable from corpus shuffles.)
    val p = plan("pipeline_mix_temperature")
    assert(p.contains("BroadcastHashJoin"),
      s"allocation must broadcast into the realization join:\n$p")
    val scanLine = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scanLine.contains("doc_id") && scanLine.contains("lang") &&
      !scanLine.contains("text"),
      s"corpus scan must prune to (doc_id, lang): $scanLine")
  }

  test("CUSUM plans as two stacked windows over the hourly aggregate") {
    // the prefix-minus-running-min identity's plan shape: the hourly
    // pre-aggregate sits BELOW both window passes, so window input grows
    // with the time span, never the event volume
    val p = plan("q_events_cusum")
    assert(!p.contains("CartesianProduct"), p)
    val aggPos = p.indexOf("HashAggregate")
    val winPos = p.indexOf("Window")
    // plans print root-first, so the window consuming the hour-grain
    // aggregate must appear BEFORE any aggregate in the text
    assert(winPos >= 0 && aggPos > winPos,
      s"windows must consume the hour-grain aggregate:\n$p")
  }

  test("WAND audit: UB census and theta reach the candidate join broadcast") {
    // the skip audit must never shuffle the postings side for the tiny
    // per-term UB table or the 4-row theta — both broadcast
    val p = plan("search_wand_bound")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), s"UB/theta must broadcast:\n$p")
  }

  test("interval sweep: window runs over the day grain, and the curve closes at zero") {
    // scale contract: the prefix-sum window's input is the day-grain delta
    // table (an aggregate), never fact rows — the plan must show the
    // partial+final aggregates BELOW the window, and the fact side joins
    // on the order key without a cartesian
    val p = plan("q_interval_sweep")
    assert(!p.contains("CartesianProduct"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    val winPos = p.indexOf("Window")
    val aggPos = p.indexOf("HashAggregate")
    assert(winPos >= 0 && aggPos > winPos,
      s"window must sit above the grain aggregate:\n$p")
    // sweep invariant: every interval that opens also closes, so the
    // cumulative curve is non-negative throughout and ends exactly at 0
    val rows = SparkEntry.queries("q_interval_sweep")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("open_lines") >= 0L))
    assert(rows.last.getAs[Long]("open_lines") == 0L,
      s"curve must close at zero, got ${rows.last}")
    assert(rows.map(_.getAs[Long]("n_enter")).sum ==
      rows.map(_.getAs[Long]("n_exit")).sum)
  }
}
