package graft

import org.apache.spark.sql.functions._

/** Physical-layout levers that matter at fleet scale: hive-style partitioned
  * writes must prune at the scan (read only matching directories), and
  * bucketed tables must co-locate equi-joins (no shuffle exchange).
  */
class PartitionBucketSpec extends SparkSpec {

  private lazy val tmp = java.nio.file.Files.createTempDirectory("graft-layout").toString

  test("partitionBy write prunes partitions on a filtered read") {
    val path = s"$tmp/orders_by_status"
    Tables.orders(spark, sfDir).write
      .mode("overwrite").partitionBy("o_orderstatus").parquet(path)

    val read = spark.read.parquet(path).filter(col("o_orderstatus") === "F")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus"), plan)

    // pruning is real: fewer files scanned than exist across all partitions
    val scanned = read.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.totalNumberOfFiles }
    def parquetFiles(d: java.io.File): Long =
      Option(d.listFiles()).getOrElse(Array.empty).map { f =>
        if (f.isDirectory) parquetFiles(f)
        else if (f.getName.endsWith(".parquet")) 1L else 0L
      }.sum
    val allFiles = parquetFiles(new java.io.File(path))
    val allParts = new java.io.File(path).listFiles().count(_.getName.startsWith("o_orderstatus="))
    assert(allParts >= 2) // multiple status partitions exist on disk
    assert(scanned.exists(n => n >= 1 && n < allFiles), s"scanned=$scanned of $allFiles")
    val expected = Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "F").count()
    assert(read.count() == expected)
  }

  test("persisted IVF index: probe scans only probed cells, top-k unchanged") {
    // SURVEY §8's ANN scale claim, pinned: the inverted file written
    // partitionBy(cell) must let the nprobe query prune to probed cells at
    // the FILE SOURCE, and the pruned probe must return exactly ann_ivf_topk
    import graft.operators.SimilarityQueries
    val path = s"$tmp/ivf_index"
    SimilarityQueries.writeIvfIndex(spark, sfDir, path)
    val partsOnDisk = new java.io.File(path).listFiles()
      .count(_.getName.startsWith("cell="))
    assert(partsOnDisk > 4, s"expected >4 cell partitions, got $partsOnDisk")

    val probed = SimilarityQueries.ivfTopkFromIndex(spark, sfDir, path)
    probed.collect() // finalize the adaptive plan before inspecting it
    // AQE hides scans inside query stages (leaf nodes to collect()) — walk
    // through AdaptiveSparkPlanExec/QueryStageExec explicitly
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect { case f: FileSourceScanExec => Seq(f) }.flatten ++
        p.collect { case a: AdaptiveSparkPlanExec => scans(a.executedPlan) }.flatten ++
        p.collect { case q: QueryStageExec => scans(q.plan) }.flatten
    val scanOfIndex = scans(probed.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("ivf_index")))
    assert(scanOfIndex.nonEmpty, probed.queryExecution.executedPlan.toString)
    // static partition pruning: the isin literal lands in PartitionFilters
    // and strictly fewer partition directories than exist are read
    assert(scanOfIndex.head.metadata("PartitionFilters").contains("cell"),
      scanOfIndex.head.metadata("PartitionFilters"))
    val partsRead = scanOfIndex.head.selectedPartitions.partitionCount
    assert(partsRead >= 1 && partsRead < partsOnDisk,
      s"read $partsRead of $partsOnDisk cell partitions — no pruning")

    val direct = SparkEntry.queries("ann_ivf_topk")(spark, sfDir)
    val cols = direct.columns.map(col).toSeq
    assert(probed.orderBy(cols: _*).collect().toSeq ==
      direct.orderBy(cols: _*).collect().toSeq)
  }

  test("incremental IVF append: bootstrap + append probes equal the full index") {
    // the ingest lifecycle: build the index over part of the corpus, append
    // the remainder against the SAME seed set — probes over the incremental
    // index must equal the inline full-corpus query (cells never move)
    import graft.operators.SimilarityQueries
    val path = s"$tmp/ivf_index_inc"
    SimilarityQueries.writeIvfIndexWhere(spark, sfDir, path, col("vec_id") < 400)
    SimilarityQueries.appendIvfIndex(spark, sfDir, path,
      Tables.embeddings(spark, sfDir).filter(col("vec_id") >= 400))
    val probed = SimilarityQueries.ivfTopkFromIndex(spark, sfDir, path)
    val direct = SparkEntry.queries("ann_ivf_topk")(spark, sfDir)
    val cols = direct.columns.map(col).toSeq
    assert(probed.orderBy(cols: _*).collect().toSeq ==
      direct.orderBy(cols: _*).collect().toSeq)
  }

  test("IVF index compaction: one file per cell afterwards, probe parity preserved") {
    // appends accumulate delta batches (the atomic insert-only route
    // never touches the standing cell files); compaction must fold the
    // window into a single file per cell, atomically, without changing
    // any probe result
    import graft.operators.SimilarityQueries
    val path = s"$tmp/ivf_index_cmp"
    SimilarityQueries.writeIvfIndexWhere(spark, sfDir, path, col("vec_id") < 300)
    SimilarityQueries.appendIvfIndex(spark, sfDir, path,
      Tables.embeddings(spark, sfDir).filter(col("vec_id") >= 300 && col("vec_id") < 400))
    SimilarityQueries.appendIvfIndex(spark, sfDir, path,
      Tables.embeddings(spark, sfDir).filter(col("vec_id") >= 400))
    // resolve through the manifest: compaction redirects the data pointer
    // to a fresh epoch directory instead of renaming over the old one
    def filesPerCell: Seq[Int] = new java.io.File(
        graft.sources.IndexManifest.dataPath(spark, path, path)).listFiles()
      .filter(_.getName.startsWith("cell=")).toSeq
      .map(_.listFiles().count(_.getName.endsWith(".parquet")))
    // the appends opened a two-batch delta window; the base files are
    // untouched (that is the atomicity: no standing file ever mutates)
    assert(graft.sources.IndexManifest.current(spark, path)
      .exists(_.deltas.size == 2), "appends must land as delta batches")
    assert(filesPerCell.forall(_ == 1), s"append mutated the base: $filesPerCell")
    SimilarityQueries.compactIvfIndex(spark, path)
    val after = filesPerCell
    assert(after.nonEmpty && after.forall(_ == 1), s"not compacted: $after")
    assert(graft.sources.IndexManifest.current(spark, path)
      .forall(_.deltas.isEmpty), "the fold must retire the delta window")
    val probed = SimilarityQueries.ivfTopkFromIndex(spark, sfDir, path)
    val direct = SparkEntry.queries("ann_ivf_topk")(spark, sfDir)
    val cols = direct.columns.map(col).toSeq
    assert(probed.orderBy(cols: _*).collect().toSeq ==
      direct.orderBy(cols: _*).collect().toSeq)
  }

  test("filtered probe on the persisted IVF index: cell pruning AND label pushdown") {
    // hybrid search over the index — BOTH pruning layers must appear on the
    // SAME scan: the probed-cell isin in PartitionFilters and the metadata
    // predicate in PushedFilters; results equal the inline filtered query
    import graft.operators.SimilarityQueries
    val path = s"$tmp/ivf_index_f"
    SimilarityQueries.writeIvfIndex(spark, sfDir, path)
    val probed = SimilarityQueries.ivfFilteredTopkFromIndex(spark, sfDir, path)
    probed.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect { case f: FileSourceScanExec => Seq(f) }.flatten ++
        p.collect { case a: AdaptiveSparkPlanExec => scans(a.executedPlan) }.flatten ++
        p.collect { case q: QueryStageExec => scans(q.plan) }.flatten
    val idxScan = scans(probed.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("ivf_index_f")))
    assert(idxScan.nonEmpty, probed.queryExecution.executedPlan.toString)
    assert(idxScan.head.metadata("PartitionFilters").contains("cell"),
      idxScan.head.metadata("PartitionFilters"))
    assert(idxScan.head.metadata("PushedFilters").contains("EqualTo(label,3)"),
      idxScan.head.metadata("PushedFilters"))
    val direct = SparkEntry.queries("ann_filtered_topk")(spark, sfDir)
    val cols = direct.columns.map(col).toSeq
    assert(probed.orderBy(cols: _*).collect().toSeq ==
      direct.orderBy(cols: _*).collect().toSeq)
  }

  test("persisted PQ index: probe reads codes + codebook only, never raw vectors") {
    // encode-once-probe-forever, pinned: after writePqIndex the probe's
    // only embeddings.parquet scan is the QUERY side (vec_id < N pushed to
    // the scan); the corpus is represented exclusively by the narrow codes
    // table, and the ranking equals the inline ann_pq_topk exactly
    import graft.operators.SimilarityQueries
    val path = s"$tmp/pq_index"
    SimilarityQueries.writePqIndex(spark, sfDir, path)

    val probed = SimilarityQueries.pqTopkFromIndex(spark, sfDir, path)
    probed.collect() // finalize the adaptive plan before inspecting it
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect { case f: FileSourceScanExec => Seq(f) }.flatten ++
        p.collect { case a: AdaptiveSparkPlanExec => scans(a.executedPlan) }.flatten ++
        p.collect { case q: QueryStageExec => scans(q.plan) }.flatten
    val allScans = scans(probed.queryExecution.executedPlan)
    val embScans = allScans.filter(
      _.relation.location.rootPaths.exists(_.toString.contains("embeddings")))
    // the query side is the ONLY raw-vector scan, and its filter is pushed
    assert(embScans.nonEmpty, probed.queryExecution.executedPlan.toString)
    embScans.foreach { f =>
      assert(f.metadata("PushedFilters").contains("LessThan(vec_id"),
        s"query-side filter not pushed: ${f.metadata("PushedFilters")}")
    }
    // the corpus side comes from the codes table — a scan of 8 small ints,
    // with no vector column in its read schema
    val codeScans = allScans.filter(
      _.relation.location.rootPaths.exists(_.toString.contains("pq_index/codes")))
    assert(codeScans.nonEmpty, probed.queryExecution.executedPlan.toString)
    codeScans.foreach { f =>
      val schema = f.schema.fieldNames.toSet
      assert(!schema.contains("v") && !schema.contains("embedding"),
        s"codes scan reads vectors: $schema")
    }

    val direct = SparkEntry.queries("ann_pq_topk")(spark, sfDir)
    val cols = direct.columns.map(col).toSeq
    assert(probed.orderBy(cols: _*).collect().toSeq ==
      direct.orderBy(cols: _*).collect().toSeq)
  }

  test("persisted IVF-PQ probe: cells prune, no scan reads a raw corpus vector") {
    // the fully-persisted serving path: IVF index supplies cell membership
    // (partition-pruned, column-pruned to (cell, vec_id)), PQ codes rank —
    // the ONLY vector read anywhere is the pushed-filter query side, and
    // the ranking equals the inline ann_ivfpq_topk
    import graft.operators.SimilarityQueries
    val ivfPath = s"$tmp/ivfpq_ivf"
    val pqPath = s"$tmp/ivfpq_pq"
    SimilarityQueries.writeIvfIndex(spark, sfDir, ivfPath)
    SimilarityQueries.writePqIndex(spark, sfDir, pqPath)
    val probed = SimilarityQueries.ivfPqTopkFromIndex(spark, sfDir, ivfPath, pqPath)
    probed.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect { case f: FileSourceScanExec => Seq(f) }.flatten ++
        p.collect { case a: AdaptiveSparkPlanExec => scans(a.executedPlan) }.flatten ++
        p.collect { case q: QueryStageExec => scans(q.plan) }.flatten
    val allScans = scans(probed.queryExecution.executedPlan)
    // IVF index scan: partition-pruned AND column-pruned (no stored vector)
    val idxScans = allScans.filter(
      _.metadata.get("Location").exists(_.contains("ivfpq_ivf")))
    assert(idxScans.nonEmpty, probed.queryExecution.executedPlan.toString)
    idxScans.foreach { f =>
      assert(f.metadata("PartitionFilters").contains("cell"),
        f.metadata("PartitionFilters"))
      assert(!f.schema.fieldNames.contains("v"),
        s"IVF membership scan reads stored vectors: ${f.schema.fieldNames.mkString(",")}")
    }
    // every embeddings scan is the query side (filter pushed)
    allScans.filter(
      _.relation.location.rootPaths.exists(_.toString.contains("embeddings")))
      .foreach { f =>
        assert(f.metadata("PushedFilters").contains("LessThan(vec_id"),
          s"corpus-side raw-vector scan leaked: ${f.metadata("PushedFilters")}")
      }
    val direct = SparkEntry.queries("ann_ivfpq_topk")(spark, sfDir)
    val cols = direct.columns.map(col).toSeq
    assert(probed.orderBy(cols: _*).collect().toSeq ==
      direct.orderBy(cols: _*).collect().toSeq)
  }

  test("persisted MinHash band index: corpus side joins from its buckets, unshuffled") {
    // dedup_incremental's Scaladoc claim made a pinned plan (the IVF-index
    // move applied to text dedup): the corpus band index written bucketBy(bk)
    // must feed the batch-vs-corpus candidate join WITHOUT a corpus-side
    // exchange, and the candidates read from the index must equal the
    // inline-derived ones.
    import graft.operators.DedupQueries
    val thr = DedupQueries.writeBandIndex(spark, sfDir, "band_idx", s"$tmp/band_idx")
    val d = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val batchBands = DedupQueries.bandKeysOf(
      DedupQueries.signaturesOf(d.filter(col("doc_id") >= thr)))
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prior = spark.conf.get(key)
    spark.conf.set(key, "-1") // a broadcast would bypass the bucket claim
    try {
      val idx = spark.table("band_idx").select(col("doc_id").as("c_id"), col("bk"))
      val cand = batchBands.join(idx, "bk").select("doc_id", "c_id").distinct()
      val got = cand.orderBy("doc_id", "c_id").collect()
      val plan = cand.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head // AQE appends a double-counting section
      assert(plan.contains("Bucketed: true"), plan)
      // exchanges: batch side into the join + the distinct — the bucketed
      // index side must NOT add a third
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges <= 2, s"index side shuffled ($exchanges exchanges):\n$plan")
      // parity: the persisted index yields exactly the inline candidates
      val all = DedupQueries.bandKeysOf(DedupQueries.signaturesOf(d))
      val inline = all.filter(col("doc_id") >= thr)
        .join(all.filter(col("doc_id") < thr).select(col("doc_id").as("c_id"), col("bk")), "bk")
        .select("doc_id", "c_id").distinct()
        .orderBy("doc_id", "c_id").collect()
      assert(got.nonEmpty && got.toSeq == inline.toSeq)
    } finally spark.conf.set(key, prior)
  }

  test("persisted winnow index: corpus fingerprints join from their buckets, unshuffled") {
    // the winnow family's serving claim made a pinned plan: the fp-bucketed
    // corpus fingerprint index must feed the batch probe join WITHOUT a
    // corpus-side exchange, and the index-served pairs must equal the
    // registered dedup_winnow_incremental (inline derivation) exactly.
    import graft.operators.{DedupQueries, TextQueries}
    val thr = DedupQueries.writeWinnowIndex(spark, sfDir, "winnow_idx", s"$tmp/winnow_idx")
    val d = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val bFps = TextQueries.winnowSelected(d.filter(col("doc_id") >= thr))
      .select(col("doc_id"), col("fp")).distinct()
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prior = spark.conf.get(key)
    spark.conf.set(key, "-1") // a broadcast would bypass the bucket claim
    try {
      val served = DedupQueries.winnowIncrementalPairs(bFps, spark.table("winnow_idx"))
      val got = served.orderBy("doc_id", "c_id").collect()
      val plan = served.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("Bucketed: true"), plan)
      assert(got.nonEmpty)
      val inline = SparkEntry.queries("dedup_winnow_incremental")(spark, sfDir)
        .collect()
      assert(got.toSeq == inline.toSeq,
        s"index-served pairs != inline pairs (${got.length} vs ${inline.length})")
    } finally spark.conf.set(key, prior)
  }

  test("winnow index append lifecycle: append-then-probe equals rebuild-then-probe") {
    // the daily-ingest claim: appending a day's fingerprints to the
    // standing bucketed table must yield the same probe results as
    // rebuilding the index over the union — per-doc-local rows and a
    // probe-time df cap make the append sound without rewrites
    import graft.operators.{DedupQueries, TextQueries}
    val d = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val thrRow = d.agg(expr("CAST((max(doc_id) + 1) * 4 div 5 AS BIGINT)")).head
    val thr = thrRow.getLong(0)
    val half = thr * 3 / 4
    // build over the older 3/4 of the corpus, append the newer quarter
    spark.sql("DROP TABLE IF EXISTS winnow_idx_appnd")
    val fps0 = TextQueries.winnowSelected(d.filter(col("doc_id") < half))
      .select(col("doc_id"), col("fp")).distinct()
    fps0.join(fps0.groupBy("doc_id").agg(count(lit(1)).as("n_fp_c")), "doc_id")
      .write.mode("overwrite").bucketBy(8, "fp").sortBy("fp")
      .option("path", s"$tmp/winnow_idx_appnd").saveAsTable("winnow_idx_appnd")
    DedupQueries.appendWinnowIndex(
      d.filter(col("doc_id") >= half && col("doc_id") < thr), "winnow_idx_appnd")
    val bFps = TextQueries.winnowSelected(d.filter(col("doc_id") >= thr))
      .select(col("doc_id"), col("fp")).distinct()
    // probe the VISIBLE view (base ∪ the append's delta batch — the
    // atomic append never touches the bucketed table's standing files)
    val appended = DedupQueries
      .winnowIncrementalPairs(bFps, DedupQueries.winnowIndexFrame(spark, "winnow_idx_appnd"))
      .orderBy("doc_id", "c_id").collect()
    val rebuilt = SparkEntry.queries("dedup_winnow_incremental")(spark, sfDir).collect()
    assert(appended.nonEmpty && appended.toSeq == rebuilt.toSeq,
      s"append-probe != rebuild-probe (${appended.length} vs ${rebuilt.length})")
  }

  test("winnow index append is replay-idempotent: the same batch twice changes nothing") {
    // the r13 guard, exercised: an at-least-once scheduler re-running an
    // append must not double the batch's fingerprint rows (doubled rows
    // double shared_fp and push df toward the cap — silent probe drift)
    import graft.operators.{DedupQueries, TextQueries}
    val d = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val thrRow = d.agg(expr("CAST((max(doc_id) + 1) * 4 div 5 AS BIGINT)")).head
    val thr = thrRow.getLong(0)
    val half = thr * 3 / 4
    spark.sql("DROP TABLE IF EXISTS winnow_idx_replay")
    val fps0 = TextQueries.winnowSelected(d.filter(col("doc_id") < half))
      .select(col("doc_id"), col("fp")).distinct()
    fps0.join(fps0.groupBy("doc_id").agg(count(lit(1)).as("n_fp_c")), "doc_id")
      .write.mode("overwrite").bucketBy(8, "fp").sortBy("fp")
      .option("path", s"$tmp/winnow_idx_replay").saveAsTable("winnow_idx_replay")
    val batch = d.filter(col("doc_id") >= half && col("doc_id") < thr)
    DedupQueries.appendWinnowIndex(batch, "winnow_idx_replay")
    def visibleRows = DedupQueries.winnowIndexFrame(spark, "winnow_idx_replay").count()
    def openDeltas = graft.sources.IndexManifest.current(spark,
        graft.sources.Tombstones.tableLocation(spark, "winnow_idx_replay"))
      .map(_.deltas.size).getOrElse(0)
    val rowsAfterFirst = visibleRows
    assert(openDeltas == 1, "the append must land as one delta batch")
    val bFps = TextQueries.winnowSelected(d.filter(col("doc_id") >= thr))
      .select(col("doc_id"), col("fp")).distinct()
    val probeAfterFirst = DedupQueries
      .winnowIncrementalPairs(bFps, DedupQueries.winnowIndexFrame(spark, "winnow_idx_replay"))
      .orderBy("doc_id", "c_id").collect()
    // the replay: same batch, appended again — a clean no-op (no visible
    // rows added AND no empty delta batch committed)
    DedupQueries.appendWinnowIndex(batch, "winnow_idx_replay")
    assert(visibleRows == rowsAfterFirst,
      "replayed append added rows — idempotency guard lost")
    assert(openDeltas == 1, "replayed append committed an empty delta batch")
    val probeAfterReplay = DedupQueries
      .winnowIncrementalPairs(bFps, DedupQueries.winnowIndexFrame(spark, "winnow_idx_replay"))
      .orderBy("doc_id", "c_id").collect()
    assert(probeAfterFirst.nonEmpty && probeAfterReplay.toSeq == probeAfterFirst.toSeq)
  }

  test("persisted prefix (PPJoin) index: probe equals inline, corpus rides its buckets") {
    // the exact-recall family's serving pin: batch prefixes join the
    // standing is_prefix rows from the x-bucketed inverted table, the
    // verify reads candidate docs through the doc_id-bucketed forward
    // table, and the served pairs equal the registered inline entry
    import graft.operators.DedupQueries
    val thr = DedupQueries.writePrefixIndex(spark, sfDir, "prefix_idx", s"$tmp/prefix_idx")
    val batch = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).filter(col("doc_id") >= thr)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prior = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val (idx, fwd) = DedupQueries.prefixIndexFrames(spark, "prefix_idx")
      val served = DedupQueries.prefixIncrementalPairs(batch, idx, fwd)
      val got = served.orderBy("doc_id", "c_id").collect()
      val plan = served.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("Bucketed: true"), plan)
      val inline = SparkEntry.queries("dedup_prefix_incremental")(spark, sfDir)
        .collect()
      assert(got.nonEmpty && got.toSeq == inline.toSeq,
        s"index-served pairs != inline (${got.length} vs ${inline.length})")
    } finally spark.conf.set(key, prior)
  }

  test("persisted phash index: corpus band keys join from their buckets, unshuffled") {
    // the media serving claim: the bk-bucketed original-asset signature
    // index must feed the re-encode probe join WITHOUT a corpus-side
    // exchange, and index-served matches must equal the registered
    // multimodal_phash_incremental exactly.
    import graft.operators.{Multimodal, MultimodalQueries}
    MultimodalQueries.writePhashIndex(spark, sfDir, "phash_idx", s"$tmp/phash_idx")
    val batchKeys = MultimodalQueries.phashBandKeys(
      Multimodal.perceptualHash(
        Multimodal.assetsWithVariants(spark, sfDir)
          .filter(col("asset_id") >= 1000000L)).toDF())
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prior = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val served = MultimodalQueries.phashProbePairs(batchKeys, spark.table("phash_idx"))
      val got = served.orderBy("asset_id", "src_id").collect()
      val plan = served.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("Bucketed: true"), plan)
      assert(got.nonEmpty)
      val inline = SparkEntry.queries("multimodal_phash_incremental")(spark, sfDir).collect()
      assert(got.toSeq == inline.toSeq,
        s"index-served matches != inline (${got.length} vs ${inline.length})")
    } finally spark.conf.set(key, prior)
  }

  test("nested struct scan prunes to the accessed subfield") {
    // the 100 TB lever for struct-heavy schemas (multimodal metadata,
    // event payloads): selecting meta.o_custkey must NOT read the sibling
    // subfields from parquet (spark.sql.optimizer.nestedSchemaPruning,
    // default on — pinned here so a conf regression can't silently
    // quadruple scan bytes)
    val path = s"$tmp/nested_orders"
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        struct(col("o_custkey"), col("o_totalprice"), col("o_orderpriority")).as("meta"))
      .write.mode("overwrite").parquet(path)
    val read = spark.read.parquet(path)
      .select(col("o_orderkey"), col("meta.o_custkey").as("custkey"))
    val scanLine = read.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scanLine.contains("o_custkey"), scanLine)
    assert(!scanLine.contains("o_totalprice") && !scanLine.contains("o_orderpriority"),
      s"nested pruning lost: $scanLine")
    assert(read.count() == Tables.orders(spark, sfDir).count())
  }

  test("persisted inverted index: probe pushes terms, rides buckets, equals inline") {
    // SearchQueries' serving claim, pinned: a BM25 probe against the
    // persisted postings table must (a) push its query-term list to the
    // postings scan as an In filter, (b) compute per-term df on the term
    // bucketing without an exchange, (c) never open the raw documents
    // parquet, and (d) return exactly the inline search_bm25_topk result.
    import graft.operators.SearchQueries
    val path = s"$tmp/search_idx"
    SearchQueries.writeSearchIndex(spark, sfDir, "search_idx", path)
    val probed = SearchQueries.bm25TopkFromIndex(spark, "search_idx", path)
    val got = probed.collect()
    val plan = probed.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head // AQE appends a double-counting section
    assert(plan.contains("Bucketed: true"), plan)
    assert("PushedFilters: \\[[^\\]]*In\\(term".r.findFirstIn(plan).isDefined, plan)
    assert(!plan.contains("documents.parquet"), s"probe read raw documents:\n$plan")
    // the only hash exchanges are the tiny post-scoring (q_id, doc_id)
    // aggregate and the per-query window — the postings side adds none
    // (df groupBy rides the bucketing; query/df/stats sides broadcast)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"postings side shuffled ($exchanges exchanges):\n$plan")
    val inline = SparkEntry.queries("search_bm25_topk")(spark, sfDir).collect()
    assert(got.nonEmpty && got.toSeq == inline.toSeq)
  }

  test("incremental inverted-index append: bootstrap + append probes equal inline") {
    // the ingest lifecycle for lexical search: index 80% of the corpus,
    // append the rest — probe-side df/stats see all segments, so scores
    // must equal the inline full-corpus query exactly
    import graft.operators.SearchQueries
    val path = s"$tmp/search_idx_inc"
    val thr = Tables.documents(spark, sfDir)
      .agg(expr("CAST((max(doc_id) + 1) * 4 div 5 AS BIGINT)")).head.getLong(0)
    SearchQueries.writeSearchIndexWhere(
      spark, sfDir, "search_idx_inc", path, col("doc_id") < thr)
    SearchQueries.appendSearchIndex(spark, "search_idx_inc", path,
      Tables.documents(spark, sfDir).filter(col("doc_id") >= thr)
        .select(col("doc_id"), col("text"), col("lang")))
    val probed = SearchQueries.bm25TopkFromIndex(spark, "search_idx_inc", path).collect()
    val inline = SparkEntry.queries("search_bm25_topk")(spark, sfDir).collect()
    assert(probed.nonEmpty && probed.toSeq == inline.toSeq)
  }

  test("inverted-index compaction: one file per bucket afterwards, probe parity") {
    // the atomic append opens a delta window (the standing bucket files
    // never mutate); compaction must fold the window back to one file per
    // bucket with every probe result intact
    import graft.operators.SearchQueries
    val path = s"$tmp/search_idx_c"
    val thr = Tables.documents(spark, sfDir)
      .agg(expr("CAST((max(doc_id) + 1) * 4 div 5 AS BIGINT)")).head.getLong(0)
    SearchQueries.writeSearchIndexWhere(
      spark, sfDir, "search_idx_c", path, col("doc_id") < thr)
    SearchQueries.appendSearchIndex(spark, "search_idx_c", path,
      Tables.documents(spark, sfDir).filter(col("doc_id") >= thr)
        .select(col("doc_id"), col("text"), col("lang")))
    val before = SearchQueries.bm25TopkFromIndex(spark, "search_idx_c", path).collect()
    def files(t: String): Array[String] = spark.table(t).inputFiles
    assert(files("search_idx_c").length <= 8, "append mutated the bucketed table")
    assert(graft.sources.IndexManifest.current(spark, path)
      .exists(_.deltas.size == 1), "the append must land as one delta batch")
    SearchQueries.compactSearchIndex(spark, "search_idx_c", path)
    val after = files("search_idx_c")
    assert(after.length <= 8, s"still ${after.length} files after compaction")
    assert(after.forall(_.contains("search_idx_c__c")), "location did not move")
    assert(graft.sources.IndexManifest.current(spark, path)
      .forall(_.deltas.isEmpty), "the fold must retire the delta window")
    val probed = SearchQueries.bm25TopkFromIndex(spark, "search_idx_c", path).collect()
    assert(probed.nonEmpty && probed.toSeq == before.toSeq)
    // the lifecycle composes: an append AFTER a compaction serves from the
    // visible view regardless of the table's moved location.
    // Re-append a disjoint id range by shifting ids out past the corpus.
    val extra = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 5)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"), col("lang"))
    SearchQueries.appendSearchIndex(spark, "search_idx_c", path, extra)
    val appended = SearchQueries.visiblePostings(spark, "search_idx_c", path)
      .filter(col("doc_id") >= 1000000L).select("doc_id").distinct().count()
    assert(appended == 5, s"append after compaction lost rows: $appended")
  }

  test("sharded indexes: probe-and-merge equals inline, only rank lists cross") {
    // SURVEY §11's distributed-search claim as a plan: each doc-parity
    // half-corpus index probes independently (shard-local n_docs/tt/df —
    // no global-stats round trip) and the merger fuses the two rank lists
    // by reciprocal rank. Must equal the registered inline sharded query,
    // and the boundary contract holds: a shard ships at most TOP_K rows
    // per query — a (q_id, doc_id, rank) list, never postings or scores.
    import graft.operators.SearchQueries
    val shards = (0 to 1).map { i =>
      val t = s"search_idx_sh$i"
      val p = s"$tmp/search_idx_sh$i"
      SearchQueries.writeSearchIndexWhere(
        spark, sfDir, t, p, pmod(col("doc_id"), lit(2)) === i)
      (t, p)
    }
    val merged = SearchQueries.shardedBm25FromIndexes(spark, shards)
    val got = merged.collect()
    val inline = SparkEntry.queries("search_sharded_rrf")(spark, sfDir).collect()
    assert(got.nonEmpty && got.toSeq == inline.toSeq)
    // the boundary bound, measured on an actual shard probe
    val shardList = SearchQueries.bm25TopkFromIndex(spark, shards.head._1, shards.head._2)
    val perQuery = shardList.groupBy("q_id").count().collect()
    assert(perQuery.nonEmpty && perQuery.forall(_.getLong(1) <= 10), perQuery.toSeq)
  }

  test("filtered probe on the inverted index: term AND lang push to one scan") {
    // the lexical filtered-search claim: the candidate-side postings scan
    // carries BOTH the query-term In-list and the metadata equality in its
    // pushed filters, and the probe equals the inline filtered query
    import graft.operators.SearchQueries
    val path = s"$tmp/search_idx_f"
    SearchQueries.writeSearchIndex(spark, sfDir, "search_idx_f", path)
    val probed = SearchQueries.bm25FilteredTopkFromIndex(
      spark, "search_idx_f", path, "en")
    val got = probed.collect()
    val plan = probed.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("documents.parquet"), s"probe read raw documents:\n$plan")
    // the plan-string PushedFilters list truncates at 100 chars, so assert
    // on the scan nodes: the candidate-side postings scan carries BOTH the
    // term In-list and the lang equality in its data filters, and the term
    // list additionally prunes BUCKETS (only the terms' hash buckets open)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect { case f: FileSourceScanExec => Seq(f) }.flatten ++
        p.collect { case a: AdaptiveSparkPlanExec => scans(a.executedPlan) }.flatten ++
        p.collect { case q: QueryStageExec => scans(q.plan) }.flatten
    val candScan = scans(probed.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("search_idx_f")))
      .find(_.dataFilters.exists(_.toString.contains("= en")))
    assert(candScan.isDefined, plan)
    assert(candScan.get.dataFilters.exists(e =>
      e.toString.contains("INSET") || e.toString.contains("in(term")), candScan.get.dataFilters)
    assert(candScan.get.optionalBucketSet.exists(_.cardinality() < 8),
      "term In-list did not prune buckets")
    val inline = SparkEntry.queries("search_bm25_filtered")(spark, sfDir).collect()
    assert(got.nonEmpty && got.toSeq == inline.toSeq)
  }

  test("phrase probe on the inverted index: words prune the scan, equals inline") {
    // the phrase-capable index claim: the probe reads only the phrase
    // words' postings (term In-list at the scan, raw text never opened)
    // and the adjacency join reproduces the inline positional result
    import graft.operators.SearchQueries
    val path = s"$tmp/search_idx_p"
    SearchQueries.writeSearchIndex(spark, sfDir, "search_idx_p", path)
    val probed = SearchQueries.phraseMatchFromIndex(spark, "search_idx_p", path)
    val got = probed.collect()
    val plan = probed.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("documents.parquet"), s"probe read raw documents:\n$plan")
    assert("PushedFilters: \\[[^\\]]*In\\(term".r.findFirstIn(plan).isDefined, plan)
    val inline = SparkEntry.queries("search_phrase_match")(spark, sfDir).collect()
    assert(got.nonEmpty && got.toSeq == inline.toSeq)
  }

  test("hybrid serving from persisted indexes: no text scan, cells prune, fusion parity") {
    // the full serving composition: lexical list from the bucketed postings
    // table, vector list from the partition-pruned IVF index, integer RRF
    // fuse — must equal fusing the two inline oracle-verified lists, and
    // the probe plan must read no raw document text
    import graft.operators.{SearchQueries, SimilarityQueries}
    val sPath = s"$tmp/search_idx_h"
    val iPath = s"$tmp/ivf_idx_h"
    SearchQueries.writeSearchIndex(spark, sfDir, "search_idx_h", sPath)
    SimilarityQueries.writeIvfIndex(spark, sfDir, iPath)
    val probed = SearchQueries.hybridTopkFromIndexes(
      spark, sfDir, "search_idx_h", sPath, iPath)
    val got = probed.collect()
    val plan = probed.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("documents.parquet"), s"probe read raw documents:\n$plan")
    assert(plan.contains("Bucketed: true"), plan) // postings side rides buckets
    // expected: fuse the two registered (oracle-verified) inline lists
    val bm = SparkEntry.queries("search_bm25_topk")(spark, sfDir)
      .select(col("q_id"), col("doc_id"), col("rank").as("rank_t"))
    val vec = SparkEntry.queries("ann_ivf_topk")(spark, sfDir)
      .filter(col("q_id") < 4)
      .select(col("q_id"), col("cand_id").as("doc_id"), col("rank").as("rank_v"))
    val expected = SearchQueries.rrfFuse(bm, vec).collect()
    assert(got.nonEmpty && got.toSeq == expected.toSeq)
  }

  test("persisted k-NN graph: point lookups prune to their buckets, rows equal inline") {
    // the "related items" serving layout: the graph written partitionBy
    // bucket must answer a point lookup from the matching bucket dirs only
    import graft.operators.SimilarityQueries
    val path = s"$tmp/knn_graph"
    SimilarityQueries.writeKnnGraph(spark, sfDir, path)
    val partsOnDisk = new java.io.File(path).listFiles()
      .count(_.getName.startsWith("bucket="))
    assert(partsOnDisk > 4, s"expected many bucket partitions, got $partsOnDisk")
    val ids = Seq(3L, 7L)
    val probed = SimilarityQueries.knnNeighborsFromGraph(spark, path, ids)
    val got = probed.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect { case f: FileSourceScanExec => Seq(f) }.flatten ++
        p.collect { case a: AdaptiveSparkPlanExec => scans(a.executedPlan) }.flatten ++
        p.collect { case q: QueryStageExec => scans(q.plan) }.flatten
    val scan = scans(probed.queryExecution.executedPlan)
      .find(_.metadata.get("Location").exists(_.contains("knn_graph")))
    assert(scan.isDefined, probed.queryExecution.executedPlan.toString)
    assert(scan.get.metadata("PartitionFilters").contains("bucket"),
      scan.get.metadata("PartitionFilters"))
    val partsRead = scan.get.selectedPartitions.partitionCount
    assert(partsRead >= 1 && partsRead < partsOnDisk,
      s"read $partsRead of $partsOnDisk bucket partitions — no pruning")
    val inline = SparkEntry.queries("ann_knn_graph")(spark, sfDir)
      .filter(col("vec_id").isin(ids.map(i => i: Any): _*)).collect()
    assert(got.nonEmpty && got.toSeq == inline.toSeq)
  }

  test("graph beam serving: reads only graph buckets + candidate vectors, equals inline") {
    // the HNSW/NSG-style serving probe over the persisted graph must (1)
    // return exactly the inline beam search's rows, (2) prune every graph
    // read to the beam's bucket partitions, and (3) fetch candidate
    // embeddings through a pushed vec_id In-list — never a corpus scan
    import graft.operators.SimilarityQueries
    import graft.functions.VectorOps
    val path = s"$tmp/knn_graph_beam"
    SimilarityQueries.writeKnnGraph(spark, sfDir, path)
    val partsOnDisk = new java.io.File(path).listFiles()
      .count(_.getName.startsWith("bucket="))
    val q = VectorOps.normalized(spark, sfDir).filter(col("vec_id") < 10)
    val served = SimilarityQueries.graphBeamFromIndex(spark, sfDir, path, q)
      .collect()
    val inline = SparkEntry.queries("ann_graph_beam_topk")(spark, sfDir).collect()
    assert(served.nonEmpty && served.toSeq == inline.toSeq)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect { case f: FileSourceScanExec => Seq(f) }.flatten ++
        p.collect { case a: AdaptiveSparkPlanExec => scans(a.executedPlan) }.flatten ++
        p.collect { case qs: QueryStageExec => scans(qs.plan) }.flatten
    // (2) the hop read the probe issues each round, audited directly (the
    // probe builds it through this same helper)
    val beamIds = Seq(0L, 3L, 5L)
    val hop = SimilarityQueries.beamHopRead(
      spark, path, beamIds, SimilarityQueries.KNN_BUCKETS)
    hop.collect()
    val hopScan = scans(hop.queryExecution.executedPlan)
      .find(_.metadata.get("Location").exists(_.contains("knn_graph_beam")))
    assert(hopScan.isDefined, hop.queryExecution.executedPlan.toString)
    assert(hopScan.get.metadata("PartitionFilters").contains("bucket"),
      hopScan.get.metadata("PartitionFilters"))
    val partsRead = hopScan.get.selectedPartitions.partitionCount
    assert(partsRead >= 1 && partsRead < partsOnDisk,
      s"read $partsRead of $partsOnDisk bucket partitions — no pruning")
    // (3) the candidate fetch: vec_id In-list pushed to the embeddings scan
    val cr = SimilarityQueries.beamCandRead(
      VectorOps.normalized(spark, sfDir), beamIds)
    cr.collect()
    val crScan = scans(cr.queryExecution.executedPlan)
      .find(_.metadata.get("Location").exists(_.contains("embeddings")))
    assert(crScan.isDefined, cr.queryExecution.executedPlan.toString)
    assert(crScan.get.metadata("PushedFilters").contains("In(vec_id"),
      crScan.get.metadata("PushedFilters"))
  }

  test("cross-modal serving from the persisted IVF index equals inline") {
    // text query → asset ranking through the shared embedding space: the
    // persisted-index probe + In-list metadata enrich must equal the
    // registered inline entry, and the asset-metadata fetch must PUSH its
    // candidate-id list to the documents scan (point lookups, never a
    // corpus metadata scan)
    import graft.operators.{MultimodalQueries, SimilarityQueries}
    val path = s"$tmp/ivf_crossmodal"
    SimilarityQueries.writeIvfIndex(spark, sfDir, path)
    val served = MultimodalQueries.crossmodalTopkFromIndex(spark, sfDir, path)
    val got = served.collect()
    val inline = SparkEntry.queries("multimodal_crossmodal_topk")(spark, sfDir)
      .collect()
    assert(got.nonEmpty && got.toSeq == inline.toSeq)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect { case f: FileSourceScanExec => Seq(f) }.flatten ++
        p.collect { case a: AdaptiveSparkPlanExec => scans(a.executedPlan) }.flatten ++
        p.collect { case q: QueryStageExec => scans(q.plan) }.flatten
    val docScan = scans(served.queryExecution.executedPlan)
      .find(_.metadata.get("Location").exists(_.contains("documents")))
    assert(docScan.isDefined, served.queryExecution.executedPlan.toString)
    assert(docScan.get.metadata("PushedFilters").contains("In(doc_id"),
      docScan.get.metadata("PushedFilters"))
  }

  test("trained-graph beam serving from the persisted index equals inline") {
    // writeRefinedKnnGraph pays the NN-Descent training once at build;
    // graphBeamFromIndex then serves the SAME walk the inline
    // ann_graph_beam_refined_topk runs — row-for-row equal, through the
    // identical bucket-pruned hop reads the seed-graph pin audits.
    import graft.operators.SimilarityQueries
    import graft.functions.VectorOps
    val path = s"$tmp/knn_graph_refined"
    SimilarityQueries.writeRefinedKnnGraph(spark, sfDir, path)
    val q = VectorOps.normalized(spark, sfDir).filter(col("vec_id") < 10)
    val served = SimilarityQueries.graphBeamFromIndex(spark, sfDir, path, q)
      .collect()
    val inline = SparkEntry.queries("ann_graph_beam_refined_topk")(spark, sfDir)
      .collect()
    assert(served.nonEmpty && served.toSeq == inline.toSeq)
  }

  test("persisted RP sketch: screen reads 16-dim rows, survivors fetched by In-list") {
    // the JL family's persisted path: (1) serving from the sketch equals
    // the inline form row-for-row, (2) the candidate re-rank reads full
    // embeddings through a PUSHED In-list — never a corpus scan — which is
    // what makes the 16-vs-64-dim sketch a 4× scan-IO win at scale
    import graft.operators.SimilarityQueries
    import graft.functions.VectorOps
    val path = s"$tmp/rp_sketch"
    SimilarityQueries.writeRpSketch(spark, sfDir, path)
    val served = SimilarityQueries.rpTopkFromSketch(spark, sfDir, path).collect()
    val inline = SparkEntry.queries("ann_rp_topk")(spark, sfDir).collect()
    assert(served.nonEmpty && served.toSeq == inline.toSeq)
    // the survivor fetch helper is the audited beamCandRead path — pin the
    // pushdown on the exact id list a served query uses
    val ids = served.map(_.getLong(2)).distinct.sorted.toSeq
    val cr = SimilarityQueries.beamCandRead(VectorOps.normalized(spark, sfDir), ids)
    cr.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect { case f: FileSourceScanExec => Seq(f) }.flatten ++
        p.collect { case a: AdaptiveSparkPlanExec => scans(a.executedPlan) }.flatten ++
        p.collect { case qs: QueryStageExec => scans(qs.plan) }.flatten
    val crScan = scans(cr.queryExecution.executedPlan)
      .find(_.metadata.get("Location").exists(_.contains("embeddings")))
    assert(crScan.isDefined, cr.queryExecution.executedPlan.toString)
    assert(crScan.get.metadata("PushedFilters").contains("In(vec_id"),
      crScan.get.metadata("PushedFilters"))
  }

  test("index sizing is a parameter: non-default sizes keep results exact") {
    // the sizing constants (postings buckets, knn buckets, IVF seeds) are
    // test-scale defaults with SURVEY §11 rules attached — this pins that a
    // resized build still serves correctly: probe results are invariant
    // under postings/knn bucket counts, maintenance ops derive the bucket
    // count from the catalog (never the default), and a resized IVF cell
    // grid serves the probe contract
    import graft.operators.{SearchQueries, SimilarityQueries}
    // postings at 4 buckets: probe parity + catalog-derived compaction
    val sp = s"$tmp/search_idx_nd"
    SearchQueries.writeSearchIndex(spark, sfDir, "search_idx_nd", sp, buckets = 4)
    val probed = SearchQueries.bm25TopkFromIndex(spark, "search_idx_nd", sp).collect()
    val inline = SparkEntry.queries("search_bm25_topk")(spark, sfDir).collect()
    assert(probed.nonEmpty && probed.toSeq == inline.toSeq)
    SearchQueries.compactSearchIndex(spark, "search_idx_nd", sp)
    val files = spark.table("search_idx_nd").inputFiles
    assert(files.length <= 4, s"compaction ignored the 4-bucket spec: ${files.length}")
    assert(SearchQueries.bm25TopkFromIndex(spark, "search_idx_nd", sp)
      .collect().toSeq == inline.toSeq)
    // knn graph at 4 buckets: point lookups equal the inline graph rows
    val kp = s"$tmp/knn_graph_nd"
    SimilarityQueries.writeKnnGraph(spark, sfDir, kp, buckets = 4L)
    val ids = Seq(3L, 7L)
    val knnGot = SimilarityQueries.knnNeighborsFromGraph(spark, kp, ids, nBuckets = 4L)
      .collect()
    val knnInline = SparkEntry.queries("ann_knn_graph")(spark, sfDir)
      .filter(col("vec_id").isin(ids.map(i => i: Any): _*)).collect()
    assert(knnGot.nonEmpty && knnGot.toSeq == knnInline.toSeq)
    // IVF at 8 seeds: the resized grid builds 8 cells and serves full top-k
    val ip = s"$tmp/ivf_index_nd"
    SimilarityQueries.writeIvfIndex(spark, sfDir, ip, nSeeds = 8)
    val cells = new java.io.File(ip).listFiles().count(_.getName.startsWith("cell="))
    assert(cells == 8, s"expected 8 cells, got $cells")
    val e = graft.functions.VectorOps.normalized(spark, sfDir)
    val q = e.filter(col("vec_id") < 4).select("vec_id", "v", "nrm")
    val perQuery = SimilarityQueries.ivfProbeIndex(spark, sfDir, ip, q, nSeeds = 8)
      .groupBy("q_id").count().collect()
    assert(perQuery.length == 4 && perQuery.forall(_.getLong(1) == 10), perQuery.toSeq)
  }

  test("persisted BPE model: single-pass apply equals the registered encode") {
    // the tokenizer lifecycle: train once (K census actions), persist the
    // merge table, apply from the model in ONE map stage (no census, no
    // per-round materialization) — results must equal the train-and-apply
    // registered query exactly
    import graft.operators.TextQueries
    val path = s"$tmp/bpe_model"
    TextQueries.writeBpeModel(spark, sfDir, path)
    assert(spark.read.parquet(path).count() == 10)
    val got = TextQueries.encodeFromBpeModel(spark, sfDir, path).collect()
    val direct = SparkEntry.queries("text_bpe_encode")(spark, sfDir).collect()
    assert(got.nonEmpty && got.toSeq == direct.toSeq)
  }

  test("BPE memo: rebuilt final state equals the training loop's cold state") {
    // rounds=4 is used by no registered query, so the first call runs the
    // real census loop and the second is a memo hit that composes the four
    // trained rewrites into one map stage over the word census — the merge
    // tables must be identical and the final word states row-for-row equal
    import graft.operators.TextQueries
    val (m1, w1) = TextQueries.bpeTrain(spark, sfDir, 4)
    val (m2, w2) = TextQueries.bpeTrain(spark, sfDir, 4)
    assert(m1.nonEmpty && m1 == m2)
    val cold = w1.select("w", "freq", "syms").collect().map(_.toString).sorted
    val hit = w2.select("w", "freq", "syms").collect().map(_.toString).sorted
    assert(cold.nonEmpty && cold.sameElements(hit))
  }

  test("sharded IVF indexes: probe-and-merge equals the single-index probe exactly") {
    // the ANN twin of the sharded-BM25 lifecycle test, with a stronger
    // contract: cosine scores are globally comparable with zero
    // coordination, so two half-corpus indexes probed independently and
    // merged by score must equal the registered single-corpus query
    // row-for-row (not an agreement percentage — exact)
    import graft.operators.SimilarityQueries
    val paths = (0 to 1).map { i =>
      val p = s"$tmp/ivf_shard$i"
      SimilarityQueries.writeIvfIndexWhere(
        spark, sfDir, p, pmod(col("vec_id"), lit(2)) === i)
      p
    }
    val merged = SimilarityQueries.shardedIvfTopkFromIndexes(spark, sfDir, paths)
    val got = merged.collect()
    val single = SparkEntry.queries("ann_ivf_topk")(spark, sfDir).collect()
    assert(got.nonEmpty && got.toSeq == single.toSeq)
  }

  test("trained-quantizer IVF index: persisted probe equals the inline trained top-k") {
    // the quantizer IS the cell geometry: an index built with the
    // one-Lloyd-iteration grid must be probed with the same grid, and the
    // persisted serving path must return exactly the inline trained-IVF
    // result (the seeded-index parity test, re-run under training)
    import graft.operators.SimilarityQueries
    import graft.functions.VectorOps
    val path = s"$tmp/ivf_index_tr"
    SimilarityQueries.writeIvfIndex(spark, sfDir, path, trained = true)
    val e = VectorOps.normalized(spark, sfDir)
    val q = e.filter(col("vec_id") < 10).select("vec_id", "v", "nrm")
    val probed = SimilarityQueries
      .ivfProbeIndex(spark, sfDir, path, q, trained = true)
    val inline = SimilarityQueries
      .ivfTopkWith(spark, sfDir, SimilarityQueries.trainedSeedSetOf(spark, sfDir))
    val cols = inline.columns.map(col).toSeq
    val got = probed.orderBy(cols: _*).collect()
    assert(got.nonEmpty && got.toSeq == inline.orderBy(cols: _*).collect().toSeq)
  }

  test("dynamic partition pruning: a runtime dim filter prunes the fact scan") {
    // the remaining scan lever: when the pruning value is only known at
    // RUNTIME (it comes from a filtered dimension, not a literal), the
    // partitioned fact must still read only matching partitions via DPP —
    // at 100 TB this is the difference between scanning one status
    // partition and the whole fact for every dim-driven report
    import spark.implicits._
    val fPath = s"$tmp/orders_dpp"
    val dPath = s"$tmp/status_dim"
    Tables.orders(spark, sfDir).write
      .mode("overwrite").partitionBy("o_orderstatus").parquet(fPath)
    Seq(("F", 1), ("O", 0), ("P", 0)).toDF("st", "flag")
      .write.mode("overwrite").parquet(dPath)
    val fact = spark.read.parquet(fPath)
    val dim = spark.read.parquet(dPath).filter(col("flag") === 1) // value not static
    val j = fact.join(dim, fact("o_orderstatus") === dim("st"))
      .agg(count(lit(1)).as("n"))
    val n = j.collect().head.getLong(0)
    assert(n == Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "F").count())
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect { case f: FileSourceScanExec => Seq(f) }.flatten ++
        p.collect { case a: AdaptiveSparkPlanExec => scans(a.executedPlan) }.flatten ++
        p.collect { case q: QueryStageExec => scans(q.plan) }.flatten
    val factScan = scans(j.queryExecution.executedPlan)
      .find(_.metadata.get("Location").exists(_.contains("orders_dpp")))
    assert(factScan.isDefined, plan)
    val partsOnDisk = new java.io.File(fPath).listFiles()
      .count(_.getName.startsWith("o_orderstatus="))
    // selectedPartitions is the STATIC listing; the runtime-pruned count
    // lands in the scan's numPartitions metric after execution
    val partsRead = factScan.get.metrics("numPartitions").value
    assert(partsOnDisk >= 3 && partsRead == 1,
      s"DPP read $partsRead of $partsOnDisk partitions")
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    Tables.orders(spark, sfDir).write
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$tmp/orders_bkt").saveAsTable("orders_bkt")
    Tables.lineitem(spark, sfDir).write
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$tmp/lineitem_bkt").saveAsTable("lineitem_bkt")

    // tables this small would broadcast (bucketing then irrelevant);
    // disable it to surface the co-located shuffle-free plan under test
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prior = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val joined = spark.table("orders_bkt").join(
        spark.table("lineitem_bkt"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan) // co-located: no shuffle
      assert(joined.count() ==
        Tables.orders(spark, sfDir).join(
          Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey")).count())
    } finally spark.conf.set(key, prior)
  }

  test("persisted SQ8 index: probe reads byte codes + 1-row stats, never raw vectors") {
    // the PQ encode-once-probe-forever pin applied to scalar quantization:
    // after writeSqIndex the only embeddings scan is the query side (filter
    // pushed); the corpus is the codes table, and the ranking equals the
    // inline ann_sq_topk exactly
    import graft.operators.SimilarityQueries
    val path = s"$tmp/sq_index"
    SimilarityQueries.writeSqIndex(spark, sfDir, path)

    val probed = SimilarityQueries.sqTopkFromIndex(spark, sfDir, path)
    probed.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect { case f: FileSourceScanExec => Seq(f) }.flatten ++
        p.collect { case a: AdaptiveSparkPlanExec => scans(a.executedPlan) }.flatten ++
        p.collect { case q: QueryStageExec => scans(q.plan) }.flatten
    val allScans = scans(probed.queryExecution.executedPlan)
    val embScans = allScans.filter(
      _.relation.location.rootPaths.exists(_.toString.contains("embeddings")))
    assert(embScans.nonEmpty, probed.queryExecution.executedPlan.toString)
    embScans.foreach { f =>
      assert(f.metadata("PushedFilters").contains("LessThan(vec_id"),
        s"query-side filter not pushed: ${f.metadata("PushedFilters")}")
    }
    val codeScans = allScans.filter(
      _.relation.location.rootPaths.exists(_.toString.contains("sq_index/codes")))
    assert(codeScans.nonEmpty, probed.queryExecution.executedPlan.toString)
    codeScans.foreach { f =>
      val schema = f.schema.fieldNames.toSet
      assert(!schema.contains("v") && !schema.contains("embedding"),
        s"codes scan reads vectors: $schema")
    }

    val direct = SparkEntry.queries("ann_sq_topk")(spark, sfDir)
    val cols = direct.columns.map(col).toSeq
    assert(probed.orderBy(cols: _*).collect().toSeq ==
      direct.orderBy(cols: _*).collect().toSeq)
  }

  test("SQ8 recall floor: 8x compression keeps recall@10 at or above 0.9") {
    // the compression family's headline claim pinned as a quality floor
    // (the z-order-win precedent): a quantization regression — wrong
    // rounding, swapped stats, off-by-one bucket midpoints — shows up as
    // recall collapse long before it breaks the oracle hash at a new SF
    val rows = SparkEntry.queries("ann_sq_recall")(spark, sfDir).collect()
    val avg = rows.map(_.getDouble(3)).sum / rows.length
    assert(avg >= 0.9, s"avg recall@10 $avg")
  }

  test("morton interleave is a bijection on the grid with known bit placement") {
    // the curve arithmetic everything in LayoutQueries rides on: distinct
    // (x, y) pairs must map to distinct z-values (a collision would merge
    // unrelated stat boxes), bit i of x lands at position 2i and of y at
    // 2i+1 (spot values), and the z-range is bounded by 4^bits
    import graft.operators.LayoutQueries
    import spark.implicits._
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("ck", "d")
      .withColumn("zv", expr(LayoutQueries.mortonSpark("ck", "d")))
    val n = grid.count()
    assert(grid.select("zv").distinct().count() == n)
    assert(grid.agg(max("zv")).head().getLong(0) < (1L << 12)) // 4^6
    val spot = grid.filter(col("ck") === 3 && col("d") === 5).head().getLong(2)
    // x=3 → bits 0,1 at even slots (1 + 4); y=5 → bits 0,2 at odd slots (2 + 32)
    assert(spot == 39L, s"morton(3, 5) = $spot")
  }

  test("z-order skipping audit: the curve layout scans fewer rows than either 1-d sort") {
    // the headline claim of the layout family, pinned so a constant
    // regression (file-grid granularity, rectangle placement) cannot
    // silently lose the demonstrated win; rows_matched must be
    // layout-invariant — it anchors that all three layouts answered the
    // same query
    val out = SparkEntry.queries("q_zorder_skipping")(spark, sfDir).collect()
    val scanned = out.map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(scanned("zorder") < scanned("custkey") &&
      scanned("zorder") < scanned("orderdate"), scanned)
    assert(out.map(_.getLong(4)).toSet.size == 1, out.toSeq)
  }

  test("persisted z-order layout: 2-d probe prunes z-buckets, equals full filter") {
    // LayoutQueries' persisted lifecycle: the sidecar-driven 2-d rectangle
    // probe must prune partition dirs at the file source (PartitionFilters on
    // zb) and return exactly what a full scan-and-filter returns — stat boxes
    // bound their rows, so a skipped bucket can hold no match.
    import graft.operators.LayoutQueries
    val path = s"$tmp/zorder_layout"
    LayoutQueries.writeZorderLayout(spark, sfDir, path)
    val partsOnDisk = new java.io.File(s"$path/data").listFiles()
      .count(_.getName.startsWith("zb="))
    assert(partsOnDisk > 8, s"expected >8 z-bucket partitions, got $partsOnDisk")

    // rectangle: the middle ~10% of each dimension, derived from the sidecar
    val all = spark.read.parquet(s"$path/data")
    val r = all.agg(min("ck"), max("ck"), min("d"), max("d")).head()
    val (ckMin, ckMax, dMin, dMax) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val (ckLo, ckHi) = (ckMin + (ckMax - ckMin) * 45 / 100, ckMin + (ckMax - ckMin) * 55 / 100)
    val (dLo, dHi) = (dMin + (dMax - dMin) * 45 / 100, dMin + (dMax - dMin) * 55 / 100)

    val probed = LayoutQueries.zorderRead(spark, path, ckLo, ckHi, dLo, dHi)
    probed.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect { case f: FileSourceScanExec => Seq(f) }.flatten ++
        p.collect { case a: AdaptiveSparkPlanExec => scans(a.executedPlan) }.flatten ++
        p.collect { case q: QueryStageExec => scans(q.plan) }.flatten
    val dataScan = scans(probed.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("zorder_layout")))
    assert(dataScan.nonEmpty, probed.queryExecution.executedPlan.toString)
    assert(dataScan.head.metadata("PartitionFilters").contains("zb"),
      dataScan.head.metadata("PartitionFilters"))
    val partsRead = dataScan.head.selectedPartitions.partitionCount
    assert(partsRead >= 1 && partsRead < partsOnDisk,
      s"read $partsRead of $partsOnDisk z-bucket partitions — no pruning")

    val expected = all
      .filter(col("ck").between(ckLo, ckHi) && col("d").between(dLo, dHi))
      .select("o_orderkey", "ck", "d")
    assert(probed.orderBy("o_orderkey").collect().toSeq ==
      expected.orderBy("o_orderkey").collect().toSeq)
    assert(probed.count() > 0)

    // bucket count is a sizing parameter: a non-default build must serve the
    // same rows (the probe derives buckets from the sidecar, not the count)
    val path2 = s"$tmp/zorder_layout_24"
    LayoutQueries.writeZorderLayout(spark, sfDir, path2, nBuckets = 24L)
    val parts24 = new java.io.File(s"$path2/data").listFiles()
      .count(_.getName.startsWith("zb="))
    assert(parts24 <= 24 && parts24 != partsOnDisk, s"got $parts24 partitions")
    val probed24 = LayoutQueries.zorderRead(spark, path2, ckLo, ckHi, dLo, dHi)
    assert(probed24.orderBy("o_orderkey").collect().toSeq ==
      expected.orderBy("o_orderkey").collect().toSeq)
  }

  test("k-word phrase probe on the inverted index: equals inline at k=3 and k=4, no raw-text read") {
    // the n-ary completion of the two-word phrase probe: positions
    // normalize to the phrase start, the chain anchors on the rarest word
    // (df from the index), and the same machinery serves any length
    import graft.operators.SearchQueries
    val path = s"$tmp/search_idx_kp"
    SearchQueries.writeSearchIndex(spark, sfDir, "search_idx_kp", path)
    val probed = SearchQueries.phraseKMatchFromIndex(spark, "search_idx_kp", path)
    val got = probed.collect()
    val inline = SparkEntry.queries("search_phrase_kmatch")(spark, sfDir).collect()
    assert(got.nonEmpty && got.toSeq == inline.toSeq)
    val plan = probed.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("documents.parquet"), s"probe read raw documents:\n$plan")
    // 4-word phrase through the SAME entry points (the length-generality
    // the registered trigram set cannot stage — this corpus 4-gram was
    // checked present at sf0.001)
    val four = Seq((0L, Seq("small", "big", "order", "scan")))
    val got4 = SearchQueries.phraseKMatchFromIndex(spark, "search_idx_kp", path, four).collect()
    val inline4 = SearchQueries.phraseKInline(spark, sfDir, four).collect()
    assert(got4.nonEmpty && got4.toSeq == inline4.toSeq)
  }

  test("index-served hard negatives: pruned-cell candidates, banded rank equals the registered entry") {
    // the r14 scale-claim made a pinned plan: the miner's candidate
    // generator is the persisted IVF probe (partition-pruned cell read),
    // the τ band applies after scoring, and rows equal the registered
    // inline `pipeline_hard_negatives_ivf` entry exactly
    import graft.operators.SimilarityQueries
    val path = s"$tmp/ivf_hn"
    SimilarityQueries.writeIvfIndex(spark, sfDir, path)
    val served = SimilarityQueries.hardNegativesFromIndex(spark, sfDir, path)
    val got = served.collect()
    val inline = SparkEntry.queries("pipeline_hard_negatives_ivf")(spark, sfDir).collect()
    assert(got.nonEmpty && got.toSeq == inline.toSeq)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect { case f: FileSourceScanExec => Seq(f) }.flatten ++
        p.collect { case a: AdaptiveSparkPlanExec => scans(a.executedPlan) }.flatten ++
        p.collect { case q: QueryStageExec => scans(q.plan) }.flatten
    val idxScan = scans(served.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("ivf_hn")))
    assert(idxScan.nonEmpty, served.queryExecution.executedPlan.toString)
    assert(idxScan.head.metadata("PartitionFilters").contains("cell"),
      idxScan.head.metadata("PartitionFilters"))
    val partsOnDisk = new java.io.File(path).listFiles()
      .count(_.getName.startsWith("cell="))
    val partsRead = idxScan.head.selectedPartitions.partitionCount
    assert(partsRead >= 1 && partsRead < partsOnDisk,
      s"read $partsRead of $partsOnDisk cell partitions — no pruning")
  }

  test("index-served decontamination: train meets eval only through the cell equi-join, equals the registered entry") {
    // the "eval set too big to broadcast" swap, served: the persisted
    // eval-side IVF index feeds the scoring join on the CELL id — never an
    // eval-broadcast nested loop over the corpus-scale train side
    import graft.operators.SimilarityQueries
    val path = s"$tmp/ivf_decon_eval"
    SimilarityQueries.writeIvfIndexWhere(spark, sfDir, path, col("vec_id") % 10 === 0)
    val served = SimilarityQueries.decontamVerdictsFromIndex(spark, sfDir, path)
      .orderBy(col("max_cos").desc, col("train_vec_id")).limit(100)
    val got = served.collect()
    val inline = SparkEntry.queries("pipeline_decontaminate_ivf")(spark, sfDir).collect()
    assert(got.nonEmpty && got.toSeq == inline.toSeq)
    // exactly one nested-loop join — the 16-row seed-geometry probe; the
    // train×eval meeting itself must be a hash/merge EQUI-join on seed_id
    val plan = served.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val bnlj = "BroadcastNestedLoopJoin".r.findAllMatchIn(plan).size
    assert(bnlj == 1, s"expected exactly the seeds BNLJ, found $bnlj:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    // the eval side reads the persisted index, not a re-derivation
    assert(plan.contains("ivf_decon_eval"), plan)
  }
}
