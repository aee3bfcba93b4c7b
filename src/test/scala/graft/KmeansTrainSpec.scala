package graft

import graft.functions.VectorOps
import graft.operators.SimilarityQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The convergence behavior `ann_kmeans_train` cannot demonstrate on the
  * driver's corpus: Lloyd EARLY-STOPS when the data actually has clusters.
  * The driver embeddings are uniform (no structure to converge to — the
  * movement curve plateaus above tolerance, see the kmeansTrain operating
  * note); here the same loop runs on a well-separated mixture where each
  * seed lands in its own cluster, so iteration 1 moves every centroid to
  * its cluster mean and iteration 2 measures zero movement — the early
  * stop fires and the loop ends under budget.
  */
class KmeansTrainSpec extends SparkSpec {

  private val DIM = 16
  private val N_CLUSTERS = 8
  private val N_VECS = 240

  /** Deterministic mixture corpus (the NnDescentSpec recipe): 8 separated
    * centers, points = center + 0.1·noise, cluster id = vec_id % 8 — so
    * seeds vec_id < 8 cover every cluster exactly once.
    */
  private def clusteredCorpus: DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(N_CLUSTERS, DIM)(rnd.nextDouble() * 2 - 1)
    val rows = (0 until N_VECS).map { i =>
      val c = centers(i % N_CLUSTERS)
      (i.toLong, c.map(x => x + (rnd.nextDouble() * 2 - 1) * 0.1).toSeq)
    }
    val path = java.nio.file.Files.createTempDirectory("graft-kmt").toString + "/e"
    rows.toDF("vec_id", "v").write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
      .withColumn("nrm", expr(s"sqrt(${VectorOps.dotExpr("v", "v")})"))
  }

  test("Lloyd loop early-stops on clustered data (movement hits zero)") {
    val rows = SimilarityQueries
      .kmeansTrain(clusteredCorpus, nSeeds = N_CLUSTERS, maxIters = 6, tolNano = 1L)
      .collect()
    assert(rows.nonEmpty && rows.length < 6,
      s"expected early stop under the 6-iteration budget, got ${rows.length} rows")
    val last = rows.last
    assert(last.getBoolean(2), "last executed iteration must report converged")
    assert(last.getLong(1) == 0L,
      s"separated clusters converge EXACTLY (zero grid movement), got shift ${last.getLong(1)}")
    // every earlier iteration was above tolerance, or the loop would have stopped
    rows.init.foreach(r => assert(!r.getBoolean(2) && r.getLong(1) >= 1L))
    // iters numbered 1..n
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq)
  }

  test("IVF recall on planted clusters: the trained quantizer is never worse than seeds") {
    // the complement of ann_recall_vs_nprobe's operating note: on the
    // driver's UNIFORM embeddings one Lloyd iteration measurably DROPPED
    // recall (why the shipped default stays seeded there); this pins the
    // other geometry — on a clustered corpus with noisy seed points the
    // trained grid (cluster means) must match or beat raw seeds, the
    // "train on clustered data" rule as a measured number on BOTH regimes.
    import org.apache.spark.sql.expressions.Window
    // much noisier mixture than the Lloyd pin (0.8 vs 0.1), probed at
    // nprobe=1: seed POINTS sit well off their cluster means, cluster
    // shells overlap, and with a single probed cell the Voronoi boundary
    // quality of the quantizer is the whole recall story
    val rnd = new scala.util.Random(23)
    val centers = Array.fill(N_CLUSTERS, DIM)(rnd.nextDouble() * 2 - 1)
    val rows = (0 until N_VECS).map { i =>
      val c = centers(i % N_CLUSTERS)
      (i.toLong, c.map(x => x + (rnd.nextDouble() * 2 - 1) * 0.8).toSeq)
    }
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-ivfrec").toString + "/e"
    rows.toDF("vec_id", "v").write.mode("overwrite").parquet(path)
    val e = spark.read.parquet(path)
      .withColumn("nrm", expr(s"sqrt(${VectorOps.dotExpr("v", "v")})"))
      .localCheckpoint(true)
    val K = 10
    val truthW = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("nbr_id"))
    val truth = e.select(col("vec_id"), col("v").as("av"), col("nrm").as("an"))
      .join(e.select(col("vec_id").as("nbr_id"), col("v").as("bv"), col("nrm").as("bn")),
        col("vec_id") =!= col("nbr_id"))
      .select(col("vec_id"), col("nbr_id"),
        VectorOps.cosCol("av", "bv", "an", "bn").as("cos"))
      .withColumn("rank", row_number().over(truthW))
      .filter(col("rank") <= K).select("vec_id", "nbr_id")
      .localCheckpoint(true)
    def ivfRecall(seeds: DataFrame): Double = {
      val sd = seeds.localCheckpoint(true)
      val assign = operators.Materialize(
        SimilarityQueries.assignToSeeds(e, sd).select("vec_id", "v", "nrm", "seed_id"))
      val pw = Window.partitionBy("vec_id").orderBy(col("pcos").desc, col("seed_id"))
      val probes = e.join(broadcast(sd))
        .select(col("vec_id"), col("v"), col("nrm"), col("seed_id"),
          VectorOps.cosCol("v", "sv", "nrm", "sn").as("pcos"))
        .withColumn("rn", row_number().over(pw)).filter(col("rn") <= 1)
        .select(col("vec_id"), col("v").as("qv"), col("nrm").as("qn"), col("seed_id"))
      val cw = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("nbr_id"))
      val got = probes
        .join(assign.select(col("seed_id"), col("vec_id").as("nbr_id"),
          col("v").as("cv"), col("nrm").as("cn")), Seq("seed_id"))
        .filter(col("vec_id") =!= col("nbr_id"))
        .select(col("vec_id"), col("nbr_id"),
          VectorOps.cosCol("qv", "cv", "qn", "cn").as("cos"))
        .distinct()
        .withColumn("rank", row_number().over(cw))
        .filter(col("rank") <= K).select("vec_id", "nbr_id")
      val r = truth
        .join(got.withColumn("hit", lit(1)), Seq("vec_id", "nbr_id"), "left")
        .agg(count(col("hit")).as("h"), count(lit(1)).as("t")).head
      r.getLong(0).toDouble / r.getLong(1)
    }
    val seeded = ivfRecall(SimilarityQueries.seedSet(e, N_CLUSTERS))
    val trained = ivfRecall(SimilarityQueries.trainedSeedSet(e, N_CLUSTERS))
    info(f"clustered corpus: seeded recall@$K = $seeded%.3f, trained = $trained%.3f")
    // measured on this fixed-seed corpus: seeded 0.915, trained 0.983 —
    // one Lloyd iteration buys ~7 recall points when the data has
    // clusters, the exact opposite sign of the uniform-corpus curve
    assert(seeded >= 0.85 && seeded <= 0.97,
      s"seeded grid left its measured band on clustered data: $seeded")
    assert(trained >= 0.95, s"trained grid below its measured floor: $trained")
    assert(trained > seeded,
      s"training must improve recall on clustered data: $trained !> $seeded")
  }

  test("PQ convergence trainer reaches a fixed point on clustered subspaces") {
    // trainedCentsConv returns the FINAL codebook, so convergence is pinned
    // by invariance: on a corpus where every 8-dim subspace has 8 tight
    // clusters covered by the seeds, round 1 moves each code to its cluster
    // mean and round 2 measures zero movement — so a 2-round budget and a
    // 6-round budget must end on the IDENTICAL codebook (the early stop
    // fired; extra budget is never spent). On the uniform driver corpus the
    // same loop exhausts its budget without converging (movement plateaus
    // ~46M nano — the measured note at ann_pq_trained_conv).
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(13)
    // [subspace][cluster][dim] centers; point i's subspace ss ~ cluster i%8
    val centers = Array.fill(8, 8, 8)(rnd.nextDouble() * 2 - 1)
    val rows = for {
      i <- 0 until 240
      ss <- 0 until 8
    } yield (i.toLong, ss,
      centers(ss)(i % 8).map(x => x + (rnd.nextDouble() * 2 - 1) * 0.05).toSeq)
    val subs = rows.toDF("vec_id", "ss", "sv")
    def cents(maxIters: Int): Set[(Int, Int, Seq[Double])] =
      SimilarityQueries.trainedCentsConv(subs, maxIters = maxIters)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
        .toSet
    val c2 = cents(2)
    assert(c2.size == 64, s"expected 8 subspaces x 8 codes, got ${c2.size}")
    assert(cents(6) == c2,
      "clustered subspaces must converge by round 2: a 6-round budget may " +
        "not change the codebook the 2-round budget ends on")
  }

  test("PQ convergence trainer fails loudly on an empty corpus") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val empty = Seq.empty[(Long, Int, Seq[Double])].toDF("vec_id", "ss", "sv")
    val e = intercept[IllegalArgumentException] {
      SimilarityQueries.trainedCentsConv(empty)
    }
    assert(e.getMessage.contains("no seed subvectors"))
  }

  test("driver corpus: curve is structurally sound whatever the data does") {
    // The uniform corpus may or may not cross tolerance inside the budget —
    // that is a property of the DATA, so pin only the loop's invariants:
    // iters are 1..n, converged ⇔ shift<tol, and the loop stops exactly at
    // the first converged iteration or the budget.
    val rows = SimilarityQueries
      .kmeansTrain(VectorOps.normalized(spark, sfDir))
      .collect()
    assert(rows.nonEmpty && rows.length <= 4)
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq)
    rows.foreach(r => assert(r.getBoolean(2) == (r.getLong(1) < 1000000L)))
    rows.init.foreach(r => assert(!r.getBoolean(2)))
    assert(rows.last.getBoolean(2) || rows.length == 4)
  }
}
