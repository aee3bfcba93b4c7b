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
