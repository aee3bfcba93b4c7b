package graft

import java.nio.file.Files

/** The k-center contract the structureless driver corpus can't show (its
  * curve just shaves a uniform sphere — see ann_kcenter_coreset's driver
  * numbers): on a CLUSTERED corpus the greedy farthest-point rule must
  * visit every cluster before revisiting any, and the cover radius must
  * collapse from inter-cluster scale to within-cluster noise the moment
  * all clusters hold a center.
  */
class KcenterSpec extends SparkSpec {

  private val DIM = 64
  private val N_CLUSTERS = 4
  private val N_VECS = 100

  /** 4 well-separated centers, points = center + 0.1·noise, cluster id =
    * vec_id % 4 (so the seed id 0 sits in cluster 0 and clusters
    * interleave across ids).
    */
  private lazy val clusterDir: String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-kcenter").toString
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(N_CLUSTERS, DIM)(rnd.nextDouble() * 2 - 1)
    val rows = (0 until N_VECS).map { i =>
      val c = centers(i % N_CLUSTERS)
      (i.toLong, c.map(x => (x + (rnd.nextDouble() * 2 - 1) * 0.1).toFloat).toSeq)
    }
    rows.toDF("vec_id", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("greedy selection visits every cluster before revisiting any") {
    val curve = SparkEntry.queries("ann_kcenter_coreset")(spark, clusterDir).collect()
    assert(curve.length == 6)
    val clustersOfFirst4 = curve.take(N_CLUSTERS).map(_.getLong(1) % N_CLUSTERS).toSet
    assert(clustersOfFirst4.size == N_CLUSTERS,
      s"first $N_CLUSTERS centers should span all clusters: ${curve.toSeq}")
    // the curve is monotone nonincreasing by construction
    val radii = curve.map(_.getLong(2)).toSeq
    assert(radii == radii.sorted(Ordering[Long].reverse), radii)
    // once every cluster holds a center the cover radius collapses from
    // inter-cluster scale to within-cluster noise
    assert(radii(N_CLUSTERS - 1) > 2 * radii(N_CLUSTERS),
      s"expected a cover-radius cliff after $N_CLUSTERS centers: $radii")
  }

  test("cover report accounts for every vector with within-cluster radii") {
    val rep = SparkEntry.queries("ann_kcenter_assign")(spark, clusterDir).collect()
    assert(rep.map(_.getLong(1)).sum == N_VECS.toLong, rep.toSeq)
    // 6 centers over 4 clusters: every cell's realized radius is
    // within-cluster scale, far below the no-center sentinel
    assert(rep.forall(_.getLong(2) < 500000000L), rep.toSeq)
  }
}
