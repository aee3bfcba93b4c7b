package graft.operators

import graft.GQuery
import graft.functions.VectorOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over `embeddings` (builder mandate).
  *
  * Three tiers, all deterministic and oracle-verified:
  *  - brute-force top-k: the correctness baseline. Broadcast the (small)
  *    query set against the corpus — at 100 TB this is a broadcast-hash
  *    join + per-query TakeOrdered, linear in corpus size, no shuffle of
  *    the corpus itself.
  *  - IVF: coarse quantization to seed centroids, probe the nprobe nearest
  *    cells, exact re-rank inside. The cell assignment is a corpus-side
  *    precompute (one pass); queries touch only probed cells — the classic
  *    inverted-file trade of recall for a ~cells/nprobe scan reduction.
  *  - LSH buckets: random-hyperplane signs as a partition key (the same
  *    shape MinHash banding uses for text). Bucket histogram demonstrates
  *    the key derivation; pair generation within buckets is then an
  *    equi-join, never a cross product.
  *
  * The hyperplane weights are derived from md5 in Scala and inlined as
  * ±1 literals so both engines compute identical projections.
  */
object SimilarityQueries {

  private val N_QUERIES = 10
  private val N_SEEDS = 16
  private val N_PROBE = 4
  private val TOP_K = 10

  /** Deterministic ±1 hyperplane weights: sign of the first md5 nibble of
    * "plane:dim". Computed driver-side once, inlined as literals.
    */
  private def planeWeights(plane: Int, dims: Int): Seq[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until dims).map { d =>
      val hex = md.digest(s"$plane:$d".getBytes("UTF-8"))
      val nibble = (hex(0) >> 4) & 0xf
      if (nibble >= 8) 1.0 else -1.0
    }
  }

  private val N_PLANES = 8
  private val DIMS = 64

  private def weightsArraySpark(p: Int): String =
    planeWeights(p, DIMS).map(w => s"CAST($w AS DOUBLE)").mkString("array(", ", ", ")")
  private def weightsArrayDuck(p: Int): String =
    planeWeights(p, DIMS).map(w => s"CAST($w AS DOUBLE)").mkString("[", ", ", "]")

  private def projSpark(p: Int): String =
    s"graft_dot(v, ${weightsArraySpark(p)})"
  private def projDuck(p: Int): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65), i -> v[i] * (${weightsArrayDuck(p)})[i])), (acc, t) -> acc + t)"

  val defs: Seq[GQuery] = Seq(

    // ---- brute-force exact top-k (baseline) --------------------------------
    GQuery(
      "ann_bruteforce_topk",
      (s, dir) => {
        val e = VectorOps.normalized(s, dir)
        val q = broadcast(
          e.filter(col("vec_id") < N_QUERIES)
            .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn")))
        val scored = e.join(q, col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("cand_id"),
            VectorOps.cosCol("qv", "v", "qn", "nrm").as("cos"))
        val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("cand_id"))
        scored.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= TOP_K)
          .select("q_id", "rank", "cand_id", "cos")
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH ${VectorOps.normalizedSql},
              |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM e WHERE vec_id < $N_QUERIES),
              |scored AS (SELECT q.q_id, e.vec_id AS cand_id,
              |  ${VectorOps.cosSql("q.qv", "e.v", "q.qn", "e.nrm")} AS cos
              |  FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
              |ranked AS (SELECT q_id, cand_id, cos,
              |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS BIGINT) AS rank
              |  FROM scored)
              |SELECT q_id, rank, cand_id, cos FROM ranked WHERE rank <= $TOP_K
              |ORDER BY q_id, rank""".stripMargin)
    ),

    // ---- IVF: coarse-quantize to seeds, probe nearest cells, re-rank -------
    GQuery(
      "ann_ivf_topk",
      (s, dir) => {
        val e = VectorOps.normalized(s, dir)
        val seeds = broadcast(
          e.filter(col("vec_id") < N_SEEDS)
            .select(col("vec_id").as("seed_id"), col("v").as("sv"), col("nrm").as("sn")))
        // corpus→cell assignment: one pass, argmax cosine to seed
        val aw = Window.partitionBy("vec_id")
          .orderBy(col("scos").desc, col("seed_id"))
        val assign = e.join(seeds)
          .select(col("vec_id"), col("v"), col("nrm"), col("seed_id"),
            VectorOps.cosCol("v", "sv", "nrm", "sn").as("scos"))
          .withColumn("rn", row_number().over(aw))
          .filter(col("rn") === 1)
          .select("vec_id", "v", "nrm", "seed_id")
        // query→probe list: nprobe nearest cells
        val q = e.filter(col("vec_id") < N_QUERIES)
          .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
        val pw = Window.partitionBy("q_id").orderBy(col("pcos").desc, col("seed_id"))
        val probes = q.join(seeds)
          .select(col("q_id"), col("qv"), col("qn"), col("seed_id"),
            VectorOps.cosCol("qv", "sv", "qn", "sn").as("pcos"))
          .withColumn("rn", row_number().over(pw))
          .filter(col("rn") <= N_PROBE)
          .select("q_id", "qv", "qn", "seed_id")
        // exact re-rank inside probed cells only
        val cand = probes.join(assign, "seed_id")
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("cand_id"),
            VectorOps.cosCol("qv", "v", "qn", "nrm").as("cos"))
          .distinct()
        val rw = Window.partitionBy("q_id").orderBy(col("cos").desc, col("cand_id"))
        cand.withColumn("rank", row_number().over(rw).cast("long"))
          .filter(col("rank") <= TOP_K)
          .select("q_id", "rank", "cand_id", "cos")
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH ${VectorOps.normalizedSql},
              |seeds AS (SELECT vec_id AS seed_id, v AS sv, nrm AS sn FROM e WHERE vec_id < $N_SEEDS),
              |assign0 AS (SELECT e.vec_id, e.v, e.nrm, seeds.seed_id,
              |  row_number() OVER (PARTITION BY e.vec_id ORDER BY
              |    ${VectorOps.cosSql("e.v", "seeds.sv", "e.nrm", "seeds.sn")} DESC, seeds.seed_id) AS rn
              |  FROM e CROSS JOIN seeds),
              |assign AS (SELECT vec_id, v, nrm, seed_id FROM assign0 WHERE rn = 1),
              |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM e WHERE vec_id < $N_QUERIES),
              |probes0 AS (SELECT q.q_id, q.qv, q.qn, seeds.seed_id,
              |  row_number() OVER (PARTITION BY q.q_id ORDER BY
              |    ${VectorOps.cosSql("q.qv", "seeds.sv", "q.qn", "seeds.sn")} DESC, seeds.seed_id) AS rn
              |  FROM q CROSS JOIN seeds),
              |probes AS (SELECT q_id, qv, qn, seed_id FROM probes0 WHERE rn <= $N_PROBE),
              |cand AS (SELECT DISTINCT probes.q_id, assign.vec_id AS cand_id,
              |  ${VectorOps.cosSql("probes.qv", "assign.v", "probes.qn", "assign.nrm")} AS cos
              |  FROM probes JOIN assign ON probes.seed_id = assign.seed_id
              |  WHERE assign.vec_id <> probes.q_id),
              |ranked AS (SELECT q_id, cand_id, cos,
              |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS BIGINT) AS rank
              |  FROM cand)
              |SELECT q_id, rank, cand_id, cos FROM ranked WHERE rank <= $TOP_K
              |ORDER BY q_id, rank""".stripMargin)
    ),

    // ---- embedding near-dup at scale: LSH bucket equi-join → exact cosine ---
    // The scale path for dedup_embedding_pairs: candidates come from an
    // equi-join on a 4-bit hyperplane signature (similar vectors collide),
    // so the pair space is the sum of per-bucket squares, not n²; only
    // candidates pay the exact graft_dot re-rank, and the top pairs by
    // cosine surface as near-dup suspects. (The synthetic embeddings are
    // near-random — max pairwise cos ≈ 0.5 — so a top-k report is the
    // honest output; a fixed threshold would select nothing or noise.)
    GQuery(
      "dedup_embedding_lsh",
      (s, dir) => {
        val e = VectorOps.normalized(s, dir)
        val sigExpr = (0 until 4)
          .map(p => s"CASE WHEN ${projSpark(p)} > 0 THEN '1' ELSE '0' END")
          .mkString("concat(", ", ", ")")
        val sig = e.select(col("vec_id"), col("v"), col("nrm"), expr(sigExpr).as("bucket"))
        sig.as("a")
          .join(sig.as("b"),
            col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
          .select(
            col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
            VectorOps.cosCol("a.v", "b.v", "a.nrm", "b.nrm").as("cos"))
          .orderBy(col("cos").desc, col("vec_a"), col("vec_b"))
          .limit(20)
      },
      Some {
        val sigExpr = (0 until 4)
          .map(p => s"CASE WHEN ${projDuck(p)} > 0 THEN '1' ELSE '0' END")
          .mkString("concat(", ", ", ")")
        s"""WITH ${VectorOps.normalizedSql},
           |sig AS (SELECT vec_id, v, nrm, $sigExpr AS bucket FROM e),
           |pairs AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           |  ${VectorOps.cosSql("a.v", "b.v", "a.nrm", "b.nrm")} AS cos
           |  FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
           |SELECT vec_a, vec_b, cos FROM pairs
           |ORDER BY cos DESC, vec_a, vec_b LIMIT 20""".stripMargin
      }
    ),

    // ---- clustering step: per-cell stats of the IVF assignment --------------
    // One k-means-style assignment iteration reported as cell populations +
    // mean cosine-to-centroid. Cosines are bit-identical on both engines, so
    // snapping to a 1e-9 grid before summing makes the mean exact (double
    // sums would be partition-order-dependent).
    GQuery(
      "ann_cell_stats",
      (s, dir) => {
        val e = VectorOps.normalized(s, dir)
        val seeds = broadcast(
          e.filter(col("vec_id") < N_SEEDS)
            .select(col("vec_id").as("seed_id"), col("v").as("sv"), col("nrm").as("sn")))
        val aw = Window.partitionBy("vec_id").orderBy(col("scos").desc, col("seed_id"))
        val assign = e.join(seeds)
          .select(col("vec_id"), col("seed_id"),
            VectorOps.cosCol("v", "sv", "nrm", "sn").as("scos"))
          .withColumn("rn", row_number().over(aw))
          .filter(col("rn") === 1)
        assign.groupBy("seed_id")
          .agg(
            count(lit(1)).as("n_members"),
            (sum(round(col("scos") * 1e9).cast("long")).cast("double") / 1e9 /
              count(lit(1)).cast("double")).as("avg_cos"))
          .orderBy("seed_id")
      },
      Some(s"""WITH ${VectorOps.normalizedSql},
              |seeds AS (SELECT vec_id AS seed_id, v AS sv, nrm AS sn FROM e WHERE vec_id < $N_SEEDS),
              |assign0 AS (SELECT e.vec_id, seeds.seed_id,
              |  ${VectorOps.cosSql("e.v", "seeds.sv", "e.nrm", "seeds.sn")} AS scos,
              |  row_number() OVER (PARTITION BY e.vec_id ORDER BY
              |    ${VectorOps.cosSql("e.v", "seeds.sv", "e.nrm", "seeds.sn")} DESC, seeds.seed_id) AS rn
              |  FROM e CROSS JOIN seeds),
              |assign AS (SELECT vec_id, seed_id, scos FROM assign0 WHERE rn = 1)
              |SELECT seed_id, CAST(COUNT(*) AS BIGINT) AS n_members,
              |  CAST(SUM(CAST(round(scos * 1000000000) AS BIGINT)) AS DOUBLE)/1000000000
              |    /CAST(COUNT(*) AS DOUBLE) AS avg_cos
              |FROM assign GROUP BY seed_id ORDER BY seed_id""".stripMargin)
    ),

    // ---- random-hyperplane LSH bucketing ------------------------------------
    GQuery(
      "ann_lsh_buckets",
      (s, dir) => {
        val e = VectorOps.normalized(s, dir)
        val sigExpr = (0 until N_PLANES)
          .map(p => s"CASE WHEN ${projSpark(p)} > 0 THEN '1' ELSE '0' END")
          .mkString("concat(", ", ", ")")
        e.select(col("vec_id"), expr(sigExpr).as("bucket"))
          .withColumn("bucket_size",
            count(lit(1)).over(Window.partitionBy("bucket")).cast("long"))
          .orderBy("vec_id")
      },
      Some {
        val sigExpr = (0 until N_PLANES)
          .map(p => s"CASE WHEN ${projDuck(p)} > 0 THEN '1' ELSE '0' END")
          .mkString("concat(", ", ", ")")
        s"""WITH ${VectorOps.normalizedSql},
           |sigs AS (SELECT vec_id, $sigExpr AS bucket FROM e)
           |SELECT vec_id, bucket,
           |  CAST(COUNT(*) OVER (PARTITION BY bucket) AS BIGINT) AS bucket_size
           |FROM sigs ORDER BY vec_id""".stripMargin
      }
    )
  )
}
