package graft.operators

import graft.{GQuery, Tables}
import graft.functions.VectorOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators over `documents` / `embeddings` (builder mandate:
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup).
  *
  * Scale design: none of these enumerate the full O(n²) pair space at fleet
  * scale — candidates come from LSH band buckets (MinHash), identical
  * signatures (SimHash), or prefix blocks (n-gram), i.e. an equi-join on a
  * derived key that Spark shuffles by hash; only candidate pairs pay the
  * exact-similarity verification. The brute-force cosine pair scan is kept
  * for small-side verification and as the oracle baseline for the ANN paths
  * (SimilarityQueries).
  *
  * Hashing parity: md5 is the one hash both engines share, so MinHash uses
  * lexicographic min over salted md5 hex strings and SimHash derives its 32
  * bits from md5 nibbles (see Exact.md5Int for the integer variant).
  */
object DedupQueries {

  // ---- shared shingle fragments (word 3-shingles over space tokens) -------
  // Docs have >= 10 tokens at every SF, so the shingle sequence is never
  // empty (Spark `sequence(0, n-3)` would go descending on n < 3).
  private val shinglesSpark =
    "array_distinct(transform(sequence(0, size(split(text, ' ')) - 3), " +
      "i -> concat(split(text, ' ')[i], ' ', split(text, ' ')[i+1], ' ', split(text, ' ')[i+2])))"

  private val shinglesDuck =
    """t0 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
      |  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh FROM t0)""".stripMargin

  // MinHash: k=9 salted-md5 min-hashes, banded 3x3 for LSH.
  private val K = 9
  private val BANDS = 3
  private val R = K / BANDS

  private def minhashSpark(i: Int) = s"array_min(transform(sh, x -> md5(concat(x, '#$i'))))"
  private def minhashDuck(i: Int) =
    s"list_aggregate(list_transform(sh, x -> md5(x || '#$i')), 'min')"

  private def bandSpark(j: Int) =
    s"md5(concat(${(0 until R).map(r => minhashSpark(j * R + r)).mkString(", ")}))"
  private def bandDuck(j: Int) =
    s"md5(${(0 until R).map(r => minhashDuck(j * R + r)).mkString(" || ")})"

  // SimHash: bit b of the 32-bit signature comes from md5 hex nibble b/4,
  // bit position 3-(b%4); each shingle votes ±1 per bit.
  private def voteSpark(b: Int): String = {
    val p = b / 4; val s = 1 << (3 - b % 4)
    s"(((locate(substring(md5(x), ${p + 1}, 1), '0123456789abcdef') - 1) div $s) % 2) * 2 - 1"
  }
  private def voteDuck(b: Int): String = {
    val p = b / 4; val s = 1 << (3 - b % 4)
    s"(((strpos('0123456789abcdef', substring(md5(x), ${p + 1}, 1)) - 1) // $s) % 2) * 2 - 1"
  }

  val defs: Seq[GQuery] = Seq(

    // ---- exact dedup: group-identical text, keep lowest doc_id ------------
    GQuery(
      "dedup_exact",
      (s, dir) =>
        Tables.documents(s, dir)
          .groupBy(md5(col("text")).as("text_md5"))
          .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("dup_count"))
          .orderBy("text_md5"),
      Some("""SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_doc_id,
             |CAST(COUNT(*) AS BIGINT) AS dup_count
             |FROM documents GROUP BY md5(text) ORDER BY text_md5""".stripMargin)
    ),

    // ---- MinHash + LSH near-dup: band join → candidates → exact Jaccard ---
    GQuery(
      "dedup_minhash_lsh",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), expr(shinglesSpark).as("sh"))
        val bands = docs.select(
          col("doc_id"),
          explode(array((0 until BANDS).map(j =>
            struct(lit(j).as("bi"), expr(bandSpark(j)).as("bh"))): _*)).as("b"))
          .select(col("doc_id"), col("b.bi").as("bi"), col("b.bh").as("bh"))
        val cand = bands.as("x")
          .join(bands.as("y"),
            col("x.bi") === col("y.bi") && col("x.bh") === col("y.bh") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
        val shA = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
        val shB = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
        cand.join(shA, "doc_a").join(shB, "doc_b")
          .withColumn("jac",
            expr("CAST(size(array_intersect(sh_a, sh_b)) AS DOUBLE) / " +
              "CAST(size(sh_a) + size(sh_b) - size(array_intersect(sh_a, sh_b)) AS DOUBLE)"))
          .filter(col("jac") >= 0.6)
          .select("doc_a", "doc_b", "jac")
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH $shinglesDuck,
              |sig AS (SELECT doc_id, sh,
              |  ${(0 until BANDS).map(j => s"${bandDuck(j)} AS band_$j").mkString(", ")}
              |  FROM s),
              |bands AS (${(0 until BANDS)
                .map(j => s"SELECT doc_id, $j AS bi, band_$j AS bh FROM sig")
                .mkString(" UNION ALL ")}),
              |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
              |  FROM bands x JOIN bands y ON x.bi = y.bi AND x.bh = y.bh AND x.doc_id < y.doc_id)
              |SELECT doc_a, doc_b,
              |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
              |  CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS jac
              |FROM cand JOIN s a ON a.doc_id = doc_a JOIN s b ON b.doc_id = doc_b
              |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
              |  CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) >= 0.6
              |ORDER BY doc_a, doc_b""".stripMargin)
    ),

    // ---- SimHash signatures (explode → one-pass partial-aggregated votes) --
    GQuery(
      "dedup_simhash",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), expr(shinglesSpark).as("sh"))
        val ex = docs.select(col("doc_id"), explode(col("sh")).as("x"))
        val votes = ex.groupBy("doc_id").agg(
          sum(expr(voteSpark(0))).as("v0"),
          (1 until 32).map(b => sum(expr(voteSpark(b))).as(s"v$b")): _*)
        val sigExpr = (0 until 32)
          .map(b => s"CASE WHEN v$b > 0 THEN '1' ELSE '0' END")
          .mkString("concat(", ", ", ")")
        votes.select(col("doc_id"), expr(sigExpr).as("simhash"))
          .withColumn("cluster_size",
            count(lit(1)).over(Window.partitionBy("simhash")).cast("long"))
          .orderBy("doc_id")
      },
      Some {
        val voteCols = (0 until 32)
          .map(b => s"SUM(${voteDuck(b)}) AS v$b").mkString(", ")
        val sigExpr = (0 until 32)
          .map(b => s"CASE WHEN v$b > 0 THEN '1' ELSE '0' END")
          .mkString("concat(", ", ", ")")
        s"""WITH $shinglesDuck,
           |ex AS (SELECT doc_id, unnest(sh) AS x FROM s),
           |votes AS (SELECT doc_id, $voteCols FROM ex GROUP BY doc_id),
           |sigs AS (SELECT doc_id, $sigExpr AS simhash FROM votes)
           |SELECT doc_id, simhash,
           |  CAST(COUNT(*) OVER (PARTITION BY simhash) AS BIGINT) AS cluster_size
           |FROM sigs ORDER BY doc_id""".stripMargin
      }
    ),

    // ---- character 5-gram Jaccard with prefix blocking ----------------------
    GQuery(
      "dedup_ngram_jaccard",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(
          col("doc_id"),
          substring(col("text"), 1, 32).as("blk"),
          expr("array_distinct(transform(sequence(1, length(text) - 4), " +
            "i -> substring(text, i, 5)))").as("ng"))
        docs.as("a")
          .join(docs.as("b"), col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
          .select(
            col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            expr("CAST(size(array_intersect(a.ng, b.ng)) AS DOUBLE) / " +
              "CAST(size(a.ng) + size(b.ng) - size(array_intersect(a.ng, b.ng)) AS DOUBLE)").as("jac"))
          .filter(col("jac") >= 0.7)
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH d AS (SELECT doc_id, substring(text, 1, 32) AS blk,
             |  list_distinct(list_transform(range(1, length(text) - 3),
             |    i -> substring(text, i, 5))) AS ng FROM documents)
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |  CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE) /
             |  CAST(len(a.ng) + len(b.ng) - len(list_intersect(a.ng, b.ng)) AS DOUBLE) AS jac
             |FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
             |WHERE CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE) /
             |  CAST(len(a.ng) + len(b.ng) - len(list_intersect(a.ng, b.ng)) AS DOUBLE) >= 0.7
             |ORDER BY doc_a, doc_b""".stripMargin)
    ),

    // ---- embedding near-dup: top-50 most-similar pairs (exact cosine) -------
    // Brute-force O(n²) is the verification baseline; the scale path is the
    // LSH bucketing in SimilarityQueries.ann_lsh_buckets.
    GQuery(
      "dedup_embedding_pairs",
      (s, dir) => {
        val e = VectorOps.normalized(s, dir)
        val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
        val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
        a.join(b, col("vec_a") < col("vec_b"))
          .select(col("vec_a"), col("vec_b"),
            VectorOps.cosCol("va", "vb", "na", "nb").as("cos"))
          .orderBy(col("cos").desc, col("vec_a"), col("vec_b"))
          .limit(50)
      },
      Some(s"""WITH ${VectorOps.normalizedSql}
              |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              |  ${VectorOps.cosSql("a.v", "b.v", "a.nrm", "b.nrm")} AS cos
              |FROM e a JOIN e b ON a.vec_id < b.vec_id
              |ORDER BY cos DESC, vec_a, vec_b LIMIT 50""".stripMargin),
      bench = false // O(n²) verification baseline — the benched scale path is ann_lsh_buckets/ann_ivf_topk
    )
  )
}
