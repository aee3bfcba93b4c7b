package graft

import graft.operators.Multimodal

/** Multimodal decode plumbing: binary payloads through mapPartitions with
  * the deterministic stub codec (FIXTURES-independent — exact values).
  */
class MultimodalSpec extends SparkSpec {

  test("decodeFeatures produces deterministic features from payload bytes") {
    import spark.implicits._
    val assets = Seq(
      (1L, "abc".getBytes("UTF-8"), "text/plain"),
      (2L, Array.empty[Byte], "application/octet-stream"))
      .toDF("asset_id", "payload", "format")
    val out = Multimodal.decodeFeatures(assets).collect().sortBy(_.asset_id)

    val a = out(0)
    assert(a.n_bytes == 3)
    assert(a.width == 16 * (97 + 1)) // 'a' = 0x61 = 97
    assert(a.height == 9 * (98 + 1)) // 'b' = 0x62 = 98
    assert(a.mean_byte == (97 + 98 + 99) / 3.0)
    assert(a.head_hex == "616263")

    val b = out(1)
    assert(b.n_bytes == 0 && b.width == 16 && b.height == 9 && b.mean_byte == 0.0)
    assert(b.head_hex == "")
  }

  test("decode runs distributed over partitions and covers the asset table") {
    val assets = Multimodal.documentsAsAssets(spark, sfDir).repartition(4)
    val out = Multimodal.decodeFeatures(assets)
    assert(out.rdd.getNumPartitions == 4)
    assert(out.count() == 500)
  }

  test("sampleFrames slices payloads deterministically with stride") {
    import spark.implicits._
    val payload = Array.tabulate[Byte](600)(i => (i % 251).toByte) // 3 chunks of 256/256/88
    val assets = Seq((7L, payload, "video/fake")).toDF("asset_id", "payload", "format")
    val frames = Multimodal.sampleFrames(assets, frameSize = 256, stride = 2)
      .collect().sortBy(_.frame_idx)
    // chunks 0,1,2 exist; stride 2 keeps 0 and 2
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(frames.map(_.n_bytes).toSeq == Seq(256L, 88L))
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected0 = md.digest(payload.take(256)).map(b => f"$b%02x").mkString
    assert(frames(0).frame_hash == expected0)
  }

  test("resize downsamples payloads deterministically and keeps them binary") {
    import spark.implicits._
    val assets = Seq((3L, Array.tabulate[Byte](10)(_.toByte), "image/fake"))
      .toDF("asset_id", "payload", "format")
    val out = Multimodal.resize(assets, factor = 4).collect().head
    assert(out.payload.toSeq == Seq[Byte](0, 4, 8))
    assert(out.orig_bytes == 10 && out.new_bytes == 3)
  }

  test("sampleFrames over the asset table keeps every frame joinable by id") {
    val frames = Multimodal.sampleFrames(
      Multimodal.documentsAsAssets(spark, sfDir), frameSize = 64, stride = 2)
    val perAsset = frames.groupBy("asset_id").count()
    assert(perAsset.count() == 500) // every asset produced >= 1 sampled frame
  }

  test("perceptualHash: near-identical payloads land at small Hamming distance") {
    import spark.implicits._
    val base = ("the quick brown fox jumps over the lazy dog " * 8).trim
    val edited = base.updated(10, 'X').updated(200, 'Y') // two byte edits
    val unrelated = ("zz9 aa0 qq7 kk3 mm1 pp5 xx8 ww2 vv6 uu4 " * 8).trim
    val assets = Seq(
      (1L, base.getBytes("UTF-8"), "text/plain"),
      (2L, edited.getBytes("UTF-8"), "text/plain"),
      (3L, base.getBytes("UTF-8"), "text/plain"), // exact dup of 1
      (4L, unrelated.getBytes("UTF-8"), "text/plain"))
      .toDF("asset_id", "payload", "format")
    val ph = Multimodal.perceptualHash(assets).collect()
      .map(p => p.asset_id -> ((p.ph_hi, p.ph_lo))).toMap
    def ham(a: Long, b: Long): Int =
      java.lang.Long.bitCount(ph(a)._1 ^ ph(b)._1) +
        java.lang.Long.bitCount(ph(a)._2 ^ ph(b)._2)
    assert(ham(1, 3) == 0, s"exact dup must hash identically: ${ham(1, 3)}")
    assert(ham(1, 2) <= 6, s"two byte edits must stay near: ${ham(1, 2)}")
    // md5 has no such property — and the phash should separate unrelated
    // content from the edit distance band (strictly farther than the edit)
    assert(ham(1, 4) > ham(1, 2), s"unrelated ${ham(1, 4)} vs edited ${ham(1, 2)}")
  }

  test("assetsWithVariants fails loudly on a corpus whose doc_ids reach 1e6") {
    // the r13 collision guard, exercised (and r14-made lazy: no extra scan
    // job on a valid corpus — the assert rides the scan every query runs):
    // a doc_id at/above 1e6 would collide with the planted-variant id
    // offsets and silently misfile originals as batch
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bigids").toString
    Seq((5L, "alpha beta gamma delta"), (1000000L, "epsilon zeta eta theta"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[Exception] {
      Multimodal.assetsWithVariants(spark, dir).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("collides")),
      s"wrong failure: ${messages(e).mkString(" | ")}")
    // a sub-1e6 corpus passes through the same lazy guard untouched
    val okDir = java.nio.file.Files.createTempDirectory("graft-okids").toString
    Seq((5L, "alpha beta gamma delta"), (999999L, "epsilon zeta eta theta"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$okDir/documents.parquet")
    assert(Multimodal.assetsWithVariants(spark, okDir).count() > 0)
  }
}
