package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video travel as opaque `binary` payloads
  * with typed metadata; decode / feature-extraction runs per partition.
  *
  * The actual codec work is STUBBED (this container has no image/audio
  * libraries): `FakeCodec` derives deterministic pseudo-features from the
  * payload bytes. Everything around the stub is the real Spark shape a
  * 100 TB media pipeline needs:
  *   - payloads as `BinaryType` columns (never strings — no re-encoding)
  *   - `Dataset[T]` with case-class encoders across the decode boundary
  *   - `mapPartitions` so per-partition codec initialization amortizes
  *     (the expensive part of real decoders), with partition sizing left
  *     to `spark.sql.files.maxPartitionBytes` at the scan
  *   - feature output as flat columns, re-joinable by asset id
  */
object Multimodal {

  /** An opaque media asset: id + raw bytes + declared container format. */
  case class Asset(asset_id: Long, payload: Array[Byte], format: String)

  /** Extracted features. With a real codec, width/height/duration come from
    * the container headers; here they are a deterministic function of bytes.
    */
  case class AssetFeatures(
      asset_id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      mean_byte: Double,
      head_hex: String)

  /** STUB decoder — stands in for e.g. libjpeg/ffmpeg binding. Deterministic:
    * features depend only on payload bytes, so tests can assert exact values.
    */
  private[operators] object FakeCodec {
    def init(): FakeCodec.type = this // models expensive per-partition setup
    def decode(a: Asset): AssetFeatures = {
      val n = a.payload.length
      val h0 = if (n > 0) a.payload(0) & 0xff else 0
      val h1 = if (n > 1) a.payload(1) & 0xff else 0
      val mean =
        if (n == 0) 0.0
        else a.payload.foldLeft(0L)((acc, b) => acc + (b & 0xff)).toDouble / n
      AssetFeatures(
        asset_id = a.asset_id,
        n_bytes = n.toLong,
        width = 16 * (h0 + 1), // ??? real impl: parse container header
        height = 9 * (h1 + 1), // ??? real impl: parse container header
        mean_byte = mean,
        head_hex = a.payload.take(8).map(b => f"${b & 0xff}%02x").mkString)
    }
  }

  /** Decode a DataFrame of (asset_id: long, payload: binary, format: string)
    * into per-asset features. Runs as one `mapPartitions` pass: codec init
    * once per partition, then a streaming map — no per-row setup, no
    * driver-side collection, embarrassingly parallel over input splits.
    */
  def decodeFeatures(assets: DataFrame): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select(
        col("asset_id").cast("long"),
        col("payload").cast("binary"),
        col("format").cast("string"))
      .as[Asset]
      .mapPartitions { it =>
        val codec = FakeCodec.init()
        it.map(codec.decode)
      }
  }

  /** One sampled "frame" of a media payload. With a real codec, frames come
    * from the container's frame index; the stub slices the byte stream.
    */
  case class Frame(asset_id: Long, frame_idx: Int, n_bytes: Long, frame_hash: String)

  /** Frame sampling: split each payload into fixed-size chunks and keep every
    * `stride`-th one — the video-pipeline shape (decode container → sample
    * frames → per-frame features). A flatMap generator, so output cardinality
    * is data-dependent and the work stays fully partition-parallel; frames
    * re-join to their asset by id. Hashing is per-frame md5 (hex), matching
    * the engine's cross-engine hash primitive.
    */
  def sampleFrames(assets: DataFrame, frameSize: Int = 256, stride: Int = 2): Dataset[Frame] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select(
        col("asset_id").cast("long"),
        col("payload").cast("binary"),
        col("format").cast("string"))
      .as[Asset]
      .flatMap { a =>
        val md = java.security.MessageDigest.getInstance("MD5") // per-asset init, reused across its frames
        a.payload.grouped(frameSize).zipWithIndex.collect {
          case (chunk, i) if i % stride == 0 =>
            Frame(a.asset_id, i, chunk.length.toLong,
              md.digest(chunk).map(b => f"$b%02x").mkString)
        }
      }
  }

  /** Resize: produce a downsampled payload (every `factor`-th byte — with a
    * real codec this is the decode→scale→re-encode hop) plus before/after
    * sizes. Runs as the same mapPartitions shape as decode so codec init
    * amortizes; output payloads stay binary end to end.
    */
  case class Resized(asset_id: Long, payload: Array[Byte], orig_bytes: Long, new_bytes: Long)

  def resize(assets: DataFrame, factor: Int = 4): Dataset[Resized] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select(
        col("asset_id").cast("long"),
        col("payload").cast("binary"),
        col("format").cast("string"))
      .as[Asset]
      .mapPartitions { it =>
        val codec = FakeCodec.init()
        it.map { a =>
          val down = a.payload.indices.collect {
            case i if i % factor == 0 => a.payload(i) // ??? real impl: codec.scale(...)
          }.toArray
          identity(codec) // codec would drive the real scaling kernel
          Resized(a.asset_id, down, a.payload.length.toLong, down.length.toLong)
        }
      }
  }

  /** A perceptual-hash signature row: 64-bit block-mean hash carried as two
    * NONNEGATIVE 32-bit halves (blocks 0-31 → ph_hi, 32-63 → ph_lo) plus
    * size. The split is the cross-engine-safe representation: a single
    * 64-bit BIGINT would put block 0 on the sign bit, where shift/sum
    * arithmetic diverges between engines; two halves keep every
    * intermediate in the positive range on both sides, and Hamming is
    * simply the sum of the halves' xor popcounts.
    */
  case class PHash(asset_id: Long, n_bytes: Long, ph_hi: Long, ph_lo: Long)

  /** Perceptual-hash signature (aHash structure): split the payload into 64
    * equal byte blocks and set bit i (MSB-first across ph_hi∥ph_lo) iff
    * block i's mean byte exceeds the whole-payload mean. With a real codec
    * the input would be the decoded, down-scaled luma plane (and the mean
    * comparison a DCT coefficient — pHash proper); the stub hashes the raw
    * bytes, which preserves the property that matters to the pipeline:
    * NEAR-duplicate payloads (small byte edits) land at small Hamming
    * distance, unlike md5 where one flipped byte decorrelates everything.
    * 64 bits (vs the r11 32) is the scale width: chance proximity at
    * Hamming ≤ 6 drops from ~2.6e-4 per pair (a real noise floor at any
    * corpus size) to ~5e-12 — pairs emitted at 100 TB are overwhelmingly
    * true near-dups, and the 16-bit band space keeps candidate buckets
    * bounded (see multimodal_phash_pairs). All comparisons are integer
    * cross-multiplications (blockSum·n > totalSum·blockLen) — no float
    * means, so the signature is bit-reproducible everywhere. Same
    * mapPartitions shape as decode; blocks of a short payload (n < 64)
    * that receive no bytes contribute a 0 bit.
    */
  def perceptualHash(assets: DataFrame): Dataset[PHash] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select(
        col("asset_id").cast("long"),
        col("payload").cast("binary"),
        col("format").cast("string"))
      .as[Asset]
      .mapPartitions { it =>
        val codec = FakeCodec.init() // real impl: decode + grayscale + resize
        it.map { a =>
          identity(codec)
          val n = a.payload.length.toLong
          val tot = a.payload.foldLeft(0L)((acc, b) => acc + (b & 0xff))
          var hHi = 0L
          var hLo = 0L
          var i = 0
          while (i < 64) {
            val lo = (i * n / 64).toInt
            val hi = ((i + 1) * n / 64).toInt
            var bs = 0L
            var j = lo
            while (j < hi) { bs += (a.payload(j) & 0xff); j += 1 }
            if (bs * n > tot * (hi - lo)) {
              if (i < 32) hHi |= 1L << (31 - i) else hLo |= 1L << (63 - i)
            }
            i += 1
          }
          PHash(a.asset_id, n, hHi, hLo)
        }
      }
  }

  /** Wrap `documents` as a fake asset table (text bytes as payload) — the
    * test-data stand-in for a real media table.
    */
  def documentsAsAssets(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.documents(spark, dir).select(
      col("doc_id").as("asset_id"),
      col("text").cast("binary").as("payload"),
      lit("text/plain").as("format"))

  /** The asset table PLUS deterministic "re-encode" variants — the
    * pipeline_redact_pii discipline applied to near-dup detection: every
    * 10th source asset gains two one-byte-edited copies (ids offset by
    * 1e6/2e6, edits at fixed positions both engines splice identically),
    * so the phash pair/cluster queries verify against PLANTED ground
    * truth instead of the chance-collision noise floor a narrow hash
    * produces on unrelated content. Each planted trio (source, v1, v2) is
    * a genuine Hamming-near component; the 64-bit signature makes
    * anything else vanishingly unlikely to pair.
    */
  def assetsWithVariants(spark: SparkSession, dir: String): DataFrame = {
    // the +1e6/+2e6 variant offsets (mirrored literally in the oracle SQL,
    // which cannot read a runtime max) are injective only while source ids
    // stay below 1e6 — past that, variant ids collide with real asset ids
    // and the incremental/probe paths' `asset_id < 1000000` corpus-vs-batch
    // classification silently misfiles originals. Enforce the bound LAZILY
    // per row (the winnowSelected assert_true discipline): no extra job at
    // plan-build time — the guard rides the scan every query already does,
    // and an out-of-bound id fails that query loudly with its doc_id.
    val d = graft.Tables.documents(spark, dir)
      .filter(assert_true(col("doc_id") < lit(1000000L),
        concat(lit("assetsWithVariants: doc_id "), col("doc_id"),
          lit(" >= 1e6 collides with the planted-variant id offsets — " +
            "widen the offsets (and the oracle) first"))).isNull)
    val orig = d.select(col("doc_id").as("asset_id"), col("text"))
    val v1 = d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("asset_id"),
        expr("concat(substr(text, 1, 5), 'x', substr(text, 7))").as("text"))
    val v2 = d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 2000000L).as("asset_id"),
        expr("concat(substr(text, 1, 15), 'q', substr(text, 17))").as("text"))
    orig.unionByName(v1).unionByName(v2)
      .select(col("asset_id"),
        col("text").cast("binary").as("payload"),
        lit("text/plain").as("format"))
  }

  /** Oracle CTE mirroring [[assetsWithVariants]]: ends in `am(asset_id,
    * text)`.
    */
  val assetsWithVariantsSql: String =
    """am AS (SELECT doc_id AS asset_id, text FROM documents
      |  UNION ALL SELECT doc_id + 1000000,
      |    concat(substr(text, 1, 5), 'x', substr(text, 7)) FROM documents
      |    WHERE doc_id % 10 = 0
      |  UNION ALL SELECT doc_id + 2000000,
      |    concat(substr(text, 1, 15), 'q', substr(text, 17)) FROM documents
      |    WHERE doc_id % 10 = 0)""".stripMargin
}
