package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column operators for a training-data pipeline: image/audio/
 * video payloads ride as opaque BINARY columns with typed metadata, and
 * decode / feature-extract / resize / frame-sample run as partition-local
 * batch functions (`mapPartitions` over a typed Dataset — the JVM analogue
 * of the Arrow-batch UDF pattern; per-partition setup cost is paid once,
 * the schema in/out is fixed and columnar-friendly).
 *
 * The actual codec step is STUBBED (this container has no image/audio
 * libraries): `decodeStub` derives a deterministic fake "decoded" header
 * from the bytes. Everything around it — the asset schema, partitioning,
 * batch shapes, feature vectors as ARRAY<FLOAT>, frame sampling — is real
 * and tested, so swapping in a real codec is a one-function change.
 */
object Multimodal {

  /** The asset relation schema: one payload + typed metadata. */
  final case class Asset(
      assetId: Long,
      mime: String,          // image/jpeg, audio/wav, video/mp4, ...
      width: Int,            // 0 when not applicable
      height: Int,
      durationMs: Long,      // 0 for stills
      payload: Array[Byte])

  final case class DecodedMeta(assetId: Long, mime: String, ok: Boolean,
                               codec: String, nBytes: Long)

  final case class AssetFeature(assetId: Long, kind: String,
                                feature: Array[Float])

  final case class Frame(assetId: Long, frameIdx: Int, tsMs: Long,
                         payload: Array[Byte])

  /** STUB codec probe: deterministic pure function of the bytes (magic-
    * number sniff + length); replace with a real decoder off-sandbox. */
  def decodeStub(a: Asset): DecodedMeta = {
    val p = a.payload
    val codec =
      if (p.length >= 2 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8) "jpeg"
      else if (p.length >= 4 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F') "riff"
      else if (p.length >= 4 && p(0) == 0x1a && p(1) == 0x45 && (p(2) & 0xff) == 0xdf && (p(3) & 0xff) == 0xa3) "mkv"
      else "unknown"
    DecodedMeta(a.assetId, a.mime, codec != "unknown", codec, p.length.toLong)
  }

  /** Deterministic fake feature extractor: a 64-bin byte histogram,
    * L1-normalized — stands in for an image/audio embedding; real feature
    * code drops into the same mapPartitions slot with the same shape. */
  def featureStub(a: Asset): AssetFeature = {
    val hist = new Array[Float](64)
    var i = 0
    while (i < a.payload.length) {
      hist((a.payload(i) & 0xff) >> 2) += 1f
      i += 1
    }
    val total = math.max(1, a.payload.length).toFloat
    var j = 0
    while (j < 64) { hist(j) /= total; j += 1 }
    AssetFeature(a.assetId, "bytehist64", hist)
  }

  /** Decode probe over the asset table (partition-local batches). */
  def decode(assets: Dataset[Asset]): Dataset[DecodedMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition setup (codec contexts, model handles) goes here once
      it.map(decodeStub)
    }
  }

  /** Feature extraction -> (assetId, kind, ARRAY<FLOAT>) — feeds the
    * Similarity operators (embedding-cosine near-dup, ANN). */
  def features(assets: Dataset[Asset]): Dataset[AssetFeature] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(featureStub))
  }

  final case class Resized(assetId: Long, newLen: Int, payload: Array[Byte])

  /** STUB resize: 1-D nearest-neighbor resample of the payload bytes to
    * `newLen` (source index = i * len / newLen, integer division — the
    * exact arithmetic a nearest-neighbor image downscale applies per axis;
    * a real image resize drops into the same mapPartitions slot). Works
    * for down- AND up-sampling; pure integer math, oracle-reproducible. */
  def resizeStub(a: Asset, newLen: Int): Resized = {
    val len = a.payload.length
    val out = new Array[Byte](if (len == 0) 0 else newLen)
    var i = 0
    while (i < out.length) {
      out(i) = a.payload(((i.toLong * len) / newLen).toInt)
      i += 1
    }
    Resized(a.assetId, out.length, out)
  }

  /** Partition-local batch resize over the asset table. */
  def resize(assets: Dataset[Asset], newLen: Int): Dataset[Resized] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(resizeStub(_, newLen)))
  }

  /** Frame sampling for video-ish assets: every `everyMs` of duration,
    * emit a frame row whose payload is a deterministic slice of the
    * source bytes (stub for a real frame grab). 1 -> N generator shape. */
  def sampleFrames(assets: Dataset[Asset], everyMs: Long): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.flatMap { a =>
      if (a.durationMs <= 0 || a.payload.isEmpty) Iterator.empty
      else {
        val n = math.min(1 + a.durationMs / everyMs, 64L).toInt
        (0 until n).iterator.map { i =>
          val ts = i.toLong * everyMs
          val off = ((ts.toDouble / math.max(1, a.durationMs)) *
            math.max(0, a.payload.length - 16)).toInt
          Frame(a.assetId, i, ts,
            a.payload.slice(off, math.min(a.payload.length, off + 16)))
        }
      }
    }
  }

  /** Adapter: a documents-like relation as an Asset table (payload = the
    * UTF-8 text bytes; every doc_id % 3 == 2 is stamped as a timed "video"
    * asset so the frame-sampling path has non-zero durations). Payloads
    * derive purely from table columns, so the DuckDB oracle can reproduce
    * every downstream decode/feature/frame result exactly — this is what
    * makes the multimodal plumbing driver-checkable, not just spec-tested. */
  def assetsFromDocs(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): Dataset[Asset] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val video = id % 3 == 2
        Asset(id, if (video) "video/x-text" else "text/plain", 0, 0,
          if (video) 10L * payload.length else 0L, payload)
      }
  }

  final case class AssetCounts(assetId: Long, kind: String, counts: Array[Long])

  /** Exact-integer twin of [[featureStub]]: the UNnormalized 64-bin byte
    * histogram. Same mapPartitions slot and batch shape; integer output so
    * the oracle compare is exact (the L1-normalized float variant stays for
    * similarity-search consumers). */
  def featureCounts(assets: Dataset[Asset]): Dataset[AssetCounts] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      val hist = new Array[Long](64)
      var i = 0
      while (i < a.payload.length) {
        hist((a.payload(i) & 0xff) >> 2) += 1L
        i += 1
      }
      AssetCounts(a.assetId, "bytehist64", hist)
    })
  }

  /** Deterministic synthetic asset table (payload bytes from the id). */
  def synthesize(spark: SparkSession, n: Long,
                 numPartitions: Int = 16): Dataset[Asset] = {
    import spark.implicits._
    spark.range(0, n, 1, numPartitions).as[Long].map { id =>
      val mime = (id % 3) match {
        case 0 => "image/jpeg"
        case 1 => "audio/wav"
        case _ => "video/x-matroska"
      }
      val len = 256 + (id * 37 % 1024).toInt
      val payload = new Array[Byte](len)
      var i = 0
      var h = id * 6364136223846793005L + 1442695040888963407L
      while (i < len) {
        payload(i) = (h >>> 24).toByte
        h = h * 6364136223846793005L + 1442695040888963407L
        i += 1
      }
      // stamp magic numbers so decodeStub succeeds per mime
      (id % 3) match {
        case 0 => payload(0) = 0xff.toByte; payload(1) = 0xd8.toByte
        case 1 => payload(0) = 'R'; payload(1) = 'I'; payload(2) = 'F'; payload(3) = 'F'
        case _ => payload(0) = 0x1a; payload(1) = 0x45
          payload(2) = 0xdf.toByte; payload(3) = 0xa3.toByte
      }
      Asset(id, mime,
        if (id % 3 == 0) 640 + (id % 16).toInt * 8 else 0,
        if (id % 3 == 0) 480 else 0,
        if (id % 3 == 2) 1000 + (id % 30) * 500 else 0,
        payload)
    }
  }
}
