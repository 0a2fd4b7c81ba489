package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video as opaque BINARY
 * payloads + typed metadata, with decode / feature-extraction stages
 * running per-partition on executors.
 *
 * The decode step is STUBBED deterministically (this environment ships
 * no image/audio codecs); everything around it — schema, batching,
 * partitioning, feature shapes — is real and tested, so a deployment
 * replaces ONE function body (decodeStub) with e.g. a JNI/ImageIO call
 * without touching the pipeline.
 */
object Multimodal {

  /** Decoded-asset metadata (what a real decoder would return). */
  case class AssetMeta(width: Int, height: Int, channels: Int, format: String)

  /** Fixed-size content feature (what a real extractor would return). */
  case class AssetFeature(id: Long, nBytes: Long, checksum: Long,
                          histogram: Array[Long], meta: AssetMeta)

  /**
   * STUB decoder — deterministic fake: derives plausible metadata from
   * the payload bytes. Replace this body with a real codec call; the
   * signature (bytes → AssetMeta) is the integration contract.
   */
  def decodeStub(payload: Array[Byte]): AssetMeta = {
    val b0 = if (payload.nonEmpty) payload(0) & 0xFF else 0
    val b1 = if (payload.length > 1) payload(1) & 0xFF else 0
    AssetMeta(width = b0 % 64 + 1, height = b1 % 64 + 1, channels = 3,
      format = "stub")
  }

  /** 16-bin byte histogram + checksum — a stand-in for a real feature
    * extractor (embedding, mel-spectrogram, …) with the same shape:
    * binary in, fixed-size numeric vector out. */
  def extractFeature(id: Long, payload: Array[Byte]): AssetFeature = {
    val hist = new Array[Long](16)
    var sum = 0L
    var i = 0
    while (i < payload.length) {
      val v = payload(i) & 0xFF
      hist(v % 16) += 1
      sum += v
      i += 1
    }
    AssetFeature(id, payload.length.toLong, sum, hist, decodeStub(payload))
  }

  /**
   * Run the (stub) decode + feature-extract over a binary column,
   * per-partition on executors — the Scala analog of mapInPandas:
   * batch-iterate rows, call the kernel, emit typed results. Catalyst
   * prunes the scan to exactly (id, payload).
   */
  def extractFeatures(df: DataFrame, id: String, payload: String): DataFrame = {
    implicit val enc = Encoders.product[AssetFeature]
    df.select(col(id).cast("long"), col(payload))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it => it.map { case (i, bytes) => extractFeature(i, bytes) } }
      .toDF()
  }

  /** Synthesize a multimodal table from text docs (payload = utf-8
    * bytes) — the corpus has no binary column, so tests fabricate one
    * with the exact schema a real pipeline would carry. */
  def synthesizeAssets(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id), col(text).cast("binary").as("payload"),
      lit("image/stub").as("mime"))
}
