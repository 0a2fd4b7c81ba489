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

  /**
   * STUB resize — a payload→payload kernel with target dimensions
   * (real impl: decode, scale, re-encode). The stub keeps determinism:
   * truncate/cycle bytes to a size proportional to the target area so
   * downstream size accounting behaves like a real resize.
   */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = math.max(1, math.min(payload.length, w * h))
    Array.tabulate(target)(i => payload(i % math.max(1, payload.length)))
  }

  /** Resize over a binary column; emits the resized payload plus its
    * (stub-)decoded metadata. Same executor-side batch shape as
    * [[extractFeatures]]. */
  def resize(df: DataFrame, id: String, payload: String,
             w: Int, h: Int): DataFrame = {
    implicit val enc =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY, Encoders.scalaInt)
    df.select(col(id).cast("long"), col(payload))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.map { case (i, bytes) =>
          val out = resizeStub(bytes, w, h)
          (i, out, out.length)
        }
      }
      .toDF(id, "payload", "n_bytes")
  }

  /**
   * STUB frame sampler — video payload → every k-th "frame". A real
   * impl demuxes; the stub slices the payload into fixed-size chunks
   * so the output shape (one row per sampled frame, frame index +
   * bytes) and the explode-style row expansion are real.
   */
  def frameSample(df: DataFrame, id: String, payload: String,
                  frameBytes: Int = 256, everyK: Int = 4): DataFrame = {
    implicit val enc =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt, Encoders.BINARY)
    df.select(col(id).cast("long"), col(payload))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.flatMap { case (i, bytes) =>
          val nFrames = math.max(1, bytes.length / frameBytes)
          (0 until nFrames by everyK).iterator.map { f =>
            (i, f, bytes.slice(f * frameBytes,
              math.min(bytes.length, (f + 1) * frameBytes)))
          }
        }
      }
      .toDF(id, "frame", "frame_bytes")
  }

  /**
   * STUB embedding kernel — payload → dim-dimensional float vector
   * (real impl: an ONNX/JNI model call over the decoded asset; this
   * signature is the integration contract). dim j = (sum of bytes at
   * positions ≡ j mod dim) % 997, scaled by 1/1024 — both the residue
   * (< 2^10) and the power-of-two division are EXACT in Float and
   * Double, so downstream double-precision cosines are bit-identical
   * across engines and mm_embed_topk carries a full oracle.
   */
  def embedStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val s = new Array[Long](dim)
    var i = 0
    while (i < payload.length) { s(i % dim) += payload(i) & 0xFF; i += 1 }
    Array.tabulate(dim)(j => (s(j) % 997).toFloat / 1024.0f)
  }

  /** Embedding extraction over a binary column — executor-side batch
    * kernel (same shape as [[extractFeatures]]); output plugs directly
    * into the Similarity ANN operators. */
  def embed(df: DataFrame, id: String, payload: String,
            dim: Int = 16): DataFrame = {
    implicit val enc = Encoders.tuple(Encoders.scalaLong,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())
    df.select(col(id).cast("long"), col(payload))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.map { case (i, bytes) => (i, embedStub(bytes, dim)) }
      }
      .toDF(id, "embedding")
  }

  /** Synthesize a multimodal table from text docs (payload = utf-8
    * bytes) — the corpus has no binary column, so tests fabricate one
    * with the exact schema a real pipeline would carry. */
  def synthesizeAssets(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id), col(text).cast("binary").as("payload"),
      lit("image/stub").as("mime"))
}
