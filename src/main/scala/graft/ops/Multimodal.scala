package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-local batches.
  *
  * The Spark side — schema, partitioning, batch shape, UDF signatures —
  * is real and tested. The actual media decoding is STUBBED with
  * deterministic fakes (`decodeImageStub`, `featuresStub`,
  * `frameSampleStub`): this container has no image/audio libraries, and
  * a production deployment swaps the stub lambdas for real codec calls
  * without touching the plumbing (same `mapPartitions` batch loop a
  * Python pipeline would express with `mapInPandas`).
  */
object Multimodal {

  final case class MediaMeta(format: String, width: Int, height: Int, sizeBytes: Long)
  final case class MediaRow(id: Long, bytes: Array[Byte])
  final case class FeatureRow(id: Long, meta: MediaMeta, features: Array[Float])

  /** STUB decode: deterministic fake metadata derived from the byte
    * content (a real impl parses the codec header). */
  def decodeImageStub(bytes: Array[Byte]): MediaMeta = {
    val h = if (bytes.isEmpty) 0L
      else graft.functions.Hash64.hashString(java.util.Base64.getEncoder.encodeToString(bytes))
    val fmts = Array("png", "jpeg", "webp")
    MediaMeta(
      format = fmts(java.lang.Math.floorMod(h, 3L).toInt),
      width = 64 + java.lang.Math.floorMod(h >>> 8, 1024L).toInt,
      height = 64 + java.lang.Math.floorMod(h >>> 24, 1024L).toInt,
      sizeBytes = bytes.length.toLong)
  }

  /** STUB feature extractor: hash bytes into a dim-bucket histogram,
    * L2-normalized (a real impl runs a vision/audio encoder). */
  def featuresStub(bytes: Array[Byte], dim: Int = 64): Array[Float] = {
    val v = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      v(java.lang.Math.floorMod(bytes(i).toInt, dim)) += 1.0f
      i += 1
    }
    var norm = 0.0
    i = 0
    while (i < dim) { norm += v(i).toDouble * v(i); i += 1 }
    if (norm > 0) { val inv = (1.0 / math.sqrt(norm)).toFloat
      i = 0; while (i < dim) { v(i) *= inv; i += 1 } }
    v
  }

  /** STUB frame sampler: every-nth 16-byte slice stands in for video
    * frame extraction. */
  def frameSampleStub(bytes: Array[Byte], everyN: Int): Seq[Array[Byte]] =
    bytes.grouped(16).zipWithIndex.collect {
      case (frame, i) if i % everyN == 0 => frame
    }.toSeq

  /** STUB resize: deterministic byte downsampling to a target "pixel"
    * budget (a real impl decodes, scales, re-encodes). Output size is
    * min(input, targetW*targetH) — monotone like a real downscale. */
  def resizeStub(bytes: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    val budget = targetW * targetH
    if (bytes.length <= budget) bytes
    else {
      val out = new Array[Byte](budget)
      var i = 0
      while (i < budget) {
        out(i) = bytes((i.toLong * bytes.length / budget).toInt)
        i += 1
      }
      out
    }
  }

  final case class ResizedRow(id: Long, bytes: Array[Byte], meta: MediaMeta)

  /** Batch resize pipeline: binary rows → resized binary + target-dim
    * metadata, partition-local, no shuffle — same batch contract as
    * [[batchFeaturize]] so a GPU image pipeline slots in unchanged. */
  def batchResize(media: Dataset[MediaRow], targetW: Int = 224, targetH: Int = 224,
      batchSize: Int = 32): Dataset[ResizedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val rb = resizeStub(r.bytes, targetW, targetH)
          ResizedRow(r.id, rb,
            decodeImageStub(r.bytes).copy(width = targetW, height = targetH,
              sizeBytes = rb.length.toLong))
        }
      }
    }
  }

  /** The batch featurize pipeline: binary rows → (meta, features) in
    * partition-local batches of `batchSize` — the exact batch shape a
    * GPU-backed encoder wants. No shuffle: one pass over the data. */
  def batchFeaturize(media: Dataset[MediaRow], batchSize: Int = 32,
      dim: Int = 64): Dataset[FeatureRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a real encoder would run one forward pass
        batch.map(r => FeatureRow(r.id, decodeImageStub(r.bytes), featuresStub(r.bytes, dim)))
      }
    }
  }

  /** Demo source: derive a deterministic binary column from any string
    * column (stands in for reading real media files). */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(textCol).cast("binary").as("bytes"))
      .as[MediaRow]
  }
}
