package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: opaque binary payloads + typed metadata,
 * with batched per-partition feature extraction.
 *
 * The decode step itself is a STUB — this container has no image/audio
 * codecs — replaced by a deterministic fake that maps payload bytes to a
 * fixed-width feature vector. Everything around it is real and is what
 * matters at 100 TB: the schema (binary + metadata struct), the
 * mapPartitions batching (the shape a vectorized decoder needs: on
 * PySpark this is `mapInPandas` with arrow batches; on the JVM a batched
 * `mapPartitions`), and the narrow, shuffle-free plan.
 */
object Multimodal {

  /** One media row: id + opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      payload: Array[Byte],
      kind: String,
      width: Int,
      height: Int)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      feature: Array[Double])

  /**
   * Pack a text corpus as fake media rows: payload = UTF-8 bytes,
   * metadata derived deterministically. (Stand-in for reading real
   * image/audio blobs, which would arrive as parquet binary columns.)
   */
  def packAsMedia(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val df = docs.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      when(col(idCol) % 2 === 0, "image").otherwise("audio").as("kind"),
      (pmod(col(idCol), lit(4)) * 160 + 320).cast("int").as("width"),
      (pmod(col(idCol), lit(3)) * 120 + 240).cast("int").as("height"))
    df.as[MediaRow](Encoders.product[MediaRow])
  }

  /**
   * Batched feature extraction over the payload column. Batches of
   * `batchSize` rows are decoded together — exactly the call shape a
   * vectorized (GPU/SIMD) decoder wants; the decoder here is the STUB.
   */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // ---- STUB DECODER ----------------------------------------
        // Real pipeline: decode image/audio batch here (libjpeg /
        // ffmpeg / model inference). Deterministic fake: 8 moments of
        // the byte histogram, so tests have stable expectations.
        batch.map { row =>
          val feats = stubDecode(row.payload)
          MediaFeatures(row.media_id, row.kind, row.payload.length, feats)
        }
        // -----------------------------------------------------------
      }
    }
  }

  /**
   * [[extractFeatures]] through the ARROW-BATCHED path: rows are
   * serialized once into Arrow record batches
   * (`spark.sql.execution.arrow.maxRecordsPerBatch` rows each — the
   * exact batches `mapInPandas`/`mapInArrow` would ship to a Python
   * decoder) and the decoder reads the payload column vector directly
   * from contiguous off-heap buffers — the production call shape for a
   * vectorized (SIMD/GPU/FFI) decoder on the JVM. The decode itself is
   * the same deterministic STUB; results are row-identical to the
   * `mapPartitions` twin (spec'd + oracle-checked as mm03).
   */
  def extractFeaturesArrow(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import org.apache.arrow.vector.{BigIntVector, VarBinaryVector, VarCharVector}
    val df = media.toDF()
    val spark = df.sparkSession
    val rdd = org.apache.spark.sql.graftshim.ArrowBridge.decodeBatches(df) { root =>
      val ids = root.getVector("media_id").asInstanceOf[BigIntVector]
      val payloads = root.getVector("payload").asInstanceOf[VarBinaryVector]
      val kinds = root.getVector("kind").asInstanceOf[VarCharVector]
      (0 until root.getRowCount).iterator.map { i =>
        // ---- STUB DECODER (vectorized batch in hand) --------------
        val bytes = payloads.get(i)
        MediaFeatures(ids.get(i), new String(kinds.get(i), "UTF-8"),
          bytes.length, stubDecode(bytes))
        // -----------------------------------------------------------
      }
    }
    spark.createDataset(rdd)(Encoders.product[MediaFeatures])
  }

  final case class FrameFeatures(
      media_id: Long,
      frame_idx: Int,
      n_bytes: Int,
      mean_intensity: Double)

  /**
   * Frame sampling over the binary payload: the payload is cut into
   * fixed-size frames, every `every`-th frame is kept, and each kept
   * frame is "decoded" to features in batched `mapPartitions` — for
   * real video this is the demux + keyframe-sample + decode shape
   * (frame boundaries would come from the container index instead of
   * fixed offsets; the decode is the STUB, everything around it —
   * per-frame explode, batching, narrow shuffle-free plan — is real).
   * mean_intensity: frame byte mean scaled to [0, 1], byte order
   * left-to-right (the oracle reproduces it exactly on ASCII data).
   */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 64,
      every: Int = 2, batchSize: Int = 64): Dataset[FrameFeatures] = {
    require(frameBytes > 0 && every > 0)
    implicit val enc = Encoders.product[FrameFeatures]
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { row =>
          val n = row.payload.length
          val frames = (n + frameBytes - 1) / frameBytes
          (0 until frames by every).map { f =>
            val start = f * frameBytes
            val end = math.min(start + frameBytes, n)
            // ---- STUB DECODER: mean byte intensity ---------------
            var s = 0.0
            var i = start
            while (i < end) { s += (row.payload(i) & 0xff) / 255.0; i += 1 }
            // ------------------------------------------------------
            FrameFeatures(row.media_id, f, end - start, s / (end - start))
          }
        }
      }
    }
  }

  final case class ResizedMedia(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      target_w: Int,
      target_h: Int,
      n_bytes_out: Int,
      mean_intensity: Double)

  /**
   * Resize over the binary payload: each media row is downsampled to a
   * target resolution — for real images this is the decode → scale →
   * re-encode stage (libjpeg/swscale); the STUB keeps every k-th
   * payload byte with k = the integer area ratio
   * (width·height)/(target_w·target_h), so output size and content are
   * deterministic functions of the metadata and payload. Everything
   * around the stub is the production shape: metadata-driven per-row
   * decision (k comes from the width/height columns, not a constant),
   * batched `mapPartitions`, narrow shuffle-free plan.
   */
  def resize(media: Dataset[MediaRow], targetW: Int = 160, targetH: Int = 120,
      batchSize: Int = 64): Dataset[ResizedMedia] = {
    require(targetW > 0 && targetH > 0)
    implicit val enc = Encoders.product[ResizedMedia]
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val k = math.max(1,
            (row.width.toLong * row.height / (targetW.toLong * targetH)).toInt)
          // ---- STUB RESIZE: keep every k-th byte -------------------
          val n = row.payload.length
          var s = 0.0
          var cnt = 0
          var i = 0
          while (i < n) { s += (row.payload(i) & 0xff) / 255.0; cnt += 1; i += k }
          // ----------------------------------------------------------
          ResizedMedia(row.media_id, row.kind, row.width, row.height,
            targetW, targetH, cnt, if (cnt == 0) 0.0 else s / cnt)
        }
      }
    }
  }

  /** Deterministic fake decode: 8-dim feature from byte statistics. */
  private[ops] def stubDecode(bytes: Array[Byte]): Array[Double] = {
    val n = math.max(bytes.length, 1)
    val feats = new Array[Double](8)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      feats(b % 8) += b.toDouble / 255.0
      i += 1
    }
    feats.map(_ / n)
  }
}
