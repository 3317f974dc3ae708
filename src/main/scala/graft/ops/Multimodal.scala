package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: opaque binary payloads + typed metadata,
 * with batched per-partition feature extraction.
 *
 * IMAGE decode is REAL: [[decodeImages]] runs `javax.imageio.ImageIO`
 * (ships with every JDK — PNG/JPEG/BMP/GIF) over a binary column in
 * batched `mapPartitions`, and [[synthesizePngs]] produces genuine PNG
 * bytes to feed it. AUDIO decode is REAL too: [[decodeWavs]] runs
 * `javax.sound.sampled.AudioSystem` (also JDK-shipped — WAV/PCM, AIFF,
 * AU) with [[synthesizeWavs]] producing genuine RIFF/WAVE blobs. VIDEO
 * decode is REAL for the uncompressed profile: [[decodeAvis]] demuxes
 * RIFF/AVI containers and decodes BI_RGB DIB frames (no codec exists
 * or is needed for that profile), with [[synthesizeAvis]] producing
 * genuine AVI blobs; compressed streams are dropped like corrupt
 * blobs. The earlier stub paths (mm01–mm04) remain as the plumbing
 * shape for codecs the JVM lacks. Either way the plumbing is what
 * matters at 100 TB: the schema (binary + metadata struct), the
 * mapPartitions batching (the shape a vectorized decoder needs: on
 * PySpark this is `mapInPandas` with arrow batches; on the JVM a
 * batched `mapPartitions`), and the narrow, shuffle-free plan.
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

  // ---------------------------------------------------------------------
  // REAL image codec path (javax.imageio — no stub).
  // ---------------------------------------------------------------------

  /** One image row: id + real encoded image bytes (PNG/JPEG/...). */
  final case class ImageRow(media_id: Long, img: Array[Byte])

  /** Per-image decoded pixel statistics; sums are exact integers so the
    * oracle can replay them without float drift. */
  final case class ImageStats(
      media_id: Long,
      width: Int,
      height: Int,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long)

  /** Deterministic RGB value of pixel (x, y) of image `id` — pure integer
    * arithmetic, so a SQL oracle can recompute every pixel. PNG is
    * lossless: encode → decode round-trips these values exactly. */
  private[ops] def pixelRgb(id: Long, x: Int, y: Int, jitter: Int = 0): Int = {
    // `jitter` brightens the red channel (saturating) — the controlled
    // perceptual perturbation mm11's near-dup corpus plants
    val r = math.min(255, ((id * 31 + x * 7 + y * 13) % 256).toInt + jitter)
    val g = ((id * 17 + x * 11 + y * 3) % 256).toInt
    val b = ((id * 7 + x * 5 + y * 19) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  /** Image dimensions as a deterministic function of the id, so decode
    * has real per-row metadata to recover. */
  private[ops] def imageDims(id: Long): (Int, Int) =
    ((8 + (id % 3) * 4).toInt, (8 + (id % 2) * 4).toInt)

  /** Encode one deterministic image to real PNG bytes via ImageIO. */
  private[graft] def encodePng(id: Long, format: String = "png",
      jitter: Int = 0): Array[Byte] = {
    val (w, h) = imageDims(id)
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { im.setRGB(x, y, pixelRgb(id, x, y, jitter)); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, format, out)
    out.toByteArray
  }

  /**
   * Synthesize real PNG blobs, one per input id — the stand-in for a
   * parquet binary column of crawled images. Runs in the executors
   * (narrow, shuffle-free); the bytes are genuine PNG (ImageIO-encoded),
   * not a fake, so downstream decode exercises a real codec.
   */
  def synthesizePngs(ids: DataFrame, idCol: String): Dataset[ImageRow] = {
    implicit val enc = Encoders.product[ImageRow]
    ids.select(col(idCol).cast("long").as("media_id"))
      .as[Long](Encoders.scalaLong)
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // no temp-file cache in executors
        it.map(id => ImageRow(id, encodePng(id)))
      }
  }

  /** [[synthesizePngs]] with the image CONTENT decoupled from the row
    * id: pixels derive from `seedCol` (optionally perturbed by
    * `jitterCol`'s saturating red-channel shift), the row keeps
    * `idCol` — how mm11 plants perceptual near-duplicate copies of
    * existing images under fresh ids. */
  def synthesizePngsSeeded(rows: DataFrame, idCol: String, seedCol: String,
      jitterCol: String): Dataset[ImageRow] = {
    implicit val enc = Encoders.product[ImageRow]
    implicit val tEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaInt)
    rows.select(col(idCol).cast("long"), col(seedCol).cast("long"),
        col(jitterCol).cast("int"))
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, seed, j) => ImageRow(id, encodePng(seed, jitter = j)) }
      }
  }

  /** Per-image perceptual hash row. */
  final case class ImageHash(media_id: Long, ahash: Long)

  /**
   * Perceptual AVERAGE-HASH over the REAL decode path (the classic
   * aHash: grid×grid block means of the gray image, one bit per block
   * — 1 iff the block mean ≥ the global mean of block means): the
   * content fingerprint for IMAGE near-dup detection, tolerant of
   * small brightness shifts and re-encodes where d01's byte
   * fingerprint is not. All arithmetic after decode is integer
   * (floor gray, floor block means, floor mean-of-means), so for
   * losslessly-coded inputs an oracle replays the hash bit-for-bit.
   * Width and height must be divisible by `grid` (true for the
   * synthetic corpus; production resizes first — mm08's box filter).
   * Un-decodable blobs drop, the crawl posture.
   */
  def imageAHash(imgs: Dataset[ImageRow], grid: Int = 4,
      batchSize: Int = 64): Dataset[ImageHash] = {
    implicit val enc = Encoders.product[ImageHash]
    imgs.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap(row =>
          aHashBytes(row.img, grid).map(h => ImageHash(row.media_id, h)))
      }
    }
  }

  /** The row-local decode+hash behind [[imageAHash]] and the streaming
    * twin (`streaming/MediaStream`): None for un-decodable blobs or
    * dimensions the grid doesn't divide. */
  private[graft] def aHashBytes(img: Array[Byte], grid: Int): Option[Long] = {
    val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(img))
    if (im == null || im.getWidth % grid != 0 || im.getHeight % grid != 0) None
    else {
      val bw = im.getWidth / grid
      val bh = im.getHeight / grid
      val ms = Array.tabulate(grid * grid) { bi =>
        val gx = bi % grid
        val gy = bi / grid
        var s = 0L
        var dy = 0
        while (dy < bh) {
          var dx = 0
          while (dx < bw) {
            val p = im.getRGB(gx * bw + dx, gy * bh + dy)
            s += (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
            dx += 1
          }
          dy += 1
        }
        s / (bw * bh)
      }
      val mean = ms.sum / (grid * grid)
      var hash = 0L
      var i = 0
      while (i < ms.length) {
        if (ms(i) >= mean) hash |= 1L << i
        i += 1
      }
      Some(hash)
    }
  }

  /**
   * REAL image decode over a binary column: `javax.imageio.ImageIO.read`
   * per blob in batched `mapPartitions` (the same call shape as the stub
   * paths — for JPEG/PNG on the JVM this IS the production operator).
   * Emits recovered dimensions plus exact per-channel pixel sums.
   * Un-decodable blobs are dropped (ImageIO returns null), the standard
   * posture for a crawl pipeline where a fraction of blobs is corrupt.
   */
  def decodeImages(imgs: Dataset[ImageRow], batchSize: Int = 64): Dataset[ImageStats] = {
    implicit val enc = Encoders.product[ImageStats]
    imgs.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { row =>
          val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.img))
          if (im == null) None
          else {
            val w = im.getWidth
            val h = im.getHeight
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = im.getRGB(x, y)
                sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                x += 1
              }
              y += 1
            }
            Some(ImageStats(row.media_id, w, h, sr, sg, sb))
          }
        }
      }
    }
  }

  /**
   * REAL decode + downsample in one pass: ImageIO decode, then a
   * `factor`× box filter — each output pixel is the integer-floor mean
   * of its factor×factor block — and exact channel sums of the RESIZED
   * image. Pure integer arithmetic end to end (PNG lossless, floor
   * division), so the whole resize replays in SQL. Dims truncate to
   * whole blocks (the synthesized dims are block-aligned). This is
   * mm04's resize stage upgraded from metadata-driven strides over fake
   * bytes to real decoded pixels.
   */
  def downsampleImages(imgs: Dataset[ImageRow], factor: Int = 2,
      batchSize: Int = 64): Dataset[ImageStats] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    implicit val enc = Encoders.product[ImageStats]
    imgs.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { row =>
          val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.img))
          if (im == null) None
          else {
            val ow = im.getWidth / factor
            val oh = im.getHeight / factor
            val area = factor * factor
            var sr = 0L; var sg = 0L; var sb = 0L
            var yy = 0
            while (yy < oh) {
              var xx = 0
              while (xx < ow) {
                var ar = 0; var ag = 0; var ab = 0
                var dy = 0
                while (dy < factor) {
                  var dx = 0
                  while (dx < factor) {
                    val p = im.getRGB(xx * factor + dx, yy * factor + dy)
                    ar += (p >> 16) & 0xff; ag += (p >> 8) & 0xff; ab += p & 0xff
                    dx += 1
                  }
                  dy += 1
                }
                sr += ar / area; sg += ag / area; sb += ab / area
                xx += 1
              }
              yy += 1
            }
            Some(ImageStats(row.media_id, ow, oh, sr, sg, sb))
          }
        }
      }
    }
  }

  // ---------------------------------------------------------------------
  // REAL audio codec path (javax.sound.sampled — WAV/PCM ships with the
  // JDK, like ImageIO for images). Video decode is the one remaining
  // genuine stub: no container/codec library exists in the JVM itself.
  // ---------------------------------------------------------------------

  /** One audio row: id + real encoded WAV bytes. */
  final case class AudioRow(media_id: Long, wav: Array[Byte])

  /** Per-clip decoded sample statistics; sums are exact integers so the
    * oracle can replay them without float drift. */
  final case class AudioStats(
      media_id: Long,
      sample_rate: Int,
      n_samples: Long,
      sum_s: Long,
      sum_abs: Long,
      max_abs: Int)

  /** One clip's exact stats AFTER decimation resampling — what
    * [[decimateWavs]] emits. */
  final case class AudioResampleStats(
      media_id: Long,
      src_rate: Int,
      dst_rate: Int,
      n_out: Long,
      sum_s: Long,
      sum_abs: Long,
      max_abs: Int)

  /**
   * Decimation RESAMPLING over the real decode path — the cheap
   * correct resample when the target rate divides the source (the
   * 48 k→16 k ASR-ingest normalization every speech corpus runs):
   * decode PCM16 via AudioSystem, keep every k-th sample where
   * k = src_rate / `targetRate` — a DATA-DRIVEN stride (mm04's move
   * at audio grain: the mixed-rate corpus exercises k = 2/3/4 in one
   * pass). Pure integer selection — no filter/interpolation math —
   * so the decimated stream's exact sums replay codec-free in the
   * oracle. Clips whose rate is not an integer multiple of the
   * target drop (a production pipeline routes those to a polyphase
   * resampler; selection semantics would be wrong for them), as do
   * MULTI-channel clips (striding a flat interleaved sample sequence
   * by k would mix channels rather than decimate each — those route
   * to a per-channel path this op doesn't pretend to be) and
   * undecodable blobs.
   *
   * Scale shape: batched mapPartitions like every decode op here —
   * one pass, no shuffle, output one stats row per clip.
   */
  def decimateWavs(clips: Dataset[AudioRow], targetRate: Int,
      batchSize: Int = 64): Dataset[AudioResampleStats] = {
    require(targetRate > 0, s"decimateWavs: bad targetRate $targetRate")
    implicit val enc = Encoders.product[AudioResampleStats]
    clips.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { row =>
          try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(row.wav))
            val src = in.getFormat
            val target = new javax.sound.sampled.AudioFormat(
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
              src.getSampleRate, 16, src.getChannels,
              2 * src.getChannels, src.getSampleRate, /*bigEndian=*/ false)
            val norm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
            val bytes = norm.readAllBytes()
            norm.close()
            in.close()
            val rate = math.round(src.getSampleRate)
            // multi-channel: a flat byte-stride would interleave
            // channels into one stream — route out like odd rates
            if (rate % targetRate != 0 || src.getChannels != 1) Nil
            else {
              val k = rate / targetRate
              val n = bytes.length / 2
              var sum = 0L
              var sabs = 0L
              var mabs = 0
              var cnt = 0L
              var i = 0
              while (i < n) {
                val v = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
                sum += v
                sabs += math.abs(v)
                if (math.abs(v) > mabs) mabs = math.abs(v)
                cnt += 1
                i += k
              }
              Seq(AudioResampleStats(row.media_id, rate, targetRate,
                cnt, sum, sabs, mabs))
            }
          } catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => Nil
            case _: IllegalArgumentException => Nil
            case _: java.io.IOException => Nil
          }
        }
      }
    }
  }

  /** One fixed-size window's exact sample stats — the per-window grain
    * [[decodeWavWindows]] emits for temporal audio analysis (energy
    * envelopes, silence detection) that [[AudioStats]]' whole-clip
    * totals erase. `sum_sq` is an exact integer (16-bit samples square
    * to ≤ 2^30; a window would need ~2^33 samples to overflow). */
  final case class AudioWindowStats(
      media_id: Long,
      win: Int,
      n_samples: Int,
      sum_sq: Long)

  /** [[decodeWavs]] at fixed-WINDOW grain: same AudioSystem decode and
    * PCM16 normalization, emitting one exact sum-of-squares row per
    * `windowSamples`-sample window (the trailing partial window keeps
    * its true count). Undecodable blobs drop, they don't crash. */
  def decodeWavWindows(clips: Dataset[AudioRow], windowSamples: Int = 200,
      batchSize: Int = 64): Dataset[AudioWindowStats] = {
    implicit val enc = Encoders.product[AudioWindowStats]
    clips.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { row =>
          try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(row.wav))
            val src = in.getFormat
            val target = new javax.sound.sampled.AudioFormat(
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
              src.getSampleRate, 16, src.getChannels,
              2 * src.getChannels, src.getSampleRate, /*bigEndian=*/ false)
            val norm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
            val bytes = norm.readAllBytes()
            norm.close()
            in.close()
            val n = bytes.length / 2
            val out = Seq.newBuilder[AudioWindowStats]
            var win = 0
            var i = 0
            while (i < n) {
              val end = math.min(i + windowSamples, n)
              var sq = 0L
              var j = i
              while (j < end) {
                val v = ((bytes(2 * j) & 0xff) | (bytes(2 * j + 1) << 8)).toShort.toLong
                sq += v * v
                j += 1
              }
              out += AudioWindowStats(row.media_id, win, end - i, sq)
              win += 1
              i = end
            }
            out.result()
          } catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => Nil
            case _: IllegalArgumentException => Nil
            case _: java.io.IOException => Nil
          }
        }
      }
    }
  }

  /** Deterministic 16-bit sample i of clip `id` — pure integer
    * arithmetic in [-1000, 1000], so a SQL oracle recomputes every
    * sample. PCM is lossless: encode → decode round-trips exactly. */
  private[ops] def sampleValue(id: Long, i: Int): Int =
    (((id * 31 + i.toLong * 17) % 2001) - 1000).toInt

  /** (sampleRate, nSamples) as deterministic functions of the id, so
    * decode has real per-row format metadata to recover. */
  private[ops] def audioParams(id: Long): (Int, Int) =
    ((8000 + (id % 3) * 4000).toInt, (400 + (id % 5) * 100).toInt)

  /** Encode one deterministic clip to real WAV bytes (16-bit PCM
    * signed little-endian mono) via AudioSystem. `jit != 0` adds the
    * saturating ±1 sample perturbation ((id+i) mod 3 − 1) — how
    * [[synthesizeWavsSeeded]] plants re-encoded near-duplicates whose
    * byte identity breaks but whose window-energy CONTOUR survives. */
  private[ops] def encodeWav(id: Long, jit: Int = 0): Array[Byte] = {
    val (rate, n) = audioParams(id)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v0 = sampleValue(id, i)
      val v = if (jit == 0) v0
        else math.max(-1000, math.min(1000, v0 + (((id + i) % 3) - 1).toInt))
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /**
   * Synthesize real WAV blobs, one per input id — the stand-in for a
   * parquet binary column of crawled audio. Runs in the executors
   * (narrow, shuffle-free); the bytes are a genuine RIFF/WAVE container
   * (AudioSystem-encoded), so downstream decode exercises a real codec.
   */
  def synthesizeWavs(ids: DataFrame, idCol: String): Dataset[AudioRow] = {
    implicit val enc = Encoders.product[AudioRow]
    ids.select(col(idCol).cast("long").as("media_id"))
      .as[Long](Encoders.scalaLong)
      .mapPartitions(it => it.map(id => AudioRow(id, encodeWav(id))))
  }

  /** [[synthesizeWavs]] with the audio CONTENT decoupled from the row
    * id: samples (and the format params) derive from `seedCol`,
    * optionally perturbed by `jitterCol`'s saturating ±1 pattern, while
    * the row keeps `idCol` — how mm14 plants re-encoded near-duplicate
    * clips of existing audio under fresh ids (the
    * [[synthesizePngsSeeded]] move at audio grain). */
  def synthesizeWavsSeeded(rows: DataFrame, idCol: String, seedCol: String,
      jitterCol: String): Dataset[AudioRow] = {
    implicit val enc = Encoders.product[AudioRow]
    implicit val tEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaInt)
    rows.select(col(idCol).cast("long"), col(seedCol).cast("long"),
        col(jitterCol).cast("int"))
      .as[(Long, Long, Int)]
      .mapPartitions(it => it.map { case (id, seed, j) =>
        AudioRow(id, encodeWav(seed, jit = j)) })
  }

  /**
   * AUDIO near-duplicate detection over the REAL decode path — the
   * energy-contour fingerprint of Haitsma & Kalker 2002 ("A Highly
   * Robust Audio Fingerprint System") reduced to its time-axis core:
   * decode PCM16 ([[decodeWavWindows]]' exact per-window
   * sum-of-squares), fingerprint bit w = 1 iff E(w+1) > E(w) — the
   * SIGN of the frame-to-frame energy delta, invariant to the small
   * amplitude perturbations a re-encode introduces where d01's byte
   * fingerprint is not. Clips match when they have the SAME window
   * count and Hamming(fp_a, fp_b) ≤ ⌊len/`hamDenom`⌋.
   *
   * Candidate generation is banded Hamming-LSH (the same pigeonhole
   * PSTL runs for SimHash, d04): the ≤63-bit fingerprint splits into
   * `bands` contiguous bit-ranges of ⌈len/bands⌉ bits; any pair within
   * the Hamming budget t < `bands` disagrees in at most t bands, so
   * SOME band matches exactly — the band equi-join is LOSSLESS for
   * t < bands, never all-pairs. The verify stage re-probes candidates
   * with one `bit_count(xor)` per pair: pure integer end to end, so an
   * oracle replays every bit including any true amplitude-offset twins
   * the corpus carries.
   *
   * Scale shape: decode is a narrow batched `mapPartitions`; the only
   * shuffles carry (media_id, win, energy) rows to per-clip partitions
   * (clip-bounded) and then (band bits, id)-only candidate keys — the
   * LSH-bucket discipline; audio bytes never shuffle. Requires
   * len ≤ 63 (fingerprints pack into one long word) AND
   * len div `hamDenom` < `bands` (the pigeonhole guarantee) — BOTH
   * enforced in-plan with raise_error; longer clips would band at
   * segment grain first, and a larger budget needs more bands.
   *
   * Output: (id_a, id_b, n_win, hamming), id_a < id_b, one row per
   * candidate pair within the budget.
   */
  def audioNearDup(clips: Dataset[AudioRow], windowSamples: Int = 25,
      bands: Int = 4, hamDenom: Int = 10): DataFrame = {
    require(bands >= 2 && hamDenom >= 1 && windowSamples >= 1,
      s"audioNearDup: bands=$bands hamDenom=$hamDenom w=$windowSamples")
    val winE = decodeWavWindows(clips, windowSamples).toDF()
    val byClip = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("win")
    // delta-sign bits packed LSB-first into one long; len <= 63 guarded
    // in-plan (raise_error, the packedOrderKey discipline)
    val fp = winE
      .select(col("media_id"), col("win"), col("sum_sq"),
        lead(col("sum_sq"), 1).over(byClip).as("nxt"))
      .where(col("nxt").isNotNull)
      .select(col("media_id"), col("win"),
        (col("nxt") > col("sum_sq")).cast("long").as("bit"))
      .groupBy("media_id")
      .agg(count(lit(1)).cast("int").as("len"),
        sum(expr("shiftleft(bit, win)")).as("bits"))
      .select(col("media_id"),
        when(col("len") <= 63 && col("len") / hamDenom < bands, col("len"))
          .otherwise(raise_error(concat(
            lit("audioNearDup: fingerprint len "), col("len"),
            lit(s" breaks a bound (len <= 63 one-word pack, or budget "),
            lit(s"len div $hamDenom >= bands=$bands — the pigeonhole "),
            lit("guarantee dies and band-LSH silently drops pairs "),
            lit("differing in every band; raise bands or segment)")))
          .cast("int")).as("len"),
        col("bits"))
    val banded = fp.select(col("media_id"), col("len"), col("bits"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"),
        ceil(col("len") / lit(bands)).cast("int").as("bw"))
      .select(col("media_id"), col("len"), col("bits"), col("band"),
        expr(s"shiftright(bits, band * bw) & (shiftleft(CAST(1 AS BIGINT), bw) - 1)")
          .as("bbits"))
    banded.as("a").join(banded.as("b"),
        col("a.len") === col("b.len") && col("a.band") === col("b.band") &&
          col("a.bbits") === col("b.bbits") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        col("a.len").as("len"), col("a.bits").as("ba"), col("b.bits").as("bb"))
      .distinct()
      .select(col("id_a"), col("id_b"), (col("len") + 1).as("n_win"),
        expr("bit_count(ba ^ bb)").cast("long").as("hamming"),
        col("len"))
      .where(col("hamming") <= expr(s"len div $hamDenom"))
      .drop("len")
  }

  /**
   * REAL audio decode over a binary column:
   * `AudioSystem.getAudioInputStream` per blob in batched
   * `mapPartitions` — for WAV/PCM on the JVM this IS the production
   * operator. Whatever PCM layout the container carries (8- or 16-bit,
   * mono or multi-channel, either endianness — so AIFF's big-endian
   * works too) is normalized to 16-bit signed little-endian by the
   * JDK's own converter before extraction, so the sample loop never
   * assumes a layout the format doesn't have. Emits the recovered
   * format (sample rate, interleaved sample count) plus exact integer
   * sample statistics over all channels. Un-decodable blobs and
   * formats the JDK cannot convert to PCM16 are dropped, the standard
   * crawl posture for partially-corrupt columns.
   */
  def decodeWavs(clips: Dataset[AudioRow], batchSize: Int = 64): Dataset[AudioStats] = {
    implicit val enc = Encoders.product[AudioStats]
    clips.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { row =>
          try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(row.wav))
            val src = in.getFormat
            val target = new javax.sound.sampled.AudioFormat(
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
              src.getSampleRate, 16, src.getChannels,
              2 * src.getChannels, src.getSampleRate, /*bigEndian=*/ false)
            val norm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
            val bytes = norm.readAllBytes()
            norm.close()
            in.close()
            val n = bytes.length / 2 // 16-bit samples, all channels interleaved
            var sum = 0L; var sumAbs = 0L; var maxAbs = 0
            var i = 0
            while (i < n) {
              val v = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
              sum += v; sumAbs += math.abs(v)
              if (math.abs(v) > maxAbs) maxAbs = math.abs(v)
              i += 1
            }
            Some(AudioStats(row.media_id, src.getSampleRate.toInt, n.toLong,
              sum, sumAbs, maxAbs))
          } catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => None
            case _: IllegalArgumentException => None // no PCM16 conversion path
            case _: java.io.IOException => None
          }
        }
      }
    }
  }

  // ---------------------------------------------------------------------
  // REAL video codec path: uncompressed-DIB (BI_RGB) AVI. AVI is RIFF —
  // the same container family as WAV — and a BI_RGB video stream needs
  // no codec: the demux (RIFF chunk walk: hdrl → strl → strh/strf,
  // movi → per-frame '##db' chunks) plus bottom-up BGR row decode with
  // 4-byte stride padding below is a complete decoder for this profile,
  // the video analogue of mm05/mm06. Streams that DO need a codec
  // (biCompression != 0) or aren't video are dropped, the same posture
  // as ImageIO returning null on an unreadable blob.
  // ---------------------------------------------------------------------

  /** One video row: id + real AVI container bytes. */
  final case class VideoRow(media_id: Long, avi: Array[Byte])

  /** Per-video decoded statistics; sums are exact integers over all
    * frames' pixels so the oracle can replay them without float drift. */
  final case class VideoStats(
      media_id: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long)

  /** One decoded frame's exact per-channel pixel sums — the per-frame
    * grain [[decodeAviFrames]] emits for temporal analysis (scene cuts,
    * motion estimates) that [[VideoStats]]' whole-video totals erase —
    * plus the frame's perceptual average-hash (`ahash`): the
    * [[imageAHash]] bit rule over the 4×4-block gray means of the
    * grid-aligned crop (block = (w/4, h/4) floor pixels — video dims
    * need not divide evenly the way mm11's stills do), integer end to
    * end, the per-frame fingerprint mm13's video near-dup keys on. */
  final case class VideoFrameStats(
      media_id: Long,
      frame: Int,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long,
      ahash: Long)

  /** Deterministic RGB of pixel (x, y) in frame f of video `id` — pure
    * integer arithmetic, so a SQL oracle recomputes every pixel. BI_RGB
    * is uncompressed: encode → decode round-trips exactly. `jit` is a
    * saturating red shift (the [[pixelRgb]] jitter rule) for planting
    * perceptual near-copies that break byte identity. */
  private[ops] def frameRgb(id: Long, f: Int, x: Int, y: Int,
      jit: Int = 0): (Int, Int, Int) = (
    math.min(255, ((id * 31 + f * 23 + x * 7 + y * 13) % 256).toInt + jit),
    ((id * 17 + f * 29 + x * 11 + y * 3) % 256).toInt,
    ((id * 7 + f * 37 + x * 5 + y * 19) % 256).toInt)

  /** (width, height, nFrames) as deterministic functions of the id.
    * Widths 7/11/15 are deliberately NOT multiples of 4 so the DIB rows
    * carry real stride padding (3·w rounded up to 4) — a decoder that
    * ignores the stride reads shifted garbage and fails the oracle. */
  private[ops] def videoParams(id: Long): (Int, Int, Int) =
    ((7 + (id % 3) * 4).toInt, (6 + (id % 2) * 4).toInt, (2 + (id % 3)).toInt)

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def u32le(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def u16le(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def riffChunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    fourcc(id) ++ u32le(body.length.toLong) ++ body ++ pad
  }

  private def riffList(listType: String, body: Array[Byte]): Array[Byte] =
    riffChunk("LIST", fourcc(listType) ++ body)

  /** Encode one deterministic clip as a genuine AVI container:
    * RIFF('AVI ') → LIST(hdrl){avih, LIST(strl){strh('vids'/'DIB '),
    * strf(BITMAPINFOHEADER, BI_RGB 24-bit)}} → LIST(movi){'00db'
    * uncompressed bottom-up BGR frames, rows padded to 4 bytes} →
    * idx1 keyframe index. Layout per the public AVI/RIFF format. */
  private[graft] def encodeAvi(id: Long, jit: Int = 0): Array[Byte] = {
    val (w, h, nFrames) = videoParams(id)
    val stride = (w * 3 + 3) / 4 * 4
    val frameSize = stride * h
    def frame(f: Int): Array[Byte] = {
      val b = new Array[Byte](frameSize)
      var y = 0
      while (y < h) {
        val rowOff = (h - 1 - y) * stride // bottom-up row order
        var x = 0
        while (x < w) {
          val (r, g, bl) = frameRgb(id, f, x, y, jit)
          b(rowOff + 3 * x) = bl.toByte     // BGR byte order
          b(rowOff + 3 * x + 1) = g.toByte
          b(rowOff + 3 * x + 2) = r.toByte
          x += 1
        }
        y += 1
      }
      b
    }
    val avih = riffChunk("avih",
      u32le(40000L) ++ u32le(frameSize * 25L) ++ u32le(0) ++ u32le(0x10) ++
        u32le(nFrames.toLong) ++ u32le(0) ++ u32le(1) ++ u32le(frameSize.toLong) ++
        u32le(w.toLong) ++ u32le(h.toLong) ++ u32le(0) ++ u32le(0) ++ u32le(0) ++ u32le(0))
    val strh = riffChunk("strh",
      fourcc("vids") ++ fourcc("DIB ") ++ u32le(0) ++ u16le(0) ++ u16le(0) ++
        u32le(0) ++ u32le(1) ++ u32le(25) ++ u32le(0) ++ u32le(nFrames.toLong) ++
        u32le(frameSize.toLong) ++ u32le(0xffffffffL) ++ u32le(0) ++
        u16le(0) ++ u16le(0) ++ u16le(w) ++ u16le(h))
    val strf = riffChunk("strf",
      u32le(40) ++ u32le(w.toLong) ++ u32le(h.toLong) ++ u16le(1) ++ u16le(24) ++
        u32le(0 /* BI_RGB */) ++ u32le(frameSize.toLong) ++ u32le(0) ++ u32le(0) ++
        u32le(0) ++ u32le(0))
    val hdrl = riffList("hdrl", avih ++ riffList("strl", strh ++ strf))
    val frames = (0 until nFrames).map(f => riffChunk("00db", frame(f)))
    val movi = riffList("movi", frames.reduce(_ ++ _))
    // idx1: one 16-byte keyframe entry per frame; offsets are relative
    // to the 'movi' fourcc, per convention
    val idx = (0 until nFrames).map { f =>
      fourcc("00db") ++ u32le(0x10 /* AVIIF_KEYFRAME */) ++
        u32le(4L + f.toLong * (8 + frameSize)) ++ u32le(frameSize.toLong)
    }
    val idx1 = riffChunk("idx1", idx.reduce(_ ++ _))
    riffChunk("RIFF", fourcc("AVI ") ++ hdrl ++ movi ++ idx1)
  }

  /**
   * Synthesize real AVI blobs, one per input id — the stand-in for a
   * parquet binary column of crawled video. Runs in the executors
   * (narrow, shuffle-free); the bytes are a genuine RIFF/AVI container
   * with uncompressed BI_RGB frames, so downstream decode exercises a
   * real demux + frame decode.
   */
  def synthesizeAvis(ids: DataFrame, idCol: String): Dataset[VideoRow] = {
    implicit val enc = Encoders.product[VideoRow]
    ids.select(col(idCol).cast("long").as("media_id"))
      .as[Long](Encoders.scalaLong)
      .mapPartitions(it => it.map(id => VideoRow(id, encodeAvi(id))))
  }

  /** [[synthesizeAvis]] with the video CONTENT decoupled from the row
    * id: frames derive from `seedCol` (optionally perturbed by
    * `jitterCol`'s saturating red shift) — [[synthesizePngsSeeded]]'s
    * copy-planting rule at video grain, how mm13 plants perceptual
    * near-duplicate re-uploads under fresh ids. */
  def synthesizeAvisSeeded(rows: DataFrame, idCol: String, seedCol: String,
      jitterCol: String): Dataset[VideoRow] = {
    implicit val enc = Encoders.product[VideoRow]
    implicit val tEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaInt)
    rows.select(col(idCol).cast("long"), col(seedCol).cast("long"),
        col(jitterCol).cast("int"))
      .as[(Long, Long, Int)]
      .mapPartitions(it =>
        it.map { case (id, seed, j) => VideoRow(id, encodeAvi(seed, jit = j)) })
  }

  private def leU32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def leU16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def fccAt(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /**
   * REAL video decode over a binary column: RIFF demux (walk hdrl →
   * strl for the stream format, movi for the frame chunks) + per-frame
   * uncompressed-DIB decode (bottom-up rows, BGR, 4-byte stride) in
   * batched `mapPartitions` — for the BI_RGB profile this IS a complete
   * decoder; no codec library exists or is needed. Emits recovered
   * dimensions, frame count, and exact per-channel pixel sums over all
   * frames. Dropped (not crashed): non-RIFF/truncated blobs, non-video
   * streams, and compressed formats (biCompression != 0 or bit depth
   * != 24) — the crawl posture for a partially-corrupt binary column.
   */
  def decodeAvis(vids: Dataset[VideoRow], batchSize: Int = 64): Dataset[VideoStats] = {
    implicit val enc = Encoders.product[VideoStats]
    vids.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { row =>
          try decodeOneAvi(row.media_id, row.avi).map(_.stats)
          catch { case scala.util.control.NonFatal(_) => None }
        }
      }
    }
  }

  /** [[decodeAvis]] at per-FRAME grain: same demux + decode, emitting
    * one row of exact channel sums per frame (frame index = movi chunk
    * order, the container's temporal order). Input corruption posture
    * is identical — undecodable blobs drop, they don't crash. */
  def decodeAviFrames(vids: Dataset[VideoRow],
      batchSize: Int = 64): Dataset[VideoFrameStats] = {
    implicit val enc = Encoders.product[VideoFrameStats]
    vids.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { row =>
          try decodeOneAvi(row.media_id, row.avi).toSeq.flatMap(_.frames)
          catch { case scala.util.control.NonFatal(_) => Nil }
        }
      }
    }
  }

  /** Decoded whole-video stats plus the per-frame grain both public
    * entry points project from. */
  private final case class DecodedAvi(stats: VideoStats,
      frames: Seq[VideoFrameStats])

  private def decodeOneAvi(id: Long, b: Array[Byte]): Option[DecodedAvi] = {
    if (b.length < 12 || fccAt(b, 0) != "RIFF" || fccAt(b, 8) != "AVI ") return None
    var width = -1; var height = -1; var bitCount = -1; var compression = -1L
    var isVideo = false
    var sr = 0L; var sg = 0L; var sb = 0L; var frames = 0
    val perFrame = Seq.newBuilder[VideoFrameStats]
    // walk chunks of [start, end); `inStreamList` tracks hdrl/strl scope
    def walk(start: Int, end: Int): Unit = {
      var o = start
      while (o + 8 <= end) {
        val cid = fccAt(b, o)
        val size = leU32(b, o + 4).toInt
        val body = o + 8
        if (body + size > end) return // truncated chunk: stop, blob may still drop
        cid match {
          case "LIST" =>
            // recurse past the list-type fourcc; hdrl/strl yield strh/strf,
            // movi yields the '##db' frame chunks
            walk(body + 4, body + size)
          case "strh" =>
            isVideo = fccAt(b, body) == "vids"
          case "strf" if isVideo && size >= 40 =>
            width = leU32(b, body + 4).toInt
            height = leU32(b, body + 8).toInt
            bitCount = leU16(b, body + 14)
            compression = leU32(b, body + 16)
          case c if c.length == 4 && (c.endsWith("db") || c.endsWith("dc")) =>
            // a movi frame chunk; decodable only for the BI_RGB profile
            if (width > 0 && height > 0 && bitCount == 24 && compression == 0L) {
              val stride = (width * 3 + 3) / 4 * 4
              if (size >= stride * height) {
                var fr = 0L; var fg = 0L; var fb = 0L
                var y = 0
                while (y < height) {
                  val rowOff = body + (height - 1 - y) * stride
                  var x = 0
                  while (x < width) {
                    fb += b(rowOff + 3 * x) & 0xff
                    fg += b(rowOff + 3 * x + 1) & 0xff
                    fr += b(rowOff + 3 * x + 2) & 0xff
                    x += 1
                  }
                  y += 1
                }
                // perceptual aHash of this frame: 4×4 gray block means
                // over the grid-aligned crop (bw/bh floor), the
                // imageAHash bit rule — integer end to end
                val grid = 4
                val bw = width / grid
                val bh = height / grid
                var fhash = 0L
                if (bw > 0 && bh > 0) {
                  val ms = new Array[Long](grid * grid)
                  var bi = 0
                  while (bi < grid * grid) {
                    val gx = bi % grid
                    val gy = bi / grid
                    var s = 0L
                    var dy = 0
                    while (dy < bh) {
                      val yy = gy * bh + dy
                      val rowOff = body + (height - 1 - yy) * stride
                      var dx = 0
                      while (dx < bw) {
                        val xx = gx * bw + dx
                        val gr = ((b(rowOff + 3 * xx + 2) & 0xff) +
                          (b(rowOff + 3 * xx + 1) & 0xff) +
                          (b(rowOff + 3 * xx) & 0xff)) / 3
                        s += gr
                        dx += 1
                      }
                      dy += 1
                    }
                    ms(bi) = s / (bw * bh)
                    bi += 1
                  }
                  val mean = ms.sum / (grid * grid)
                  bi = 0
                  while (bi < ms.length) {
                    if (ms(bi) >= mean) fhash |= 1L << bi
                    bi += 1
                  }
                }
                perFrame += VideoFrameStats(id, frames, fr, fg, fb, fhash)
                sr += fr; sg += fg; sb += fb
                frames += 1
              }
            }
          case _ => // avih, idx1, unknown chunks: skip
        }
        o = body + size + (size & 1) // chunks are word-aligned
      }
    }
    walk(12, math.min(b.length, 8 + leU32(b, 4).toInt))
    if (width > 0 && height > 0 && bitCount == 24 && compression == 0L && frames > 0)
      Some(DecodedAvi(VideoStats(id, width, height, frames, sr, sg, sb),
        perFrame.result()))
    else None
  }

  /** Row-local perceptual SIGNATURE of one AVI blob: the distinct
    * per-frame aHashes ([[VideoFrameStats]]' rule), sorted and joined
    * — the video-grain content fingerprint mm13 sets against and the
    * streaming first-seen gate (`streaming/MediaStream`) keys on.
    * None for undecodable blobs (crawl posture). */
  private[graft] def aviSignature(id: Long, avi: Array[Byte]): Option[String] =
    (try decodeOneAvi(id, avi) catch { case scala.util.control.NonFatal(_) => None })
      .map(_.frames.map(_.ahash).distinct.sorted.mkString("-"))

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
