package graft.operators

import graft.core.Fingerprint.splitmix64
import graft.operators.MediaCodecs._
import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal (image/audio/video) columns as opaque binary payloads, plus
  * the batch operators a training-data pipeline needs: decode,
  * feature-extract, resize, frame-sample.
  *
  * Since round 3 the payloads are REAL public formats parsed by real
  * decoders ([[MediaCodecs]]): PPM (Netpbm P6) and BMP (24bpp DIB) images,
  * WAV (RIFF PCM16) audio, and PPM streams (concatenated P6 frames — the
  * ffmpeg image2pipe convention) for video. No fake encoding remains: every
  * operator below decodes genuine bytes, works in pixel/sample space, and
  * re-encodes. The Spark shape is the scale story: payloads stay opaque
  * binary columns, operators are partition-preserving mapPartitions batches
  * (one decoder context per partition — the same layout a JNI/ffmpeg decoder
  * would need), and nothing routes through the driver.
  */
object Multimodal {

  final case class MediaBlob(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded metadata: for images/video (width, height) are pixels and
    * `frames` counts P6 frames; for audio width=sampleRate, height=channels,
    * frames=samples per channel.
    */
  final case class MediaDecoded(media_id: Long, kind: String, container: String,
                                width: Int, height: Int, frames: Int, n_bytes: Int)
  final case class MediaFeatures(media_id: Long, features: Array[Float])

  // =====================================================================
  // synthesis (deterministic test corpus through the REAL encoders)
  // =====================================================================

  /** COUNTER-BASED byte stream (out(i) = splitmix64(seed + i), not a
    * sequentially-chained state): each byte is a closed-form function of
    * (id, n, i), so an external oracle — the driver's DuckDB correctness
    * gate for q36 — can recompute any byte independently in SQL, and the
    * generation itself is embarrassingly parallel. Seeds are spaced by 7919
    * per id while i < 3·31·31 < 7919, so streams never overlap.
    */
  private def pix(id: Long, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    val seed = id * 7919 + n
    var i = 0
    while (i < n) {
      out(i) = (splitmix64(seed + i) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Deterministic media table: ppm image / bmp image / wav audio / ppm-stream
    * video round-robin, all built with the real encoders.
    */
  def synthesize(spark: SparkSession, n: Long, partitions: Int = 8): Dataset[MediaBlob] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val w = 16 + (splitmix64(id) & 15L).toInt
      val h = 16 + (splitmix64(id + 1) & 15L).toInt
      (id % 4) match {
        case 0 => MediaBlob(id, "image", encodePpm(Image(w, h, pix(id, 3 * w * h))))
        case 1 => MediaBlob(id, "image", encodeBmp(Image(w, h, pix(id, 3 * w * h))))
        case 2 =>
          val sr = 8000 + 4000 * (splitmix64(id + 2) & 1L).toInt
          val samples = pix(id, 2048).map(b => (b * 128).toShort)
          MediaBlob(id, "audio", encodeWav(Audio(sr, 1, samples)))
        case _ =>
          val nf = 4 + (splitmix64(id + 2) & 3L).toInt
          val frames = (0 until nf).map(f => Image(w, h, pix(id * 31 + f, 3 * w * h)))
          MediaBlob(id, "video", encodePpmStream(frames))
      }
    }
  }

  // =====================================================================
  // operators (partition-preserving batches over real decodes)
  // =====================================================================

  /** Decode metadata for every blob — mapPartitions keeps the batch shape
    * (one decoder instance per partition, like a Pandas-UDF batch).
    */
  def decode(blobs: Dataset[MediaBlob]): Dataset[MediaDecoded] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.map { b =>
        sniff(b.payload) match {
          case "ppm" =>
            val frames = decodePpmStream(b.payload)
            val kind = if (frames.length > 1) "video" else "image"
            MediaDecoded(b.media_id, kind, "ppm",
              frames.head.width, frames.head.height, frames.length, b.payload.length)
          case "bmp" =>
            val img = decodeBmp(b.payload)
            MediaDecoded(b.media_id, "image", "bmp", img.width, img.height, 1, b.payload.length)
          case "wav" =>
            val a = decodeWav(b.payload)
            MediaDecoded(b.media_id, "audio", "wav",
              a.sampleRate, a.channels, a.samples.length / a.channels, b.payload.length)
        }
      }
    }
  }

  /** Fixed-width feature vectors (16 bins): normalized histogram over the
    * DECODED content (pixel bytes / 16-bit sample magnitudes) — the
    * deterministic stand-in for an embedding model forward pass, now fed by
    * real decodes rather than raw container bytes.
    */
  def extractFeatures(blobs: Dataset[MediaBlob]): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.map { b =>
        val hist = new Array[Float](16)
        var n = 0
        sniff(b.payload) match {
          case "ppm" =>
            decodePpmStream(b.payload).foreach { img =>
              var i = 0
              while (i < img.rgb.length) { hist((img.rgb(i) & 0xff) >>> 4) += 1f; i += 1 }
              n += img.rgb.length
            }
          case "bmp" =>
            val img = decodeBmp(b.payload)
            var i = 0
            while (i < img.rgb.length) { hist((img.rgb(i) & 0xff) >>> 4) += 1f; i += 1 }
            n = img.rgb.length
          case "wav" =>
            val a = decodeWav(b.payload)
            var i = 0
            while (i < a.samples.length) {
              hist(((a.samples(i) & 0xffff) >>> 12) & 15) += 1f
              i += 1
            }
            n = a.samples.length
        }
        val d = math.max(1, n).toFloat
        var j = 0
        while (j < 16) { hist(j) /= d; j += 1 }
        MediaFeatures(b.media_id, hist)
      }
    }
  }

  /** Exact-integer per-blob scalar features over REAL decodes — the
    * hash-stable face of the multimodal pipeline (q36): every column is an
    * integer or string, so a DuckDB oracle recomputing the same values from
    * the synthesis formula matches bit-for-bit (no float tolerance games).
    *
    *  - width/height: pixels for images/video; (sampleRate, channels) for
    *    audio — the same convention as [[MediaDecoded]]
    *  - frames: P6 frame count / 1 for stills / samples-per-channel for audio
    *  - n_bytes: container payload size (proves the encoder byte layout)
    *  - content_sum / content_n: sum and count over the DECODED content —
    *    unsigned pixel bytes for images/video, signed 16-bit samples for
    *    audio (proves the decode path, not just the header walk)
    *  - duration_us: samples * 1e6 / sampleRate for audio, 0 otherwise
    */
  final case class MediaScalars(media_id: Long, kind: String, container: String,
                                width: Long, height: Long, frames: Long, n_bytes: Long,
                                content_sum: Long, content_n: Long, duration_us: Long)

  def scalarFeatures(blobs: Dataset[MediaBlob]): Dataset[MediaScalars] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.map { b =>
        sniff(b.payload) match {
          case "ppm" =>
            val frames = decodePpmStream(b.payload)
            var sum = 0L; var n = 0L
            frames.foreach { img =>
              var i = 0
              while (i < img.rgb.length) { sum += (img.rgb(i) & 0xff); i += 1 }
              n += img.rgb.length
            }
            MediaScalars(b.media_id, if (frames.length > 1) "video" else "image", "ppm",
              frames.head.width, frames.head.height, frames.length, b.payload.length,
              sum, n, 0L)
          case "bmp" =>
            val img = decodeBmp(b.payload)
            var sum = 0L
            var i = 0
            while (i < img.rgb.length) { sum += (img.rgb(i) & 0xff); i += 1 }
            MediaScalars(b.media_id, "image", "bmp", img.width, img.height, 1L,
              b.payload.length, sum, img.rgb.length, 0L)
          case "wav" =>
            val a = decodeWav(b.payload)
            var sum = 0L
            var i = 0
            while (i < a.samples.length) { sum += a.samples(i); i += 1 }
            val perChannel = a.samples.length / a.channels
            MediaScalars(b.media_id, "audio", "wav", a.sampleRate, a.channels,
              perChannel, b.payload.length, sum, a.samples.length,
              perChannel * 1000000L / a.sampleRate)
        }
      }
    }
  }

  /** 2x2 box-filter downscale of one frame (channel-wise average). */
  private def halveFrame(img: Image): Image = {
    val nw = math.max(1, img.width / 2)
    val nh = math.max(1, img.height / 2)
    val out = new Array[Byte](3 * nw * nh)
    var y = 0
    while (y < nh) {
      var x = 0
      while (x < nw) {
        var c = 0
        while (c < 3) {
          val x2 = math.min(2 * x + 1, img.width - 1)
          val y2 = math.min(2 * y + 1, img.height - 1)
          val s = (img.rgb(3 * (2 * y * img.width + 2 * x) + c) & 0xff) +
            (img.rgb(3 * (2 * y * img.width + x2) + c) & 0xff) +
            (img.rgb(3 * (y2 * img.width + 2 * x) + c) & 0xff) +
            (img.rgb(3 * (y2 * img.width + x2) + c) & 0xff)
          out(3 * (y * nw + x) + c) = (s / 4).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Image(nw, nh, out)
  }

  /** Resize: true pixel-space 2x2 box filter per frame, re-encoded in the
    * same container; audio downsamples by 2 (pairwise average, half the
    * sample rate).
    */
  def resizeHalf(blobs: Dataset[MediaBlob]): Dataset[MediaBlob] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.map { b =>
        val out = sniff(b.payload) match {
          case "ppm" => encodePpmStream(decodePpmStream(b.payload).map(halveFrame))
          case "bmp" => encodeBmp(halveFrame(decodeBmp(b.payload)))
          case "wav" =>
            val a = decodeWav(b.payload)
            val frames = a.samples.length / a.channels
            val ns = new Array[Short]((frames / 2) * a.channels)
            var f = 0
            while (f < frames / 2) {
              var c = 0
              while (c < a.channels) {
                val s1 = a.samples((2 * f) * a.channels + c)
                val s2 = a.samples((2 * f + 1) * a.channels + c)
                ns(f * a.channels + c) = ((s1 + s2) / 2).toShort
                c += 1
              }
              f += 1
            }
            encodeWav(Audio(a.sampleRate / 2, a.channels, ns))
        }
        b.copy(payload = out)
      }
    }
  }

  /** Frame sampling for PPM-stream video: keep every `stride`-th frame.
    * Non-video payloads pass through unchanged.
    */
  def sampleFrames(blobs: Dataset[MediaBlob], stride: Int): Dataset[MediaBlob] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.map { b =>
        if (sniff(b.payload) != "ppm") b
        else {
          val frames = decodePpmStream(b.payload)
          if (frames.length <= 1) b
          else b.copy(payload = encodePpmStream(
            frames.indices.collect { case i if i % stride == 0 => frames(i) }))
        }
      }
    }
  }
}
