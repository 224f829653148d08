package graft.operators

import graft.core.Fingerprint.splitmix64
import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal (image/audio/video) columns as opaque binary payloads with
  * typed metadata, plus the batch operators a training-data pipeline needs:
  * decode, feature-extract, resize, frame-sample.
  *
  * The actual media codecs are NOT available in this container, so the
  * decode step is a STUB: payloads are deterministic fake encodings whose
  * 16-byte header carries (kind, width|sampleRate, height|channels, frames),
  * and `decodeHeader` stands in for the real decoder. Everything around the
  * stub — schema, binary column handling, mapPartitions batch shape,
  * partition-preserving execution — is real and tested, so swapping in a
  * JNI/ffmpeg decoder is a one-function change.
  */
object Multimodal {

  final case class MediaMeta(kind: String, width: Int, height: Int, frames: Int)
  final case class MediaBlob(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaDecoded(media_id: Long, kind: String, width: Int, height: Int,
                                frames: Int, n_bytes: Int)
  final case class MediaFeatures(media_id: Long, features: Array[Float])

  private final val Magic = 0x47.toByte // header marker of the fake encoding

  /** Deterministic fake "encoder": 16-byte header + splitmix-generated body
    * (width*height bytes per frame). Stand-in for real JPEG/WAV/MP4 bytes.
    */
  def fakeEncode(id: Long, kind: String, width: Int, height: Int, frames: Int): Array[Byte] = {
    val body = width * height * frames
    val out = new Array[Byte](16 + body)
    out(0) = Magic
    out(1) = kind.headOption.getOrElse('i').toByte
    writeInt(out, 2, width); writeInt(out, 6, height); writeInt(out, 10, frames)
    var i = 0
    var state = splitmix64(id * 7919 + width)
    while (i < body) {
      state = splitmix64(state)
      out(16 + i) = (state & 0xff).toByte
      i += 1
    }
    out
  }

  private def writeInt(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v >>> 24).toByte; a(off + 1) = (v >>> 16).toByte
    a(off + 2) = (v >>> 8).toByte; a(off + 3) = v.toByte
  }
  private def readInt(a: Array[Byte], off: Int): Int =
    ((a(off) & 0xff) << 24) | ((a(off + 1) & 0xff) << 16) | ((a(off + 2) & 0xff) << 8) | (a(off + 3) & 0xff)

  /** STUB decoder — replace with the real codec (e.g. javacv/ffmpeg) when
    * available. Parses the deterministic fake header.
    */
  def decodeHeader(payload: Array[Byte]): MediaMeta = {
    require(payload.length >= 16 && payload(0) == Magic, "not a fake-encoded media payload")
    val kind = payload(1).toChar match {
      case 'i' => "image"; case 'a' => "audio"; case 'v' => "video"; case c => c.toString
    }
    MediaMeta(kind, readInt(payload, 2), readInt(payload, 6), readInt(payload, 10))
  }

  /** Synthesize a deterministic media table: images/audio/video round-robin. */
  def synthesize(spark: SparkSession, n: Long, partitions: Int = 8): Dataset[MediaBlob] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val kind = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val w = 16 + (splitmix64(id) & 15L).toInt
      val h = if (kind == "audio") 1 else 16 + (splitmix64(id + 1) & 15L).toInt
      val f = if (kind == "video") 4 + (splitmix64(id + 2) & 3L).toInt else 1
      MediaBlob(id, kind, fakeEncode(id, kind, w, h, f))
    }
  }

  /** Decode metadata for every blob — mapPartitions keeps the batch shape
    * (one decoder instance per partition, like a Pandas-UDF batch).
    */
  def decode(blobs: Dataset[MediaBlob]): Dataset[MediaDecoded] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      // per-partition decoder setup would go here (codec contexts are not
      // serializable, so they must be constructed executor-side)
      it.map { b =>
        val m = decodeHeader(b.payload)
        MediaDecoded(b.media_id, m.kind, m.width, m.height, m.frames, b.payload.length)
      }
    }
  }

  /** Fixed-width feature vectors (16 bins): deterministic byte-histogram of
    * the decoded body — the stand-in for an embedding model forward pass.
    */
  def extractFeatures(blobs: Dataset[MediaBlob]): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.map { b =>
        val hist = new Array[Float](16)
        var i = 16
        while (i < b.payload.length) {
          hist((b.payload(i) & 0xff) >>> 4) += 1f
          i += 1
        }
        val n = math.max(1, b.payload.length - 16).toFloat
        var j = 0
        while (j < 16) { hist(j) /= n; j += 1 }
        MediaFeatures(b.media_id, hist)
      }
    }
  }

  /** Resize: re-encode at half resolution by 2x2 subsampling of each frame
    * (real implementation would go through the decoded pixel buffer).
    */
  def resizeHalf(blobs: Dataset[MediaBlob]): Dataset[MediaBlob] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.map { b =>
        val m = decodeHeader(b.payload)
        val nw = math.max(1, m.width / 2)
        val nh = math.max(1, m.height / 2)
        val out = new Array[Byte](16 + nw * nh * m.frames)
        System.arraycopy(b.payload, 0, out, 0, 16)
        writeInt(out, 2, nw); writeInt(out, 6, nh)
        var f = 0
        while (f < m.frames) {
          var y = 0
          while (y < nh) {
            var x = 0
            while (x < nw) {
              out(16 + (f * nh + y) * nw + x) =
                b.payload(16 + (f * m.height + y * 2) * m.width + x * 2)
              x += 1
            }
            y += 1
          }
          f += 1
        }
        b.copy(payload = out)
      }
    }
  }

  /** Frame sampling for video: keep every `stride`-th frame. */
  def sampleFrames(blobs: Dataset[MediaBlob], stride: Int): Dataset[MediaBlob] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.map { b =>
        val m = decodeHeader(b.payload)
        val kept = (0 until m.frames by stride).toArray
        val frameBytes = m.width * m.height
        val out = new Array[Byte](16 + kept.length * frameBytes)
        System.arraycopy(b.payload, 0, out, 0, 16)
        writeInt(out, 10, kept.length)
        kept.zipWithIndex.foreach { case (src, dst) =>
          System.arraycopy(b.payload, 16 + src * frameBytes, out, 16 + dst * frameBytes, frameBytes)
        }
        b.copy(payload = out)
      }
    }
  }
}
