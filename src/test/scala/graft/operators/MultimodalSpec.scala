package graft.operators

import graft.SparkTestSession
import graft.operators.MediaCodecs._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def img(w: Int, h: Int, seed: Int): Image = {
    val rnd = new scala.util.Random(seed)
    Image(w, h, Array.fill(3 * w * h)(rnd.nextInt().toByte))
  }

  test("PPM/BMP/WAV codecs round-trip bit-exactly") {
    for (i <- Seq(img(1, 1, 1), img(17, 9, 2), img(32, 32, 3))) {
      val p = decodePpm(encodePpm(i))
      assert(p.width == i.width && p.height == i.height && p.rgb.sameElements(i.rgb), "ppm")
      val b = decodeBmp(encodeBmp(i))
      assert(b.width == i.width && b.height == i.height && b.rgb.sameElements(i.rgb), "bmp")
    }
    val rnd = new scala.util.Random(5)
    for (ch <- Seq(1, 2)) {
      val a = Audio(16000, ch, Array.fill(1000 * ch)(rnd.nextInt().toShort))
      val d = decodeWav(encodeWav(a))
      assert(d.sampleRate == 16000 && d.channels == ch && d.samples.sameElements(a.samples))
    }
    val frames = Seq(img(8, 6, 7), img(8, 6, 8), img(8, 6, 9))
    val ds = decodePpmStream(encodePpmStream(frames))
    assert(ds.length == 3 && ds.zip(frames).forall { case (a, b) => a.rgb.sameElements(b.rgb) })
  }

  test("scalarFeatures: exact-integer features agree with an independent decode") {
    import spark.implicits._
    val blobs = Multimodal.synthesize(spark, 24, partitions = 2)
    val feats = Multimodal.scalarFeatures(blobs).collect().map(f => f.media_id -> f).toMap
    assert(feats.size == 24)
    blobs.collect().foreach { b =>
      val f = feats(b.media_id)
      assert(f.n_bytes == b.payload.length, s"n_bytes mismatch for ${b.media_id}")
      sniff(b.payload) match {
        case "ppm" =>
          val frames = decodePpmStream(b.payload)
          assert(f.frames == frames.length && f.width == frames.head.width &&
            f.height == frames.head.height)
          assert(f.kind == (if (frames.length > 1) "video" else "image") && f.container == "ppm")
          val sum = frames.iterator.flatMap(_.rgb.iterator).map(_ & 0xff).map(_.toLong).sum
          val n = frames.iterator.map(_.rgb.length.toLong).sum
          assert(f.content_sum == sum && f.content_n == n && f.duration_us == 0L)
        case "bmp" =>
          val i = decodeBmp(b.payload)
          assert(f.kind == "image" && f.container == "bmp" && f.frames == 1L)
          assert(f.content_sum == i.rgb.iterator.map(_ & 0xff).map(_.toLong).sum)
          assert(f.content_n == i.rgb.length.toLong)
        case "wav" =>
          val a = decodeWav(b.payload)
          assert(f.kind == "audio" && f.container == "wav")
          assert(f.width == a.sampleRate && f.height == a.channels &&
            f.frames == a.samples.length / a.channels)
          assert(f.content_sum == a.samples.iterator.map(_.toLong).sum)
          assert(f.duration_us ==
            (a.samples.length / a.channels) * 1000000L / a.sampleRate)
      }
    }
  }

  test("malformed payloads fail fast with IllegalArgumentException, never hang") {
    // WAV chunk with size = -8 used to leave the chunk-walk offset unchanged
    // (infinite loop in the executor); now it must throw promptly
    val wav = encodeWav(Audio(8000, 1, Array.fill(64)(1.toShort)))
    val negChunk = wav.clone()
    // corrupt the fmt chunk size at offset 16 to -8 (LE)
    negChunk(16) = 0xf8.toByte; negChunk(17) = 0xff.toByte
    negChunk(18) = 0xff.toByte; negChunk(19) = 0xff.toByte
    val e1 = intercept[IllegalArgumentException](decodeWav(negChunk))
    assert(e1.getMessage.contains("chunk size"))
    // oversized chunk size walks past the payload: also a clean failure
    val bigChunk = wav.clone()
    bigChunk(16) = 0xff.toByte; bigChunk(17) = 0xff.toByte
    bigChunk(18) = 0xff.toByte; bigChunk(19) = 0x7f.toByte
    intercept[IllegalArgumentException](decodeWav(bigChunk))

    // BMP with huge dims used to overflow rowBytes*h in Int and pass the
    // truncation check; now the size math is Long + dims are bounded
    val bmp = encodeBmp(img(4, 4, 21))
    val hugeH = bmp.clone()
    hugeH(22) = 0xff.toByte; hugeH(23) = 0xff.toByte // h = large positive
    hugeH(24) = 0xff.toByte; hugeH(25) = 0x7f.toByte
    intercept[IllegalArgumentException](decodeBmp(hugeH))
    val overflowDims = bmp.clone()
    // w*3*h chosen to overflow Int but be > 0: w = 2^18, h = 2^13 would pass
    // the old Int check; the 2^20 bound rejects nothing here, the Long math does
    overflowDims(18) = 0; overflowDims(19) = 0; overflowDims(20) = 4; overflowDims(21) = 0 // w = 2^18
    overflowDims(22) = 0; overflowDims(23) = 0x20.toByte; overflowDims(24) = 0; overflowDims(25) = 0 // h = 2^13
    intercept[IllegalArgumentException](decodeBmp(overflowDims))

    // PPM dims beyond the plausibility bound: clean dimensions error
    val hugePpm = "P6\n2000000 2\n255\n".getBytes("US-ASCII") ++ Array.fill(16)(0.toByte)
    val e3 = intercept[IllegalArgumentException](decodePpm(hugePpm))
    assert(e3.getMessage.contains("dimensions"))
    // dims whose product overflows Int but pass the per-axis bound: the
    // Long-math truncation check must catch them (not wrap negative)
    val ovPpm = "P6\n1000000 1000000\n255\n".getBytes("US-ASCII") ++ Array.fill(16)(0.toByte)
    val e4 = intercept[IllegalArgumentException](decodePpm(ovPpm))
    assert(e4.getMessage.contains("truncated"))
    val zeroPpm = "P6\n0 5\n255\n".getBytes("US-ASCII")
    intercept[IllegalArgumentException](decodePpm(zeroPpm))
  }

  test("PPM parser handles comments and multi-digit dims") {
    val i = img(123, 45, 11)
    val withComment = ("P6\n# a comment line\n123 45\n255\n").getBytes("US-ASCII") ++ i.rgb
    val d = decodePpm(withComment)
    assert(d.width == 123 && d.height == 45 && d.rgb.sameElements(i.rgb))
  }

  test("binary schema + decode plumbing over real containers") {
    val blobs = Multimodal.synthesize(spark, 80, partitions = 4)
    assert(blobs.toDF().schema("payload").dataType.typeName == "binary")
    val decoded = Multimodal.decode(blobs).collect()
    assert(decoded.length == 80)
    assert(decoded.count(_.kind == "image") == 40) // ppm + bmp
    assert(decoded.count(_.kind == "audio") == 20)
    assert(decoded.count(_.kind == "video") == 20)
    assert(decoded.filter(_.kind == "image").map(_.container).toSet == Set("ppm", "bmp"))
    decoded.foreach { d =>
      d.kind match {
        case "audio" => assert(d.width >= 8000 && d.height == 1 && d.frames == 2048)
        case "video" => assert(d.container == "ppm" && d.frames >= 4)
        case _ => assert(d.frames == 1 && d.width >= 16 && d.height >= 16)
      }
    }
    // determinism across partitioning
    val again = Multimodal.synthesize(spark, 80, partitions = 7).collect().sortBy(_.media_id)
    val first = blobs.collect().sortBy(_.media_id)
    assert(first.zip(again).forall { case (a, b) => java.util.Arrays.equals(a.payload, b.payload) })
  }

  test("feature extraction: normalized 16-bin histograms of decoded content") {
    val feats = Multimodal.extractFeatures(Multimodal.synthesize(spark, 24)).collect()
    assert(feats.length == 24 && feats.forall(_.features.length == 16))
    feats.foreach { f =>
      val s = f.features.sum
      assert(math.abs(s - 1.0f) < 1e-3, s"histogram not normalized: $s")
    }
  }

  test("resize halves pixel dims (2x2 box filter) and audio sample rate") {
    val blobs = Multimodal.synthesize(spark, 24, partitions = 2)
    val orig = Multimodal.decode(blobs).collect().map(d => d.media_id -> d).toMap
    val resized = Multimodal.decode(Multimodal.resizeHalf(blobs)).collect()
    resized.foreach { r =>
      val o = orig(r.media_id)
      r.kind match {
        case "audio" =>
          assert(r.width == o.width / 2 && r.frames == o.frames / 2)
        case _ =>
          assert(r.width == math.max(1, o.width / 2) && r.height == math.max(1, o.height / 2))
          assert(r.frames == o.frames)
          assert(r.container == o.container, "resize must re-encode in the same container")
      }
    }
    // box-filter ground truth on a hand-built 2x2 single-channel-checkable image
    val i = Image(2, 2, Array[Byte](
      10, 0, 0, 20, 0, 0,
      30, 0, 0, 40, 0, 0))
    val half = decodePpm(
      Multimodal.resizeHalf(spark.createDataset(Seq(Multimodal.MediaBlob(0, "image", encodePpm(i))))(
        org.apache.spark.sql.Encoders.product[Multimodal.MediaBlob])).collect()(0).payload)
    assert(half.width == 1 && half.height == 1)
    assert((half.rgb(0) & 0xff) == 25) // (10+20+30+40)/4
  }

  test("frame sampling keeps every k-th PPM frame, passes others through") {
    val blobs = Multimodal.synthesize(spark, 24, partitions = 2)
    val orig = Multimodal.decode(blobs).collect().map(d => d.media_id -> d).toMap
    val sampled = Multimodal.decode(Multimodal.sampleFrames(blobs, 2)).collect()
    sampled.foreach { s =>
      val o = orig(s.media_id)
      if (o.kind == "video") assert(s.frames == (o.frames + 1) / 2)
      else assert(s.frames == o.frames)
    }
  }

  test("mapPartitions preserves partitioning (no shuffle in the plan)") {
    val blobs = Multimodal.synthesize(spark, 64, partitions = 4)
    val plan = Multimodal.decode(blobs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(Multimodal.decode(blobs).rdd.getNumPartitions == 4)
  }
}
