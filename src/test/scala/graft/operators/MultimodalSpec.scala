package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("binary schema + decode plumbing round-trips deterministically") {
    val blobs = Multimodal.synthesize(spark, 90, partitions = 3)
    val schema = blobs.toDF().schema
    assert(schema("payload").dataType.typeName == "binary")
    val decoded = Multimodal.decode(blobs).collect()
    assert(decoded.length == 90)
    assert(decoded.count(_.kind == "image") == 30)
    assert(decoded.count(_.kind == "video") == 30)
    decoded.foreach { d =>
      assert(d.n_bytes == 16 + d.width * d.height * d.frames)
      assert(if (d.kind == "video") d.frames >= 4 else d.frames == 1)
    }
    // determinism: same ids -> same payloads
    val again = Multimodal.synthesize(spark, 90, partitions = 5).collect().sortBy(_.media_id)
    val first = blobs.collect().sortBy(_.media_id)
    assert(first.zip(again).forall { case (a, b) => java.util.Arrays.equals(a.payload, b.payload) })
  }

  test("feature extraction yields normalized fixed-width vectors") {
    val feats = Multimodal.extractFeatures(Multimodal.synthesize(spark, 30)).collect()
    assert(feats.forall(_.features.length == 16))
    feats.foreach { f =>
      val s = f.features.sum
      assert(math.abs(s - 1.0f) < 1e-3, s"histogram not normalized: $s")
    }
  }

  test("resize halves dimensions; frame sampling keeps every k-th frame") {
    val blobs = Multimodal.synthesize(spark, 30)
    val resized = Multimodal.decode(Multimodal.resizeHalf(blobs)).collect()
    val orig = Multimodal.decode(blobs).collect().map(d => d.media_id -> d).toMap
    resized.foreach { r =>
      val o = orig(r.media_id)
      assert(r.width == math.max(1, o.width / 2) && r.height == math.max(1, o.height / 2))
      assert(r.frames == o.frames)
    }
    val videos = blobs.filter(_.kind == "video")
    val sampled = Multimodal.decode(Multimodal.sampleFrames(videos, 2)).collect()
    val ov = Multimodal.decode(videos).collect().map(d => d.media_id -> d).toMap
    sampled.foreach { s =>
      assert(s.frames == (ov(s.media_id).frames + 1) / 2)
    }
  }

  test("mapPartitions preserves partitioning (no shuffle in the plan)") {
    val blobs = Multimodal.synthesize(spark, 64, partitions = 4)
    val plan = Multimodal.decode(blobs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(Multimodal.decode(blobs).rdd.getNumPartitions == 4)
  }
}
