package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The 8-field reference header shim reads files written in the reference's
  * save_on_disk layout and rejects this library's own (11-field) format.
  */
class ReferenceHeaderSpec extends AnyFunSuite {

  private def writeReferenceFile(q: Int, rem: Int, cnt: Int, elements: Long): String = {
    val words = (1L << q) * (3L + rem) / 64L
    val bb = java.nio.ByteBuffer.allocate((8 + words.toInt) * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Seq(q.toLong, rem.toLong, cnt.toLong, 32L, 19L,
      (1L << q) * 95 / 100, (1L << q) / 64, elements).foreach(bb.putLong)
    (0L until words).foreach(_ => bb.putLong(0L))
    val f = java.nio.file.Files.createTempFile("ref_sketch", ".bqf")
    java.nio.file.Files.write(f, bb.array())
    f.toString
  }

  test("parses a reference-format sketch header") {
    val path = writeReferenceFile(q = 10, rem = 59, cnt = 5, elements = 123)
    val h = BackpackFilter.readReferenceHeader(path)
    assert(h.quotientSize == 10 && h.remainderSize == 59 && h.countSize == 5)
    assert(h.kmerSize == 32 && h.smerSize == 19 && h.elementsInside == 123)
    assert(h.tableWords == (1L << 10) * 62 / 64)
  }

  test("rejects this library's own 11-field format") {
    val f = BackpackFilter(10, 8, 48, CountMode.Exact, 8, 2, 0L)
    f.add(42L)
    val path = java.nio.file.Files.createTempFile("own_sketch", ".bqf").toString
    BackpackFilter.saveToFile(f, path)
    assertThrows[IllegalArgumentException](BackpackFilter.readReferenceHeader(path))
  }

  test("rejects truncated files") {
    val path = java.nio.file.Files.createTempFile("short", ".bqf")
    java.nio.file.Files.write(path, new Array[Byte](32))
    assertThrows[IllegalArgumentException](BackpackFilter.readReferenceHeader(path.toString))
  }
}
