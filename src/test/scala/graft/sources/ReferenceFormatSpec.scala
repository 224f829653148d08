package graft.sources

import graft.core.Bits
import org.scalatest.funsuite.AnyFunSuite

/** On-disk interop against GOLDEN FIXTURES WRITTEN BY THE COMPILED
  * REFERENCE BINARY (src/test/resources/reference_interop/generator.cpp —
  * built against /root/reference/src and run once; its outputs are
  * committed):
  *
  *  - golden.bqf: a Bqf_ec(q=10, c=5, k=12, z=4) saved with save_on_disk
  *    (abstract_bqf.cpp:512-529)
  *  - golden_counted.tsv: the (smer, count) inserts that built it
  *  - golden_enum.tsv: the reference's own enumerate() over it
  *  - golden_queries.tsv: the reference's query(seq) results (min, max,
  *    average, presence ratio) for 25 sequences
  */
class ReferenceFormatSpec extends AnyFunSuite {

  private def resource(name: String): java.io.InputStream = {
    val in = getClass.getResourceAsStream(s"/reference_interop/$name")
    require(in != null, s"missing test resource $name")
    in
  }
  private def lines(name: String): Vector[String] =
    scala.io.Source.fromInputStream(resource(name)).getLines().toVector

  private lazy val filterFile: String = {
    val tmp = java.nio.file.Files.createTempFile("golden", ".bqf")
    java.nio.file.Files.copy(resource("golden.bqf"), tmp,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    tmp.toString
  }

  test("header parses and the file is recognized as reference-format") {
    assert(ReferenceFormat.isReferenceFile(filterFile))
    val h = graft.core.BackpackFilter.readReferenceHeader(filterFile)
    assert(h.quotientSize == 10 && h.countSize == 5 && h.kmerSize == 12 && h.smerSize == 8)
    assert(h.remainderSize == 2 * 8 - 10 + 5) // hash - q + c (bqf_ec.cpp:12)
  }

  test("enumerate matches the reference's own enumerate() exactly") {
    val want = lines("golden_enum.tsv").map { l =>
      val Array(h, c) = l.split("\t"); (h.toLong, c.toLong)
    }.toMap
    val got = ReferenceFormat.load(filterFile).entries().toMap
    assert(got.size == want.size, s"${got.size} entries vs ${want.size}")
    assert(got == want)
  }

  test("hash chain reproduces the inserted smers' hashes (counted dump replay)") {
    // golden_counted.tsv inserts may repeat a canonical smer (adding
    // saturating at 2^5-1) — replay the adds and compare against enumerate
    val cMax = (1L << 5) - 1
    val replayed = scala.collection.mutable.Map.empty[Long, Long]
    lines("golden_counted.tsv").foreach { l =>
      val Array(s, c) = l.split("\t")
      val h = DnaDomain.smerHash(s, 8)
      replayed(h) = math.min(replayed.getOrElse(h, 0L) + c.toLong, cMax)
    }
    val got = ReferenceFormat.load(filterFile).entries().toMap
    assert(got == replayed.toMap)
  }

  test("bfc_hash_64 inverse round-trips") {
    val mask = Bits.maskRight(16)
    (0L until 65536L).foreach { x =>
      assert(DnaDomain.bfcHash64Inv(DnaDomain.bfcHash64(x, mask), mask) == x)
    }
    val mask56 = Bits.maskRight(56)
    val rng = new scala.util.Random(7)
    (1 to 1000).foreach { _ =>
      val x = rng.nextLong() & mask56
      assert(DnaDomain.bfcHash64Inv(DnaDomain.bfcHash64(x, mask56), mask56) == x)
    }
  }

  test("revcomp64/canonical: revcomp is an involution and canonical is strand-invariant") {
    val rng = new scala.util.Random(11)
    (1 to 2000).foreach { _ =>
      val bits = 2 * (4 + rng.nextInt(25)) // s in 4..28
      val x = rng.nextLong() & Bits.maskRight(bits)
      val rc = DnaDomain.revcomp64(x, bits)
      assert(DnaDomain.revcomp64(rc, bits) == x, s"revcomp not involutive at $bits bits")
      assert(DnaDomain.canonical(x, bits) == DnaDomain.canonical(rc, bits))
    }
    // known value: revcomp(ACGT) = ACGT (own reverse complement)
    val acgt = "ACGT".map(DnaDomain.nuclEncode).foldLeft(0L)((a, b) => (a << 2) | b)
    assert(DnaDomain.revcomp64(acgt, 8) == acgt)
  }

  test("export: save() is byte-identical to the reference's own save_on_disk") {
    val want = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(filterFile))
    // (a) migration round-trip: import the reference-written file, rebuild,
    // export — byte-for-byte the file the compiled C++ binary wrote
    val rt = java.nio.file.Files.createTempFile("export_rt", ".bqf").toString
    ReferenceFormat.save(ReferenceFormat.load(filterFile).toBackpackFilter, rt)
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(rt)), want),
      "round-trip export differs from the reference-written bytes")
    // (b) stronger: a filter built entirely through OUR insert path from the
    // counted dump (never touching the golden bytes) exports byte-identical
    // too — the insert layout is canonical, matching the reference's.
    // Cross-checked once outside sbt: the compiled reference binary
    // load_from_disk's this exported file and reproduces golden_queries.tsv
    // bit-for-bit (src/test/resources/reference_interop/verifier.cpp).
    val bf = new graft.core.BackpackFilter(
      10, 5, 16, graft.core.CountMode.Exact, 12, 4, 0L)
    lines("golden_counted.tsv").foreach { l =>
      val Array(s, c) = l.split("\t")
      bf.add(DnaDomain.smerHash(s, 8), c.toLong)
    }
    val own = java.nio.file.Files.createTempFile("export_own", ".bqf").toString
    ReferenceFormat.save(bf, own)
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(own)), want),
      "insert-path export differs from the reference-written bytes")
  }

  test("export refuses token-domain and OOM filters with a clear message") {
    // token-domain: hashBits != 2*s — XXH64 fingerprints would load in the
    // C++ tooling but answer garbage to its nucleotide query chain
    val tok = new graft.core.BackpackFilter(
      10, 5, 48, graft.core.CountMode.Exact, 8, 2, 0L)
    val e1 = intercept[IllegalArgumentException] {
      ReferenceFormat.save(tok, java.nio.file.Files.createTempFile("x", ".bqf").toString)
    }
    assert(e1.getMessage.contains("DNA-domain"))
    val oom = new graft.core.BackpackFilter(
      10, 5, 16, graft.core.CountMode.OrderOfMagnitude, 12, 4, 0L)
    val e2 = intercept[IllegalArgumentException] {
      ReferenceFormat.save(oom, java.nio.file.Files.createTempFile("x", ".bqf").toString)
    }
    assert(e2.getMessage.contains("OOM"))
  }

  test("decodeSmerCanonical inverts smerHash for every golden entry (ADVICE r6)") {
    // the enumerate dump's smer column must re-hash to its fingerprint, so a
    // rebuild-from-dump reproduces the original index's answers
    ReferenceFormat.load(filterFile).entries().foreach { case (fp, _) =>
      val smer = DnaDomain.decodeSmerCanonical(fp, 8)
      assert(DnaDomain.smerHash(smer, 8) == fp,
        s"decoded smer $smer does not re-hash to $fp")
      // and the decode is the canonical representative (idempotent)
      assert(DnaDomain.decodeSmerCanonical(DnaDomain.smerHash(smer, 8), 8) == smer)
    }
  }

  test("sequence queries match the reference's query() output bit-for-bit") {
    val f = ReferenceFormat.load(filterFile)
    val bf = f.toBackpackFilter
    val k = f.header.kmerSize
    val s = f.header.smerSize
    lines("golden_queries.tsv").foreach { l =>
      val parts = l.split("\t")
      val (seq, wMin, wMax, wAvg, wRatio) =
        (parts(0), parts(1).toLong, parts(2).toLong, parts(3).toFloat, parts(4).toFloat)
      val (gMin, gMax, gAvg, gRatio) =
        DnaDomain.querySequence(seq, k, s, bf.abundance)
      assert(gMin == wMin && gMax == wMax, s"$seq: min/max $gMin/$gMax want $wMin/$wMax")
      // the reference prints floats with 6 significant digits; compare at
      // that precision (the underlying values are exact integer ratios)
      assert(math.abs(gAvg - wAvg) <= math.max(1e-5f * math.abs(wAvg), 1e-6f),
        s"$seq: avg $gAvg want $wAvg")
      assert(math.abs(gRatio - wRatio) <= 1e-5f, s"$seq: ratio $gRatio want $wRatio")
    }
  }
}
