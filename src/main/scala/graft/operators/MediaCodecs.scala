package graft.operators

/** Real decoders/encoders for three public header+raw media formats — no
  * external libraries needed, so the multimodal operators run on genuine
  * bytes in this offline container:
  *
  *  - PPM (Netpbm P6): ASCII header `P6 <w> <h> <maxval>` + raw RGB triplets.
  *    A VIDEO payload is a PPM STREAM — concatenated P6 frames, the
  *    image2pipe convention ffmpeg reads/writes.
  *  - BMP (Windows DIB, 24bpp uncompressed): 14-byte file header + 40-byte
  *    BITMAPINFOHEADER + bottom-up BGR rows padded to 4 bytes.
  *  - WAV (RIFF PCM, 16-bit LE): RIFF/WAVE + fmt + data chunks.
  *
  * Every decode is a total function over the payload bytes (throws on
  * malformed input); encode(decode(x)) round-trips bit-exactly for payloads
  * produced by these encoders.
  */
object MediaCodecs {

  final case class Image(width: Int, height: Int, rgb: Array[Byte]) {
    require(rgb.length == 3 * width * height, s"rgb length ${rgb.length} != 3*$width*$height")
  }
  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short])

  // =====================================================================
  // PPM (P6) + PPM stream
  // =====================================================================

  def encodePpm(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  /** Decode one P6 frame starting at `off`; returns (image, offset after). */
  def decodePpmAt(bytes: Array[Byte], off: Int): (Image, Int) = {
    var i = off
    def skipWs(): Unit = {
      var in = true
      while (in && i < bytes.length) {
        val c = bytes(i)
        if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 } // comment to EOL
        else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') i += 1
        else in = false
      }
    }
    def int(): Int = {
      skipWs()
      var v = 0
      var any = false
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1; any = true
      }
      require(any, s"PPM: expected integer at offset $i")
      v
    }
    require(bytes.length - off >= 2 && bytes(off) == 'P' && bytes(off + 1) == '6', "PPM: bad magic")
    i = off + 2
    val w = int(); val h = int(); val maxv = int()
    require(maxv == 255, s"PPM: unsupported maxval $maxv")
    // same overflow class as the BMP fix: header-supplied dims near 2^31
    // would overflow 3*w*h in Int and bypass the truncation check
    require(w > 0 && h > 0 && w <= (1 << 20) && h <= (1 << 20),
      s"PPM: implausible dimensions ${w}x$h")
    i += 1 // exactly ONE whitespace byte separates header from raster
    require(bytes.length - i >= 3L * w * h, "PPM: truncated raster")
    val n = 3 * w * h
    val rgb = java.util.Arrays.copyOfRange(bytes, i, i + n)
    (Image(w, h, rgb), i + n)
  }

  def decodePpm(bytes: Array[Byte]): Image = decodePpmAt(bytes, 0)._1

  /** Concatenated P6 frames (ffmpeg image2pipe PPM stream). */
  def encodePpmStream(frames: Seq[Image]): Array[Byte] = {
    val encoded = frames.map(encodePpm)
    val out = new Array[Byte](encoded.iterator.map(_.length).sum)
    var off = 0
    encoded.foreach { e => System.arraycopy(e, 0, out, off, e.length); off += e.length }
    out
  }

  def decodePpmStream(bytes: Array[Byte]): Seq[Image] = {
    val out = Seq.newBuilder[Image]
    var off = 0
    while (off < bytes.length) {
      val (img, next) = decodePpmAt(bytes, off)
      out += img
      off = next
    }
    out.result()
  }

  // =====================================================================
  // BMP (BITMAPINFOHEADER, 24bpp, uncompressed)
  // =====================================================================

  private def w16(a: Array[Byte], o: Int, v: Int): Unit = {
    a(o) = v.toByte; a(o + 1) = (v >>> 8).toByte
  }
  private def w32(a: Array[Byte], o: Int, v: Int): Unit = {
    a(o) = v.toByte; a(o + 1) = (v >>> 8).toByte
    a(o + 2) = (v >>> 16).toByte; a(o + 3) = (v >>> 24).toByte
  }
  private def r16(a: Array[Byte], o: Int): Int = (a(o) & 0xff) | ((a(o + 1) & 0xff) << 8)
  private def r32(a: Array[Byte], o: Int): Int =
    (a(o) & 0xff) | ((a(o + 1) & 0xff) << 8) | ((a(o + 2) & 0xff) << 16) | ((a(o + 3) & 0xff) << 24)

  def encodeBmp(img: Image): Array[Byte] = {
    val rowBytes = (img.width * 3 + 3) & ~3 // rows padded to 4 bytes
    val dataSize = rowBytes * img.height
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    w32(out, 2, out.length); w32(out, 10, 54)
    w32(out, 14, 40); w32(out, 18, img.width); w32(out, 22, img.height)
    w16(out, 26, 1); w16(out, 28, 24); w32(out, 30, 0); w32(out, 34, dataSize)
    w32(out, 38, 2835); w32(out, 42, 2835) // 72 dpi
    var y = 0
    while (y < img.height) {
      val srcRow = img.height - 1 - y // bottom-up
      var x = 0
      while (x < img.width) {
        val s = 3 * (srcRow * img.width + x)
        val d = 54 + y * rowBytes + 3 * x
        out(d) = img.rgb(s + 2) // B
        out(d + 1) = img.rgb(s + 1) // G
        out(d + 2) = img.rgb(s) // R
        x += 1
      }
      y += 1
    }
    out
  }

  def decodeBmp(bytes: Array[Byte]): Image = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "BMP: bad magic")
    val dataOff = r32(bytes, 10)
    val w = r32(bytes, 18)
    val h = r32(bytes, 22)
    require(r16(bytes, 28) == 24 && r32(bytes, 30) == 0, "BMP: only 24bpp uncompressed")
    require(w > 0 && h > 0, "BMP: top-down bitmaps unsupported")
    // size math in Long: untrusted w/h near Int.MaxValue would overflow
    // rowBytes*h and let the truncation check pass, turning the intended
    // IllegalArgumentException into a raw ArrayIndexOutOfBounds in the loop
    require(w <= (1 << 20) && h <= (1 << 20), s"BMP: implausible dimensions ${w}x$h")
    require(dataOff >= 54, s"BMP: bad pixel-data offset $dataOff")
    val rowBytes = (w * 3 + 3) & ~3
    require(bytes.length >= dataOff.toLong + rowBytes.toLong * h, "BMP: truncated raster")
    val rgb = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      val srcRow = h - 1 - y
      var x = 0
      while (x < w) {
        val s = dataOff + srcRow * rowBytes + 3 * x
        val d = 3 * (y * w + x)
        rgb(d) = bytes(s + 2); rgb(d + 1) = bytes(s + 1); rgb(d + 2) = bytes(s)
        x += 1
      }
      y += 1
    }
    Image(w, h, rgb)
  }

  // =====================================================================
  // WAV (RIFF, PCM 16-bit LE)
  // =====================================================================

  def encodeWav(a: Audio): Array[Byte] = {
    val dataSize = a.samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    w32(out, 4, 36 + dataSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    w32(out, 16, 16); w16(out, 20, 1); w16(out, 22, a.channels)
    w32(out, 24, a.sampleRate); w32(out, 28, a.sampleRate * a.channels * 2)
    w16(out, 32, a.channels * 2); w16(out, 34, 16)
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    w32(out, 40, dataSize)
    var i = 0
    while (i < a.samples.length) {
      w16(out, 44 + 2 * i, a.samples(i) & 0xffff)
      i += 1
    }
    out
  }

  def decodeWav(bytes: Array[Byte]): Audio = {
    require(bytes.length >= 44 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
      bytes(10) == 'V' && bytes(11) == 'E', "WAV: bad RIFF/WAVE magic")
    // walk chunks: fmt then data (tolerates extra chunks between them)
    var off = 12
    var sampleRate = -1; var channels = -1; var dataOff = -1; var dataLen = -1
    while (off + 8 <= bytes.length && (dataOff < 0 || sampleRate < 0)) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val size = r32(bytes, off + 4)
      // reject negative/oversized chunk sizes before advancing: a size of -8
      // would otherwise leave `off` unchanged (infinite loop), and huge sizes
      // would surface as raw index errors deep in the sample loop
      require(size >= 0 && off.toLong + 8 + size <= bytes.length,
        s"WAV: bad chunk size $size at offset $off")
      if (id == "fmt ") {
        require(r16(bytes, off + 8) == 1, "WAV: only PCM")
        require(r16(bytes, off + 22) == 16, "WAV: only 16-bit")
        channels = r16(bytes, off + 10)
        sampleRate = r32(bytes, off + 12)
      } else if (id == "data") {
        dataOff = off + 8; dataLen = size
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(sampleRate > 0 && dataOff >= 0, "WAV: missing fmt/data chunk")
    require(bytes.length >= dataOff + dataLen, "WAV: truncated data")
    val samples = new Array[Short](dataLen / 2)
    var i = 0
    while (i < samples.length) {
      samples(i) = r16(bytes, dataOff + 2 * i).toShort
      i += 1
    }
    Audio(sampleRate, channels, samples)
  }

  // =====================================================================
  // sniffing
  // =====================================================================

  /** Container of a payload by magic bytes: "ppm" | "bmp" | "wav". A PPM
    * stream with >1 frame is still "ppm" — frame count comes from decode.
    */
  def sniff(bytes: Array[Byte]): String = {
    require(bytes.length >= 4, "payload too short to sniff")
    if (bytes(0) == 'P' && bytes(1) == '6') "ppm"
    else if (bytes(0) == 'B' && bytes(1) == 'M') "bmp"
    else if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F') "wav"
    else throw new IllegalArgumentException(s"unknown media magic: ${bytes(0)},${bytes(1)}")
  }
}
