package graft.multimodal

/** REAL header-arithmetic decoders for uncompressed media formats —
  * no codec library needed, just byte arithmetic over the published
  * container layouts:
  *
  *   - BMP: BITMAPFILEHEADER ("BM", 14 bytes) + BITMAPINFOHEADER
  *     (width int32 LE at offset 18, height int32 LE at offset 22;
  *     negative height = top-down rows).
  *   - PPM (binary P6): ASCII magic, then whitespace-separated width,
  *     height, maxval tokens with '#' comments allowed between them.
  *   - WAV: RIFF container ("RIFF" <size> "WAVE"), then a chunk walk —
  *     "fmt " carries channels (u16 LE @ +2), sample rate (u32 LE @ +4)
  *     and bits/sample (u16 LE @ +14); "data"'s size with those gives
  *     duration_ms = dataBytes · 1000 / (rate · channels · bits/8).
  *
  * These replace the stub behind [[Multimodal.FakeCodec.decode]] for
  * the formats they recognize (the reference pipeline treats media as
  * opaque payloads — data_manager.py stores text only — so this is
  * beyond-reference capability); unrecognized bytes still fall through
  * to the deterministic stub. All parsers are total: malformed or
  * truncated headers return None, never throw.
  */
object HeaderCodec extends Serializable {

  final case class ImageDims(width: Int, height: Int)
  final case class AudioInfo(sampleRate: Int, channels: Int, bitsPerSample: Int,
      durationMs: Long)

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  @inline private def u16le(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8)
  @inline private def i32le(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  @inline private def u32le(b: Array[Byte], i: Int): Long = i32le(b, i) & 0xffffffffL

  def isBmp(b: Array[Byte]): Boolean =
    b != null && b.length >= 54 && b(0) == 'B' && b(1) == 'M'

  /** BMP dims from BITMAPINFOHEADER (requires the standard 40-byte
    * info header or any of its extended successors).
    */
  def parseBmp(b: Array[Byte]): Option[ImageDims] = {
    if (!isBmp(b)) return None
    val infoSize = i32le(b, 14)
    if (infoSize < 40) return None // BITMAPCOREHEADER (16-bit dims) not emitted since Win2.x
    val w = i32le(b, 18)
    val h = i32le(b, 22) // may be negative: top-down row order
    if (w <= 0 || h == 0 || h == Int.MinValue) None
    else Some(ImageDims(w, math.abs(h)))
  }

  def isPpm(b: Array[Byte]): Boolean =
    b != null && b.length >= 2 && b(0) == 'P' && (b(1) == '6' || b(1) == '5')

  /** PPM/PGM (P6/P5 binary) dims: ASCII tokens after the magic,
    * skipping '#' comment lines.
    */
  def parsePpm(b: Array[Byte]): Option[ImageDims] = {
    if (!isPpm(b)) return None
    var i = 2
    def skipWsAndComments(): Unit = {
      var go = true
      while (go && i < b.length) {
        val c = b(i)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r') i += 1
        else if (c == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else go = false
      }
    }
    def token(): Option[Int] = {
      skipWsAndComments()
      var v = 0L
      var any = false
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0'); any = true; i += 1
        if (v > Int.MaxValue) return None
      }
      if (any) Some(v.toInt) else None
    }
    for { w <- token(); h <- token() if w > 0 && h > 0 } yield ImageDims(w, h)
  }

  def isWav(b: Array[Byte]): Boolean =
    b != null && b.length >= 44 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** WAV sample rate / channels / duration via a real RIFF chunk walk
    * (chunks are word-aligned: odd sizes carry a pad byte).
    */
  def parseWav(b: Array[Byte]): Option[AudioInfo] = {
    if (!isWav(b)) return None
    var i = 12
    var rate = 0
    var channels = 0
    var bits = 0
    var dataLen = -1L
    while (i + 8 <= b.length && (rate == 0 || dataLen < 0)) {
      val id = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = u32le(b, i + 4)
      if (id == "fmt " && i + 8 + 16 <= b.length) {
        channels = u16le(b, i + 10)
        rate = i32le(b, i + 12)
        bits = u16le(b, i + 22)
      } else if (id == "data") {
        dataLen = math.min(size, (b.length - i - 8).toLong) // tolerate truncation
      }
      i += 8 + size.toInt + (size.toInt & 1)
      if (size > Int.MaxValue - 16 || i < 0) return None // corrupt size
    }
    if (rate <= 0 || channels <= 0 || bits <= 0 || dataLen < 0) None
    else {
      val byteRate = rate.toLong * channels * (bits / 8)
      if (byteRate <= 0) None
      else Some(AudioInfo(rate, channels, bits, dataLen * 1000L / byteRate))
    }
  }

  // ---- deterministic encoders for the synthetic media table ----
  // (real bytes, so the parsers above decode REAL headers in tests)

  /** Minimal 24-bit uncompressed BMP with deterministic pixel noise. */
  def bmpBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    require(w > 0 && h > 0)
    val rowSize = ((w * 3 + 3) / 4) * 4
    val dataSize = rowSize * h
    val out = new Array[Byte](54 + dataSize)
    def put16(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte }
    def put32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    put32(2, 54 + dataSize) // file size
    put32(10, 54)           // pixel data offset
    put32(14, 40)           // BITMAPINFOHEADER size
    put32(18, w); put32(22, h)
    put16(26, 1)            // planes
    put16(28, 24)           // bpp
    put32(34, dataSize)
    var x = graft.util.Hash.mix(seed)
    var i = 54
    while (i < out.length) {
      if ((i - 54) % 8 == 0) x = graft.util.Hash.mix(x)
      out(i) = (x >>> (((i - 54) % 8) * 8)).toByte
      i += 1
    }
    out
  }

  /** Minimal PCM WAV (fmt + data chunks) with deterministic samples. */
  def wavBytes(sampleRate: Int, durationMs: Int, channels: Int, seed: Long): Array[Byte] = {
    require(sampleRate > 0 && durationMs >= 0 && channels > 0)
    val bits = 16
    val nFrames = (sampleRate.toLong * durationMs / 1000L).toInt
    val dataSize = nFrames * channels * (bits / 8)
    val out = new Array[Byte](44 + dataSize)
    def putAscii(i: Int, s: String): Unit = s.indices.foreach(j => out(i + j) = s(j).toByte)
    def put16(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte }
    def put32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    putAscii(0, "RIFF"); put32(4, 36 + dataSize); putAscii(8, "WAVE")
    putAscii(12, "fmt "); put32(16, 16)
    put16(20, 1) // PCM
    put16(22, channels)
    put32(24, sampleRate)
    put32(28, sampleRate * channels * (bits / 8)) // byte rate
    put16(32, channels * (bits / 8))              // block align
    put16(34, bits)
    putAscii(36, "data"); put32(40, dataSize)
    var x = graft.util.Hash.mix(seed)
    var i = 44
    while (i < out.length) {
      if ((i - 44) % 8 == 0) x = graft.util.Hash.mix(x)
      out(i) = (x >>> (((i - 44) % 8) * 8)).toByte
      i += 1
    }
    out
  }
}
