package graft.multimodal

/** REAL GIF89a codec — JDK-only, no image library: a genuine LZW
  * encoder/decoder (variable code width 3–12 bits, LSB-first bit
  * packing, clear-code dictionary resets at 4096 entries, 255-byte
  * sub-block framing) plus the container walk (logical screen
  * descriptor, global color table, extension skip, image descriptor).
  *
  * This closes the last image-format stub in [[Multimodal.MediaCodec]]:
  * BMP (raw), PNG (deflate), JPEG (baseline Huffman) and now GIF (LZW)
  * all decode to content-derived pixels. The reference pipeline treats
  * media as opaque text-adjacent payloads (data_manager.py stores text
  * only), so this is beyond-reference capability; format layout per
  * the public GIF89a specification (CompuServe, 1990).
  *
  * The encoder emits codes in the classic compress/ppmtogif order —
  * write the prefix code at the CURRENT width, then grow the width
  * when the next free slot would no longer fit ((1 &lt;&lt; codeSize)),
  * then insert the new dictionary entry — which is exactly the
  * transition order the standard decoder mirrors (insert, then grow
  * when `next` reaches the width limit). Both sides reset through the
  * clear code when the table fills at 4096.
  *
  * All public entry points are total: malformed, truncated or
  * out-of-scope streams (local color tables, interlace) return None,
  * never throw.
  */
object GifCodec extends Serializable {

  /** Fixed 256-entry palette — a pure function of the index (odd
    * multipliers are bijections mod 256, so the three channels spread
    * independently), shared by the encoder, the decoder and tests.
    */
  @inline def paletteR(i: Int): Int = i & 0xff
  @inline def paletteG(i: Int): Int = (i * 73) & 0xff
  @inline def paletteB(i: Int): Int = (i * 151 + 31) & 0xff

  /** Deterministic index noise for the synthetic GIF — public so tests
    * can regenerate the EXPECTED pixels and assert the decode is
    * content-derived (same mix-chain pattern as
    * [[HeaderCodec.pngNoisePixels]]).
    */
  def gifIndexPixels(w: Int, h: Int, seed: Long): Array[Byte] = {
    val out = new Array[Byte](w * h)
    var x = graft.util.Hash.mix(seed + 19)
    var i = 0
    while (i < out.length) {
      if (i % 8 == 0) x = graft.util.Hash.mix(x)
      out(i) = (x >>> ((i % 8) * 8)).toByte
      i += 1
    }
    out
  }

  // ---- LZW bit streams (GIF is LSB-first within bytes) ----

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def write(code: Int, width: Int): Unit = {
      cur |= code << nBits
      nBits += width
      while (nBits >= 8) { out.write(cur & 0xff); cur >>>= 8; nBits -= 8 }
    }
    def finish(): Array[Byte] = {
      if (nBits > 0) { out.write(cur & 0xff); cur = 0; nBits = 0 }
      out.toByteArray
    }
  }

  private final class BitReader(data: Array[Byte]) {
    private var pos = 0
    private var cur = 0
    private var nBits = 0
    /** Next `width`-bit code, or -1 when the stream is exhausted. */
    def read(width: Int): Int = {
      while (nBits < width) {
        if (pos >= data.length) return -1
        cur |= (data(pos) & 0xff) << nBits
        pos += 1
        nBits += 8
      }
      val v = cur & ((1 << width) - 1)
      cur >>>= width
      nBits -= width
      v
    }
  }

  /** LZW-compress a pixel-index stream (GIF variant). */
  def lzwEncode(indices: Array[Byte], minCodeSize: Int): Array[Byte] = {
    require(minCodeSize >= 2 && minCodeSize <= 8)
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val bw = new BitWriter
    var codeSize = minCodeSize + 1
    var next = eoi + 1
    // dictionary key = (prefix code << 8) | suffix byte
    val table = new java.util.HashMap[Integer, Integer]()
    bw.write(clear, codeSize)
    if (indices.isEmpty) { bw.write(eoi, codeSize); return bw.finish() }
    var prefix = indices(0) & 0xff
    var i = 1
    while (i < indices.length) {
      val c = indices(i) & 0xff
      val key = (prefix << 8) | c
      val hit = table.get(key)
      if (hit != null) prefix = hit.intValue
      else {
        bw.write(prefix, codeSize)
        // grow AFTER the write, BEFORE the insert (compress order; the
        // decoder's insert-then-grow sees the same width per code)
        if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        if (next < 4096) { table.put(key, next); next += 1 }
        else { // table full: reset through a clear code
          bw.write(clear, codeSize)
          codeSize = minCodeSize + 1
          next = eoi + 1
          table.clear()
        }
        prefix = c
      }
      i += 1
    }
    bw.write(prefix, codeSize)
    bw.write(eoi, codeSize)
    bw.finish()
  }

  /** LZW-decompress into exactly `nPixels` indices; None on any
    * malformed code, truncation before `nPixels`, or bad minCodeSize.
    */
  def lzwDecode(data: Array[Byte], minCodeSize: Int, nPixels: Int): Option[Array[Byte]] = {
    if (minCodeSize < 2 || minCodeSize > 8 || nPixels < 0) return None
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val br = new BitReader(data)
    val out = new Array[Byte](nPixels)
    var pos = 0
    val prefixOf = new Array[Int](4096)
    val suffixOf = new Array[Byte](4096)
    var i = 0
    while (i < clear) { prefixOf(i) = -1; suffixOf(i) = i.toByte; i += 1 }
    var codeSize = minCodeSize + 1
    var next = eoi + 1
    var prev = -1
    val buf = new Array[Byte](4096)
    // append str(code) to out; returns its first byte (0 on overflow)
    def emit(code: Int): Byte = {
      var c = code
      var n = 0
      while (c >= 0) { buf(n) = suffixOf(c); n += 1; c = prefixOf(c) }
      val first = buf(n - 1)
      var j = n - 1
      while (j >= 0 && pos < nPixels) { out(pos) = buf(j); pos += 1; j -= 1 }
      first
    }
    var done = false
    while (!done && pos < nPixels) {
      val code = br.read(codeSize)
      if (code < 0 || code == eoi) done = true
      else if (code == clear) { codeSize = minCodeSize + 1; next = eoi + 1; prev = -1 }
      else if (prev < 0) {
        if (code >= clear) return None // first code after clear must be a literal
        emit(code)
        prev = code
      } else {
        var first: Byte = 0
        if (code < next) first = emit(code)
        else if (code == next) { // the (prev + first(prev)) special case
          var c = prev
          while (prefixOf(c) >= 0) c = prefixOf(c)
          first = suffixOf(c)
          emit(prev)
          if (pos < nPixels) { out(pos) = first; pos += 1 }
        } else return None // code beyond the table: corrupt stream
        if (next < 4096) {
          prefixOf(next) = prev
          suffixOf(next) = first
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    if (pos == nPixels) Some(out) else None
  }

  /** Full GIF89a with a 256-entry global color table and a REAL
    * LZW-compressed image of [[gifIndexPixels]] noise —
    * [[decodePixels]] round-trips it to the exact palette-mapped RGB.
    */
  def gifPixelBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff)
    val indices = gifIndexPixels(w, h, seed)
    val lzw = lzwEncode(indices, 8)
    val out = new java.io.ByteArrayOutputStream(13 + 768 + 10 + 1 + lzw.length + lzw.length / 255 + 3)
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    "GIF89a".foreach(c => out.write(c))
    w16(w); w16(h)
    out.write(0xf7) // GCT present, color resolution 8, GCT size 2^8
    out.write(0)    // background color index
    out.write(0)    // pixel aspect ratio
    var i = 0
    while (i < 256) {
      out.write(paletteR(i)); out.write(paletteG(i)); out.write(paletteB(i))
      i += 1
    }
    out.write(0x2c) // image descriptor
    w16(0); w16(0); w16(w); w16(h)
    out.write(0)    // no local color table, not interlaced
    out.write(8)    // LZW min code size
    var off = 0
    while (off < lzw.length) { // 255-byte sub-blocks
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** REAL GIF pixel decode: global-color-table, non-interlaced images
    * (what [[gifPixelBytes]] emits — and any plain single-frame GIF);
    * extensions are skipped, local color tables and interlace decline
    * to None (header dims still parse via [[HeaderCodec.parseGif]]).
    * Total, never throws.
    */
  def decodePixels(b: Array[Byte]): Option[HeaderCodec.RgbImage] = {
    if (!HeaderCodec.isGif(b)) return None
    val packed = b(10) & 0xff
    if ((packed & 0x80) == 0) return None // no global color table
    val gctSize = 1 << ((packed & 7) + 1)
    var p = 13
    if (p + gctSize * 3 > b.length) return None
    val gctOff = p
    p += gctSize * 3
    // block walk to the first image descriptor
    while (p < b.length) {
      (b(p) & 0xff) match {
        case 0x21 => // extension: label + sub-blocks
          p += 2
          var go = true
          while (go) {
            if (p >= b.length) return None
            val n = b(p) & 0xff
            p += 1 + n
            if (n == 0) go = false
          }
        case 0x2c => // image descriptor
          if (p + 10 > b.length) return None
          def u16(i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
          val w = u16(p + 5)
          val h = u16(p + 7)
          val ipacked = b(p + 9) & 0xff
          if ((ipacked & 0x80) != 0 || (ipacked & 0x40) != 0) return None // LCT / interlace
          if (w <= 0 || h <= 0 || w.toLong * h * 3 > 64L * 1024 * 1024) return None
          p += 10
          if (p >= b.length) return None
          val minCodeSize = b(p) & 0xff
          p += 1
          val lzw = new java.io.ByteArrayOutputStream()
          var go = true
          while (go) {
            if (p >= b.length) return None
            val n = b(p) & 0xff
            if (n == 0) { p += 1; go = false }
            else {
              if (p + 1 + n > b.length) return None
              lzw.write(b, p + 1, n)
              p += 1 + n
            }
          }
          val idx = lzwDecode(lzw.toByteArray, minCodeSize, w * h).getOrElse(return None)
          val rgb = new Array[Byte](w * h * 3)
          var i = 0
          while (i < idx.length) {
            val ci = idx(i) & 0xff
            if (ci >= gctSize) return None // index beyond the palette
            rgb(i * 3) = b(gctOff + ci * 3)
            rgb(i * 3 + 1) = b(gctOff + ci * 3 + 1)
            rgb(i * 3 + 2) = b(gctOff + ci * 3 + 2)
            i += 1
          }
          return Some(HeaderCodec.RgbImage(w, h, rgb))
        case 0x3b => return None // trailer before any image data
        case _ => return None    // lost framing
      }
    }
    None
  }
}
