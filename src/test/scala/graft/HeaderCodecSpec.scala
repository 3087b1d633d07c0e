package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.HeaderCodec

/** Hand-built byte fixtures for the REAL header parsers — every field
  * placed manually from the published layouts, independent of the
  * encoders (which are then round-trip-checked separately).
  */
class HeaderCodecSpec extends AnyFunSuite {

  private def le32(v: Int): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >> 8).toByte)
  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  test("BMP: hand-built 3x2 24bpp header parses exact dims") {
    // rowSize = ((3*3+3)/4)*4 = 12; data = 24; file = 78
    val bmp = ascii("BM") ++ le32(78) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(3) ++ le32(2) ++ le16(1) ++ le16(24) ++
      new Array[Byte](24 + 24) // rest of info header (24) + pixel data (24)
    assert(bmp.length == 78)
    assert(HeaderCodec.parseBmp(bmp).contains(HeaderCodec.ImageDims(3, 2)))
  }

  test("BMP: top-down (negative height) yields abs; garbage/truncated → None") {
    val topDown = ascii("BM") ++ le32(78) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(5) ++ le32(-4) ++ le16(1) ++ le16(24) ++ new Array[Byte](48)
    assert(HeaderCodec.parseBmp(topDown).contains(HeaderCodec.ImageDims(5, 4)))
    assert(HeaderCodec.parseBmp(ascii("BM") ++ new Array[Byte](10)).isEmpty) // truncated
    assert(HeaderCodec.parseBmp(ascii("XX") ++ new Array[Byte](60)).isEmpty) // bad magic
    assert(HeaderCodec.parseBmp(null).isEmpty)
  }

  test("PPM/PGM: whitespace + '#' comments between tokens handled") {
    val p6 = ascii("P6\n# a comment\n13  7\n255\n") ++ new Array[Byte](13 * 7 * 3)
    assert(HeaderCodec.parsePpm(p6).contains(HeaderCodec.ImageDims(13, 7)))
    val p5 = ascii("P5 2 3 255 ") ++ new Array[Byte](6)
    assert(HeaderCodec.parsePpm(p5).contains(HeaderCodec.ImageDims(2, 3)))
    assert(HeaderCodec.parsePpm(ascii("P6\n# only a comment")).isEmpty)
  }

  test("WAV: hand-built PCM header → exact sample rate, channels, duration") {
    // 8000 Hz stereo 16-bit, 4000 frames → 16000 data bytes → 500 ms
    val data = new Array[Byte](16000)
    val wav = ascii("RIFF") ++ le32(36 + 16000) ++ ascii("WAVE") ++
      ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(8000) ++
      le32(8000 * 2 * 2) ++ le16(4) ++ le16(16) ++
      ascii("data") ++ le32(16000) ++ data
    assert(HeaderCodec.parseWav(wav)
      .contains(HeaderCodec.AudioInfo(8000, 2, 16, 500L)))
  }

  test("WAV: chunk walk skips odd-sized chunks with pad byte; truncated data tolerated") {
    // a 3-byte LIST chunk (odd → 1 pad byte) before fmt
    val wav = ascii("RIFF") ++ le32(0) ++ ascii("WAVE") ++
      ascii("LIST") ++ le32(3) ++ new Array[Byte](4) ++ // 3 data + 1 pad
      ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(16000) ++
      le32(16000 * 2) ++ le16(2) ++ le16(16) ++
      ascii("data") ++ le32(64000) ++ new Array[Byte](32000) // claims 2s, has 1s
    val a = HeaderCodec.parseWav(wav).get
    assert(a.sampleRate == 16000 && a.channels == 1)
    assert(a.durationMs == 1000L) // truncation-tolerant: actual bytes, not claimed
    assert(HeaderCodec.parseWav(ascii("RIFF") ++ new Array[Byte](8)).isEmpty)
  }

  test("encoder/parser roundtrip at edge dims/durations") {
    assert(HeaderCodec.parseBmp(HeaderCodec.bmpBytes(1, 1, 7L))
      .contains(HeaderCodec.ImageDims(1, 1)))
    assert(HeaderCodec.parseBmp(HeaderCodec.bmpBytes(640, 480, 7L))
      .contains(HeaderCodec.ImageDims(640, 480)))
    val a = HeaderCodec.parseWav(HeaderCodec.wavBytes(44100, 250, 2, 7L)).get
    assert(a.sampleRate == 44100 && a.channels == 2 && a.durationMs == 250L)
    // 0 ms → empty data chunk, still parseable, duration 0
    assert(HeaderCodec.parseWav(HeaderCodec.wavBytes(8000, 0, 1, 7L)).get.durationMs == 0L)
  }
}
