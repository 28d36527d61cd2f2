package graft

import graft.operators.{AudioProbe, MediaProbe, VideoProbe}
import org.scalatest.funsuite.AnyFunSuite

/** MediaProbe header parsing pinned on crafted container headers — the
  * byte layouts come from the published format specs (PNG IHDR, GIF
  * logical screen descriptor, BITMAPINFOHEADER, JPEG SOF marker walk).
  */
class MediaProbeSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("png: IHDR big-endian dimensions") {
    val png = bytes(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      bytes(0, 0, 0, 13) ++ "IHDR".getBytes ++
      bytes(0, 0, 2, 0x80) ++ // width 640
      bytes(0, 0, 1, 0xe0) ++ // height 480
      bytes(8, 6, 0, 0, 0)
    assert(MediaProbe.probe(png) == MediaProbe.Probe("png", 640, 480))
  }

  test("gif: little-endian logical screen size, both versions") {
    val screen = bytes(0x40, 0x01, 0xf0, 0x00) // 320 x 240
    assert(MediaProbe.probe("GIF89a".getBytes ++ screen ++ new Array[Byte](4)) ==
      MediaProbe.Probe("gif", 320, 240))
    assert(MediaProbe.probe("GIF87a".getBytes ++ screen ++ new Array[Byte](4)) ==
      MediaProbe.Probe("gif", 320, 240))
  }

  test("bmp: little-endian i32 dims, top-down height normalized") {
    def bmp(h: Int): Array[Byte] = {
      val b = new Array[Byte](26)
      b(0) = 'B'; b(1) = 'M'
      // width 1024 at offset 18, height at 22 (LE i32)
      b(18) = 0x00; b(19) = 0x04
      val hb = java.nio.ByteBuffer
        .allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(h)
        .array()
      Array.copy(hb, 0, b, 22, 4)
      b
    }
    assert(MediaProbe.probe(bmp(768)) == MediaProbe.Probe("bmp", 1024, 768))
    assert(MediaProbe.probe(bmp(-768)) == MediaProbe.Probe("bmp", 1024, 768))
  }

  test("jpeg: marker walk past APP0/APPn to the SOF dimensions") {
    val jpeg = bytes(0xff, 0xd8) ++ // SOI
      bytes(0xff, 0xe0, 0x00, 0x10) ++ new Array[Byte](14) ++ // APP0 len 16
      bytes(0xff, 0xdb, 0x00, 0x05) ++ new Array[Byte](3) ++ // DQT len 5
      bytes(0xff, 0xc0, 0x00, 0x11, 0x08, 0x04, 0x00, 0x03, 0x00) // SOF0: 1024x768
    assert(MediaProbe.probe(jpeg) == MediaProbe.Probe("jpeg", 768, 1024))
  }

  test("jpeg: progressive SOF2 also matches; DHT (C4) is not a frame header") {
    val jpeg = bytes(0xff, 0xd8) ++
      bytes(0xff, 0xc4, 0x00, 0x05) ++ new Array[Byte](3) ++ // DHT, must be skipped
      bytes(0xff, 0xc2, 0x00, 0x11, 0x08, 0x00, 0x64, 0x00, 0xc8) // SOF2: 200x100
    assert(MediaProbe.probe(jpeg) == MediaProbe.Probe("jpeg", 200, 100))
  }

  test("garbage, truncated, and text payloads are unknown") {
    assert(MediaProbe.probe("hello world".getBytes) == MediaProbe.Probe("unknown", -1, -1))
    assert(MediaProbe.probe(Array.empty[Byte]) == MediaProbe.Probe("unknown", -1, -1))
    assert(MediaProbe.probe(bytes(0x89, 'P', 'N', 'G')) == MediaProbe.Probe("unknown", -1, -1))
    // JPEG SOI with a desynchronized stream after it
    assert(MediaProbe.probe(bytes(0xff, 0xd8, 0x00, 0x00, 0x00)) ==
      MediaProbe.Probe("unknown", -1, -1))
  }

  // ------------------------------------------------------------- audio

  test("WAV header round-trips through the chunk walk") {
    val h = AudioProbe.wavHeader(channels = 2, rate = 44100, bits = 16, nSamples = 1000L)
    assert(h.length == 44)
    assert(AudioProbe.probe(h) == AudioProbe.Audio("wav", 2, 44100, 16, 1000L))
  }

  test("WAV chunk walk skips extra chunks and honors odd-size padding") {
    val base = AudioProbe.wavHeader(1, 8000, 16, 10L)
    // splice a 3-byte LIST chunk (padded to 4) between WAVE and fmt
    val list = "LIST".getBytes ++ Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3, 0)
    val spliced = base.take(12) ++ list ++ base.drop(12)
    assert(AudioProbe.probe(spliced) == AudioProbe.Audio("wav", 1, 8000, 16, 10L))
  }

  test("compressed containers identify by signature; garbage is unknown") {
    assert(AudioProbe.probe("fLaC....".getBytes).format == "flac")
    assert(AudioProbe.probe("OggS....".getBytes).format == "ogg")
    assert(AudioProbe.probe("ID3.....".getBytes).format == "mp3")
    assert(AudioProbe.probe("RIFF1234AVI ".getBytes).format == "unknown")
    assert(AudioProbe.probe(Array.empty[Byte]).format == "unknown")
    // RIFF/WAVE with no fmt chunk -> unknown, not a crash
    assert(AudioProbe.probe("RIFF\u0000\u0000\u0000\u0000WAVE".getBytes).format == "unknown")
    // corrupt u32 chunk size near 2^32: must terminate (no un-advancing
    // loop) and must not index negatively — just unknown
    val corrupt = "RIFF\u0000\u0000\u0000\u0000WAVEJUNK".getBytes ++
      Array[Byte](0xf8.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte) ++ new Array[Byte](16)
    assert(AudioProbe.probe(corrupt).format == "unknown")
  }

  // ------------------------------------------------------------ VideoProbe

  test("mp4: synthesize/probe round trip through decoy boxes") {
    val b = VideoProbe.mp4Header("isom", 90000, 450000L, 1280, 720)
    val v = VideoProbe.probe(b)
    assert(v == VideoProbe.Video("mp4", "isom", 90000, 450000L * 1000 / 90000, 1280, 720))
  }

  test("mp4: mvhd version 1 (64-bit times) layout") {
    // hand-build: ftyp + moov(mvhd v1): ver1/flags, ctime8, mtime8,
    // timescale4, duration8
    val mvhdSize = 8 + 4 + 8 + 8 + 4 + 8
    val bb = java.nio.ByteBuffer.allocate(16 + 8 + mvhdSize)
    bb.putInt(16); bb.put("ftypmp42".getBytes); bb.putInt(0)
    bb.putInt(8 + mvhdSize); bb.put("moov".getBytes)
    bb.putInt(mvhdSize); bb.put("mvhd".getBytes)
    bb.putInt(0x01000000) // version 1
    bb.putLong(0L); bb.putLong(0L) // ctime, mtime
    bb.putInt(1000) // timescale
    bb.putLong(123456L) // duration
    val v = VideoProbe.probe(bb.array())
    assert(v.format == "mp4" && v.brand == "mp42")
    assert(v.timescale == 1000 && v.durationMs == 123456L)
    assert(v.width == -1 && v.height == -1) // no trak in this file
  }

  test("mp4: 64-bit extended box size (size=1 + u64) walks correctly") {
    // moov with a 16-byte header: size0=1, largesize at offset 8
    val mvhdSize = 8 + 4 + 4 + 4 + 4 + 4 // v0 through duration
    val moovSize = 16 + mvhdSize
    val bb = java.nio.ByteBuffer.allocate(16 + moovSize)
    bb.putInt(16); bb.put("ftypisom".getBytes); bb.putInt(0)
    bb.putInt(1); bb.put("moov".getBytes); bb.putLong(moovSize.toLong)
    bb.putInt(mvhdSize); bb.put("mvhd".getBytes)
    bb.putInt(0) // version 0
    bb.putInt(0); bb.putInt(0) // ctime, mtime
    bb.putInt(48000) // timescale
    bb.putInt(96000) // duration
    val v = VideoProbe.probe(bb.array())
    assert(v.timescale == 48000 && v.durationMs == 2000L, v)
  }

  test("video container signatures and corrupt-input hardening") {
    assert(VideoProbe.probe("RIFF1234AVI ".getBytes).format == "avi")
    assert(VideoProbe.probe(Array(0x1a, 0x45, 0xdf, 0xa3).map(_.toByte)).format == "mkv")
    assert(VideoProbe.probe("not a video".getBytes).format == "unknown")
    assert(VideoProbe.probe(Array.empty[Byte]).format == "unknown")
    // ftyp with no moov: identified, metadata absent
    val bare = java.nio.ByteBuffer.allocate(16)
    bare.putInt(16); bare.put("ftypavc1".getBytes); bare.putInt(0)
    val v = VideoProbe.probe(bare.array())
    assert(v.format == "mp4" && v.brand == "avc1" && v.timescale == -1 &&
      v.durationMs == -1L && v.width == -1)
    // corrupt box size smaller than its own header: walk must stop, not spin
    val corrupt = java.nio.ByteBuffer.allocate(32)
    corrupt.putInt(16); corrupt.put("ftypisom".getBytes); corrupt.putInt(0)
    corrupt.putInt(3); corrupt.put("junk".getBytes) // size 3 < header 8
    assert(VideoProbe.probe(corrupt.array()).format == "mp4") // and terminates
    // truncated mid-moov: no crash, absent fields stay -1
    val full = VideoProbe.mp4Header("isom", 600, 600L, 640, 480)
    val trunc = VideoProbe.probe(java.util.Arrays.copyOfRange(full, 0, 40))
    assert(trunc.format == "mp4" && trunc.timescale == -1)
  }
}
