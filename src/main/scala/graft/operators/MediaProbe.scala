package graft.operators

/** Container-format metadata probe: format identification + pixel
  * dimensions parsed directly from binary headers — no codec library, no
  * decompression. This is the real first stage of a multimodal ingestion
  * pipeline (dimension/aspect-ratio filters, format routing, corrupt-file
  * triage) and needs only the first bytes of each payload:
  *
  *  - PNG:  8-byte signature, then IHDR width/height at offsets 16/20
  *          (big-endian u32)
  *  - GIF:  `GIF87a`/`GIF89a`, logical-screen w/h at offsets 6/8
  *          (little-endian u16)
  *  - BMP:  `BM`, BITMAPINFOHEADER width/height at offsets 18/22
  *          (little-endian i32; height may be negative = top-down rows)
  *  - JPEG: `FF D8`, then a marker-segment walk to the first SOF frame
  *          header (C0-CF minus C4/C8/CC), height/width at payload
  *          offsets +3/+5 (big-endian u16)
  *
  * Anything else → `unknown` with -1 dimensions. The pixel DECODE behind
  * these headers remains the documented stub boundary (no libjpeg/libpng
  * in this container); header parsing needs none of it.
  */
object MediaProbe {

  final case class Probe(format: String, width: Int, height: Int)

  private val Unknown = Probe("unknown", -1, -1)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def beU16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def leU16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def beU32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def leI32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  def probe(b: Array[Byte]): Probe =
    if (b.length >= 24 &&
      u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a && u8(b, 7) == 0x0a)
      Probe("png", beU32(b, 16).toInt, beU32(b, 20).toInt)
    else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Probe("gif", leU16(b, 6), leU16(b, 8))
    else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      Probe("bmp", leI32(b, 18), math.abs(leI32(b, 22)))
    else if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8)
      jpegSof(b)
    else Unknown

  /** Walk JPEG marker segments to the first start-of-frame header. */
  private def jpegSof(b: Array[Byte]): Probe = {
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return Unknown // desynchronized stream
      val m = u8(b, i + 1)
      if (m == 0xff) i += 1 // fill byte
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd9)) i += 2 // standalone
      else if ((m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc) {
        // SOFn payload: len(2) precision(1) height(2) width(2)
        if (i + 8 < b.length) return Probe("jpeg", beU16(b, i + 7), beU16(b, i + 5))
        else return Unknown
      } else {
        if (i + 3 >= b.length) return Unknown
        i += 2 + beU16(b, i + 2) // length includes its own 2 bytes
      }
    }
    Unknown
  }
}

/** Audio-container metadata probe — the audio-modality sibling of
  * [[MediaProbe]]: WAV (RIFF) headers are parsed in full (a chunk walk
  * to `fmt ` and `data`, tolerating extra chunks like `LIST` in
  * between), FLAC / Ogg / ID3(MP3) containers are identified by
  * signature. Sample-accurate duration needs no codec for PCM WAV:
  * `data` byte length / (channels × bytes-per-sample) is the sample
  * count. Compressed payload decode stays behind the same documented
  * stub boundary as pixel decode.
  */
object AudioProbe {

  /** nSamples / sampleRate etc. are -1 when the container doesn't carry
    * them without decode (flac/ogg/mp3 here) or the file is corrupt.
    */
  final case class Audio(
      format: String,
      channels: Int,
      sampleRate: Int,
      bitsPerSample: Int,
      nSamples: Long)

  private val Unknown = Audio("unknown", -1, -1, -1, -1L)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def leU16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def leU32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) |
      (u8(b, i + 3).toLong << 24)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    b.length >= i + 4 && b(i) == s(0).toByte && b(i + 1) == s(1).toByte &&
      b(i + 2) == s(2).toByte && b(i + 3) == s(3).toByte

  def probe(b: Array[Byte]): Audio =
    if (tag(b, 0, "RIFF") && tag(b, 8, "WAVE")) wav(b)
    else if (tag(b, 0, "fLaC")) Audio("flac", -1, -1, -1, -1L)
    else if (tag(b, 0, "OggS")) Audio("ogg", -1, -1, -1, -1L)
    else if (b.length >= 3 && b(0) == 'I' && b(1) == 'D' && b(2) == '3')
      Audio("mp3", -1, -1, -1, -1L)
    else Unknown

  /** Chunk walk: chunks are (4-byte tag, u32le size, payload, pad to
    * even). The declared `data` size is trusted even when the payload is
    * truncated (header-only files are how manifests/probes see large
    * objects) — real ingestion validates length against object size
    * separately.
    */
  private def wav(b: Array[Byte]): Audio = {
    var i = 12L
    var channels = -1
    var rate = -1
    var bits = -1
    var dataBytes = -1L
    while (i + 8 <= b.length && (channels < 0 || dataBytes < 0)) {
      val at = i.toInt // safe: i + 8 <= b.length <= Int.MaxValue
      // unsigned chunk size, advanced in LONG arithmetic — a corrupt
      // size near 2^32 through .toInt would go negative (an
      // un-advancing loop, or a negative index into tag())
      val size = leU32(b, at + 4)
      if (tag(b, at, "fmt ") && i + 24 <= b.length) {
        channels = leU16(b, at + 10)
        rate = leU32(b, at + 12).toInt
        bits = leU16(b, at + 22)
      } else if (tag(b, at, "data")) {
        dataBytes = size
      }
      i += 8L + size + (size & 1L) // chunks pad to even offsets
    }
    if (channels <= 0 || rate <= 0 || bits <= 0) Unknown
    else {
      val n = if (dataBytes < 0) -1L else dataBytes / (channels.toLong * (bits / 8))
      Audio("wav", channels, rate, bits, n)
    }
  }

  /** Minimal PCM WAV header (44 bytes) declaring `nSamples` of audio —
    * the synthesis half of the round trip `q_multimodal_audio` tests;
    * payload bytes are intentionally omitted (see [[wav]] on truncation).
    */
  def wavHeader(channels: Int, rate: Int, bits: Int, nSamples: Long): Array[Byte] = {
    val dataSize = nSamples * channels * (bits / 8)
    // RIFF sizes are u32; fail loudly instead of silently truncating
    // through putInt (the probe round-trip would diverge undetected)
    require(
      dataSize >= 0 && dataSize + 36 <= 0xffffffffL,
      s"WAV data size $dataSize exceeds the RIFF u32 limit")
    val bb = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt((36 + dataSize).toInt)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1.toShort) // PCM
    bb.putShort(channels.toShort)
    bb.putInt(rate)
    bb.putInt(rate * channels * (bits / 8)) // byte rate
    bb.putShort((channels * (bits / 8)).toShort) // block align
    bb.putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize.toInt)
    bb.array()
  }
}
