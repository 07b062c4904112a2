package graft.multimodal

/** Minimal pure-JVM RIFF/WAVE PCM codec: decode parses the `fmt ` and
  * `data` chunks and extracts integer PCM samples (8-bit unsigned or
  * 16-bit signed little-endian, any channel count — samples come back
  * frame-interleaved exactly as stored); encode writes canonical 44-byte
  * header mono/stereo PCM. Built from the public RIFF/WAVE layout only.
  */
object Wav {

  /** Decoded audio: `samples` holds raw PCM values (0–255 for 8-bit,
    * −32768–32767 for 16-bit), channel-interleaved.
    */
  final case class Audio(sampleRate: Int, channels: Int, bitsPerSample: Int, samples: Array[Int])

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  /** Decode a WAV byte payload; None when not an uncompressed-PCM WAVE
    * this codec supports.
    */
  def decode(bytes: Array[Byte]): Option[Audio] = {
    if (bytes == null || bytes.length < 12) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'))
      return None
    try {
      var off = 12
      var sampleRate = 0; var channels = 0; var bits = 0
      var fmtSeen = false
      var data: Option[(Int, Int)] = None // (offset, length)
      while (off + 8 <= bytes.length) {
        val id = new String(bytes, off, 4, "US-ASCII")
        val len = le32(bytes, off + 4)
        if (len < 0 || off + 8 + len > bytes.length) return None
        id match {
          case "fmt " =>
            if (len < 16) return None
            val audioFormat = le16(bytes, off + 8)
            if (audioFormat != 1) return None // PCM only
            channels = le16(bytes, off + 10)
            sampleRate = le32(bytes, off + 12)
            bits = le16(bytes, off + 22)
            if (channels <= 0 || (bits != 8 && bits != 16)) return None
            fmtSeen = true
          case "data" => if (data.isEmpty) data = Some((off + 8, len))
          case _ => // LIST/fact/... — skip
        }
        off += 8 + len + (len & 1) // chunks are word-aligned
      }
      if (!fmtSeen || data.isEmpty) return None
      val (dOff, dLen) = data.get
      // truncated PCM is undecodable, not silently-short: a 16-bit data
      // chunk with an odd byte length, or a sample count that doesn't
      // fill whole frames, means the payload was cut mid-sample/frame
      if (bits == 16 && (dLen & 1) != 0) return None
      val samples =
        if (bits == 8) Array.tabulate(dLen)(i => bytes(dOff + i) & 0xFF)
        else Array.tabulate(dLen / 2)(i => le16(bytes, dOff + 2 * i).toShort.toInt)
      if (samples.length % channels != 0) return None
      Some(Audio(sampleRate, channels, bits, samples))
    } catch { case _: Exception => None }
  }

  /** Encode channel-interleaved 16-bit signed PCM samples as a canonical
    * RIFF/WAVE file.
    */
  def encodePcm16(sampleRate: Int, channels: Int, samples: Array[Int]): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0)
    val dataLen = samples.length * 2
    val b = new Array[Byte](44 + dataLen)
    def putStr(off: Int, s: String): Unit = {
      val sb = s.getBytes("US-ASCII"); System.arraycopy(sb, 0, b, off, sb.length)
    }
    def putLe32(off: Int, v: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
      b(off + 2) = (v >>> 16).toByte; b(off + 3) = (v >>> 24).toByte
    }
    def putLe16(off: Int, v: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
    }
    putStr(0, "RIFF"); putLe32(4, 36 + dataLen); putStr(8, "WAVE")
    putStr(12, "fmt "); putLe32(16, 16); putLe16(20, 1) // PCM
    putLe16(22, channels); putLe32(24, sampleRate)
    putLe32(28, sampleRate * channels * 2) // byte rate
    putLe16(32, channels * 2); putLe16(34, 16) // block align, bits
    putStr(36, "data"); putLe32(40, dataLen)
    var i = 0
    while (i < samples.length) {
      putLe16(44 + 2 * i, samples(i) & 0xFFFF)
      i += 1
    }
    b
  }
}
