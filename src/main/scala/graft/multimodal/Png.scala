package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal pure-JVM PNG codec (RFC 2083 / W3C PNG spec): non-interlaced,
  * bit-depth 8, color types 0 (gray), 2 (RGB), 4 (gray+alpha) and
  * 6 (RGBA). Decode handles all five scanline filters (None/Sub/Up/
  * Average/Paeth); encode writes filter-0 scanlines with one zlib
  * stream — enough to round-trip real image payloads through the
  * multimodal pipeline without any native codec in the container.
  * Built from the public spec only; zlib via `java.util.zip`.
  */
object Png {

  /** Decoded image: `samples` is row-major, channel-interleaved, one
    * 0–255 int per sample (w × h × channels values).
    */
  final case class Image(width: Int, height: Int, channels: Int, samples: Array[Int])

  private val Magic: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1 // grayscale
    case 2 => 3 // RGB
    case 4 => 2 // gray + alpha
    case 6 => 4 // RGBA
    case _ => -1 // palette (3) and anything else unsupported
  }

  /** Decode a PNG byte payload; None when the bytes are not a PNG this
    * codec supports (bad magic/structure, palette, 16-bit, interlaced,
    * or a corrupt zlib stream).
    */
  def decode(bytes: Array[Byte]): Option[Image] = {
    if (bytes == null || bytes.length < 8) return None
    var i = 0
    while (i < 8) { if (bytes(i) != Magic(i)) return None; i += 1 }
    try {
      var off = 8
      var width = 0; var height = 0; var channels = -1
      var seenIhdr = false
      val idat = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done && off + 8 <= bytes.length) {
        val len = be32(bytes, off)
        if (len < 0 || off + 12 + len > bytes.length) return None
        val typ = new String(bytes, off + 4, 4, "US-ASCII")
        typ match {
          case "IHDR" =>
            if (len != 13) return None
            width = be32(bytes, off + 8)
            height = be32(bytes, off + 12)
            val bitDepth = bytes(off + 16) & 0xFF
            channels = channelsOf(bytes(off + 17) & 0xFF)
            val interlace = bytes(off + 20) & 0xFF
            if (bitDepth != 8 || channels < 0 || interlace != 0 ||
              width <= 0 || height <= 0) return None
            // wild-corpus guard: header-claimed dimensions drive the
            // allocation below, so a crafted 4-byte field must not be
            // able to demand gigabytes (64M samples ≈ a 4096×4096 RGBA)
            if (width.toLong * height * channels > MaxSamples) return None
            seenIhdr = true
          case "IDAT" => idat.write(bytes, off + 8, len)
          case "IEND" => done = true
          case _ => // ancillary chunk — skip
        }
        off += 12 + len
      }
      if (!seenIhdr || idat.size() == 0) return None
      val stride = width * channels // bytes per scanline (bit depth 8)
      val raw = inflate(idat.toByteArray, (stride + 1) * height)
      if (raw.length != (stride + 1) * height) return None
      // de-filter scanlines in place into the sample array
      val out = new Array[Int](stride * height)
      val bpp = channels
      var y = 0
      while (y < height) {
        val rowOff = y * (stride + 1)
        val filter = raw(rowOff) & 0xFF
        var x = 0
        while (x < stride) {
          val rawB = raw(rowOff + 1 + x) & 0xFF
          val left = if (x >= bpp) out(y * stride + x - bpp) else 0
          val up = if (y > 0) out((y - 1) * stride + x) else 0
          val upLeft = if (y > 0 && x >= bpp) out((y - 1) * stride + x - bpp) else 0
          val recon = filter match {
            case 0 => rawB
            case 1 => rawB + left
            case 2 => rawB + up
            case 3 => rawB + (left + up) / 2
            case 4 => rawB + paeth(left, up, upLeft)
            case _ => return None
          }
          out(y * stride + x) = recon & 0xFF
          x += 1
        }
        y += 1
      }
      Some(Image(width, height, channels, out))
    } catch { case _: Throwable => None } // incl. OOM from hostile payloads
  }

  /** Hard cap on header-claimed samples (w × h × channels) before any
    * allocation — decode of untrusted payloads must degrade to None,
    * never to an executor-killing multi-GB allocation.
    */
  val MaxSamples: Long = 64L * 1024 * 1024

  /** Paeth predictor (PNG spec §6.6). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def inflate(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(expected)
    val buf = new Array[Byte](8192)
    while (!inf.finished() && !inf.needsInput()) {
      val n = inf.inflate(buf)
      if (n == 0 && !inf.finished()) return out.toByteArray // truncated
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** Encode 8-bit samples (row-major, channel-interleaved, length
    * w × h × channels) as a minimal PNG: IHDR + one IDAT (filter-0
    * scanlines, default-level deflate) + IEND.
    */
  def encode(width: Int, height: Int, channels: Int, samples: Array[Int]): Array[Byte] = {
    require(Set(1, 2, 3, 4).contains(channels), s"unsupported channel count $channels")
    require(samples.length == width * height * channels, "samples length mismatch")
    val colorType = channels match { case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6 }
    val stride = width * channels
    val raw = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      raw(y * (stride + 1)) = 0 // filter type None
      var x = 0
      while (x < stride) {
        raw(y * (stride + 1) + 1 + x) = (samples(y * stride + x) & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    val ihdr = new Array[Byte](13)
    writeBe32(ihdr, 0, width); writeBe32(ihdr, 4, height)
    ihdr(8) = 8; ihdr(9) = colorType.toByte // bit depth, color type
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic, 0, Magic.length)
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", deflate(raw))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def writeBe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  private def writeChunk(
      out: java.io.ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    val len = new Array[Byte](4)
    writeBe32(len, 0, data.length)
    out.write(len, 0, 4)
    val typB = typ.getBytes("US-ASCII")
    out.write(typB, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(typB); crc.update(data)
    val crcB = new Array[Byte](4)
    writeBe32(crcB, 0, crc.getValue.toInt)
    out.write(crcB, 0, 4)
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 32)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }
}
