package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{Multimodal, Png, Wav}

class MultimodalSpec extends SparkSpec {

  private def bin(bytes: Array[Byte]) = {
    import spark.implicits._
    Seq(Tuple1(bytes)).toDF("content")
  }

  test("sniffModality recognizes public magic numbers") {
    import spark.implicits._
    val png = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, 1, 2, 3, 4)
    val jpg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte, 1, 2, 3, 4, 5, 6, 7, 8)
    val wav = "RIFF1234WAVEfmt ".getBytes("ASCII")
    val avi = "RIFF1234AVI LIST".getBytes("ASCII")
    val txt = "hello world!".getBytes("ASCII")
    val df = Seq(png, jpg, wav, avi, txt).zipWithIndex.map { case (b, i) => (i, b) }
      .toDF("id", "content")
    val got = df.select(col("id"), Multimodal.sniffModality(col("content")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got == Map(0 -> "image/png", 1 -> "image/jpeg", 2 -> "audio/wav",
      3 -> "video/avi", 4 -> "application/octet-stream"))
  }

  test("pixels decodes bytes to 0-255 ints (stub decode contract)") {
    val got = bin(Array[Byte](0, 1, 127, -128, -1))
      .select(Multimodal.pixels(col("content")).as("p"))
      .head().getSeq[Int](0)
    assert(got == Seq(0, 1, 127, 128, 255))
  }

  test("resample keeps every stride-th sample") {
    val got = bin((0 until 10).map(_.toByte).toArray)
      .select(Multimodal.resample(col("content"), 3).as("p"))
      .head().getSeq[Int](0)
    assert(got == Seq(0, 3, 6, 9))
  }

  test("frameSample chunks the payload and keeps every k-th frame") {
    val got = bin((0 until 10).map(_.toByte).toArray)
      .select(Multimodal.frameSample(col("content"), frameBytes = 4, every = 2).as("f"))
      .head().getSeq[Array[Byte]](0)
    // frames: [0-3], [4-7], [8-9]; every 2nd → frames 0 and 2
    assert(got.length == 2)
    assert(got(0).toSeq == (0 until 4).map(_.toByte))
    assert(got(1).toSeq == Seq(8.toByte, 9.toByte))
  }

  // ── real codecs ──

  test("Png round-trips gray, gray+alpha, RGB and RGBA samples") {
    for (channels <- Seq(1, 2, 3, 4)) {
      val w = 5; val h = 4
      val samples = Array.tabulate(w * h * channels)(i => (i * 37 + channels) % 256)
      val img = Png.decode(Png.encode(w, h, channels, samples))
        .getOrElse(fail(s"decode failed for channels=$channels"))
      assert(img.width == w && img.height == h && img.channels == channels)
      assert(img.samples.toSeq == samples.toSeq)
    }
  }

  /** Forward-apply a PNG scanline filter (spec §6) — the encoder side of
    * the de-filter paths, so decode must invert it exactly.
    */
  private def applyFilter(
      f: Int, row: Array[Int], prior: Array[Int], bpp: Int): Array[Byte] = {
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    row.indices.map { x =>
      val left = if (x >= bpp) row(x - bpp) else 0
      val up = prior(x)
      val upLeft = if (x >= bpp) prior(x - bpp) else 0
      val pred = f match {
        case 0 => 0
        case 1 => left
        case 2 => up
        case 3 => (left + up) / 2
        case 4 => paeth(left, up, upLeft)
      }
      ((row(x) - pred) & 0xFF).toByte
    }.toArray
  }

  test("Png.decode inverts all five scanline filters (None/Sub/Up/Average/Paeth)") {
    val w = 6; val h = 5; val channels = 2 // gray+alpha → bpp 2
    val stride = w * channels
    val samples = Array.tabulate(stride * h)(i => (i * 89 + 13) % 256)
    // build the filtered stream by hand: scanline y uses filter y % 5
    val raw = new java.io.ByteArrayOutputStream()
    var prior = Array.fill(stride)(0)
    for (y <- 0 until h) {
      val row = samples.slice(y * stride, (y + 1) * stride)
      raw.write(y % 5)
      raw.write(applyFilter(y % 5, row, prior, channels), 0, stride)
      prior = row
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw.toByteArray); deflater.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zout.write(buf, 0, deflater.deflate(buf))
    // chunks: magic + IHDR + IDAT + IEND with CRCs
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte), 0, 8)
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length), 0, 4)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb, 0, 4); out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(data)
      out.write(be32(crc.getValue.toInt), 0, 4)
    }
    val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, 4, 0, 0, 0) // depth 8, gray+alpha
    chunk("IHDR", ihdr); chunk("IDAT", zout.toByteArray); chunk("IEND", Array.emptyByteArray)
    val img = Png.decode(out.toByteArray).getOrElse(fail("decode failed"))
    assert(img.samples.toSeq == samples.toSeq)
  }

  test("Png.decode rejects non-PNG and unsupported layouts") {
    assert(Png.decode("not a png at all".getBytes("ASCII")).isEmpty)
    assert(Png.decode(Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47)).isEmpty)
    // valid magic, truncated chunks
    assert(Png.decode(Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, 0, 0)).isEmpty)
  }

  test("Png.decode refuses header-claimed giant allocations (wild-corpus guard)") {
    // a tiny payload whose IHDR claims 1e9 x 1e9 RGBA must return None
    // fast instead of attempting a multi-GB allocation
    def hostile(w: Int, h: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte), 0, 8)
      def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      def chunk(typ: String, data: Array[Byte]): Unit = {
        out.write(be32(data.length), 0, 4)
        val tb = typ.getBytes("US-ASCII")
        out.write(tb, 0, 4); out.write(data, 0, data.length)
        val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(data)
        out.write(be32(crc.getValue.toInt), 0, 4)
      }
      val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, 6, 0, 0, 0) // RGBA
      chunk("IHDR", ihdr)
      chunk("IDAT", Array[Byte](0x78, 0x9C.toByte, 3, 0, 0, 0, 0, 1)) // empty zlib
      chunk("IEND", Array.emptyByteArray)
      out.toByteArray
    }
    assert(Png.decode(hostile(1000000000, 1000000000)).isEmpty)
    assert(Png.decode(hostile(1 << 16, 1 << 16)).isEmpty) // 2^32 * 4 samples
    // at-cap stays decodable territory (structure check only — tiny IDAT
    // simply fails the length check, not the cap)
    assert(Png.MaxSamples == 64L * 1024 * 1024)
  }

  test("Wav.decode treats truncated PCM as undecodable") {
    val good = Wav.encodePcm16(8000, 1, Array(1, 2, 3, 4))
    // odd data-chunk length on a 16-bit stream: drop the last byte and
    // patch both RIFF and data sizes
    val odd = good.dropRight(1)
    odd(4) = (odd.length - 8).toByte // RIFF size (fits in one byte here)
    odd(40) = 7 // data length 8 -> 7
    assert(Wav.decode(odd).isEmpty)
    // stereo stream whose sample count is not a multiple of channels
    val stereo = Wav.encodePcm16(8000, 2, Array(1, 2, 3, 4))
    val cut = stereo.dropRight(2) // drops one 16-bit sample -> 3 % 2 != 0
    cut(4) = (cut.length - 8).toByte
    cut(40) = 6 // data length 8 -> 6
    assert(Wav.decode(cut).isEmpty)
    assert(Wav.decode(good).map(_.samples.toSeq).contains(Seq(1, 2, 3, 4)))
  }

  test("Wav round-trips 16-bit PCM including negative samples") {
    val samples = Array(-32768, -1024, -1, 0, 1, 999, 32767)
    val a = Wav.decode(Wav.encodePcm16(8000, 1, samples)).getOrElse(fail("decode failed"))
    assert(a.sampleRate == 8000 && a.channels == 1 && a.bitsPerSample == 16)
    assert(a.samples.toSeq == samples.toSeq)
  }

  test("Wav.decode reads 8-bit PCM and rejects non-PCM/non-WAV payloads") {
    // hand-built 8-bit mono WAV, 4 samples
    val data = Array[Byte](0, 127, -128, -1) // unsigned: 0,127,128,255
    val b = java.nio.ByteBuffer.allocate(44 + 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("ASCII")).putInt(36 + 4).put("WAVE".getBytes("ASCII"))
    b.put("fmt ".getBytes("ASCII")).putInt(16).putShort(1).putShort(1)
    b.putInt(4000).putInt(4000).putShort(1).putShort(8)
    b.put("data".getBytes("ASCII")).putInt(4).put(data)
    val a = Wav.decode(b.array()).getOrElse(fail("decode failed"))
    assert(a.bitsPerSample == 8 && a.samples.toSeq == Seq(0, 127, 128, 255))
    assert(Wav.decode("RIFFxxxxNOPE".getBytes("ASCII")).isEmpty)
    assert(Wav.decode("plain text".getBytes("ASCII")).isEmpty)
  }

  test("decodeSamples/decodeMeta: PNG pixels, WAV PCM, empty for opaque") {
    import spark.implicits._
    val pngPx = Array.tabulate(12)(i => (i * 7) % 256)
    val png = Png.encode(4, 3, 1, pngPx)
    val pcm = Array(-3, 0, 7, 2047, -2048)
    val wav = Wav.encodePcm16(16000, 1, pcm)
    val txt = "just text".getBytes("UTF-8")
    val df = Seq((0, png), (1, wav), (2, txt)).toDF("id", "content")
      .withColumn("s", Multimodal.decodeSamples(col("content")))
      .withColumn("m", Multimodal.decodeMeta(col("content")))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getSeq[Int](2) == pngPx.toSeq)
    assert(rows(1).getSeq[Int](2) == pcm.toSeq)
    assert(rows(2).getSeq[Int](2).isEmpty)
    val meta0 = rows(0).getStruct(3)
    assert(meta0.getString(0) == "image" && meta0.getInt(1) == 4 && meta0.getInt(2) == 3)
    val meta1 = rows(1).getStruct(3)
    assert(meta1.getString(0) == "audio" && meta1.getInt(4) == 16000 && meta1.getInt(6) == 5)
    assert(rows(2).getStruct(3).getString(0) == "opaque")
  }

  test("byteEntropy: uniform bytes have 8 bits, constant bytes 0 bits") {
    import spark.implicits._
    val uniform = (0 until 256).map(_.toByte).toArray
    val const = Array.fill[Byte](64)(7)
    val df = Seq(("u", uniform), ("c", const)).toDF("grp", "content")
    val got = Multimodal.byteEntropy(df, Seq("grp"), "content")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got("u")._1 == 256L)
    assert(math.abs(got("u")._2 - 8.0) < 1e-9)
    assert(got("c")._1 == 64L)
    assert(math.abs(got("c")._2 - 0.0) < 1e-9)
  }

  test("dHash packs the 9x8 resized horizontal-gradient bits; null for non-images") {
    import spark.implicits._
    // pixels in 11..185 so a +10 brightness shift below cannot clip or wrap
    val w = 8; val h = 6
    val px = Array.tabulate(w * h)(i => (i * 37 + 11) % 175 + 11)
    def expect(ps: Array[Int]): (Long, Long) = {
      def p(r: Int, c: Int): Int = ps((r * h / 8) * w + (c * w / 9))
      var hi = 0L; var lo = 0L
      for (j <- 0 until 64) {
        val r = j / 8; val c = j % 8
        if (p(r, c) > p(r, c + 1)) {
          if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
        }
      }
      (hi, lo)
    }
    val wav = Wav.encodePcm16(8000, 1, Array(1, -2, 3))
    val df = Seq((0, Png.encode(w, h, 1, px)),
      (1, Png.encode(w, h, 1, px.map(_ + 10))), // brighter copy, same gradients
      (2, wav)).toDF("id", "content")
    val rows = df.select(col("id"), Multimodal.dHash(col("content")).as("h"))
      .orderBy("id").collect()
    val g0 = rows(0).getStruct(1)
    assert((g0.getLong(0), g0.getLong(1)) == expect(px))
    // the perceptual property: uniform brightness shift → identical hash
    assert(rows(1).getStruct(1) == g0)
    assert(rows(2).isNullAt(1))
  }

  test("dHash on RGB uses the first channel and matches the gray equivalent") {
    import spark.implicits._
    val w = 8; val h = 6
    val gray = Array.tabulate(w * h)(i => (i * 53 + 7) % 256)
    // RGB image whose R channel equals the gray image (G/B arbitrary)
    val rgb = gray.flatMap(v => Array(v, (v + 91) % 256, (v * 3) % 256))
    val df = Seq((0, Png.encode(w, h, 1, gray)), (1, Png.encode(w, h, 3, rgb)))
      .toDF("id", "content")
    val rows = df.select(col("id"), Multimodal.dHash(col("content")).as("h"))
      .orderBy("id").collect()
    assert(rows(0).getStruct(1) == rows(1).getStruct(1))
  }

  test("frameFeatures: per-frame energy/zero-crossings/abs, partial frame dropped") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq(1, -2, 3, -4, 9)), Tuple1(Seq(5)), Tuple1(Seq.empty[Int]))
      .toDF("s")
    val got = df.select(Multimodal.frameFeatures(col("s"), 2).as("f"))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0))
    assert(got(0).map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))) ==
      Seq((0L, 5L, 1L, 3L), (1L, 25L, 1L, 7L)))
    assert(got(1).isEmpty && got(2).isEmpty)
  }

  test("resizeBox floor-means each f x f block in row-major order") {
    import spark.implicits._
    // 4x2 gray, f=2 -> 2x1: [ (1+2+5+6)//4, (3+4+7+8)//4 ] = [3, 5]
    val df = Seq(Seq(1, 2, 3, 4, 5, 6, 7, 8)).toDF("px")
    val got = df.select(Multimodal.resizeBox(col("px"), 4, 2, 2).as("s"))
      .head().getSeq[Long](0)
    assert(got == Seq(3L, 5L), s"got $got")
    // decode -> resize on a real PNG matches the brute-force kernel
    val samples = Array.tabulate(48)(i => (7 * i + 3) % 256)
    val png = Png.encode(8, 6, 1, samples)
    val small = Seq(png).toDF("b")
      .select(Multimodal.resizeBox(
        Multimodal.decodeSamples(col("b")), 8, 6, 2).as("s"))
      .head().getSeq[Long](0)
    val want = for (r <- 0 until 3; c <- 0 until 4) yield
      (samples(2 * r * 8 + 2 * c) + samples(2 * r * 8 + 2 * c + 1) +
        samples((2 * r + 1) * 8 + 2 * c) + samples((2 * r + 1) * 8 + 2 * c + 1)) / 4
    assert(small == want.map(_.toLong), s"got $small want $want")
  }
}
