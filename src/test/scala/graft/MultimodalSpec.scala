package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

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
}
