package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal payload surface: image/audio/video as opaque `binary`
  * columns with typed metadata, per the LLM-training-pipeline brief.
  * Modality sniffing, byte statistics, entropy features, stride resize
  * and frame sampling are codegen-friendly Spark on the binary column;
  * [[decodeSamples]]/[[decodeMeta]] REALLY decode PNG images
  * ([[Png]]: zlib inflate + scanline de-filter) and WAV PCM audio
  * ([[Wav]]) into sample arrays — no native codec needed. Formats
  * beyond those two (JPEG/GIF/MP3/AVI) decode to empty with their
  * sniffed modality preserved; [[pixels]] remains the raw-byte
  * reinterpretation used by the entropy/histogram features.
  *
  * Scale shape: all per-payload ops are narrow projections (no shuffle);
  * the histogram/entropy features explode to (id, byte) rows and hash-agg
  * with map-side partials — the same explode→agg pattern as the MinHash
  * kernel, which is what survives wide corpora.
  */
object Multimodal {

  /** Decoded samples as `array<int>`: PNG → row-major channel-interleaved
    * 0–255 pixels, WAV → raw PCM values, anything else → empty. Decoding
    * (inflate, de-filter) is an inherently imperative per-row kernel — the
    * one place a UDF beats an expression tree; it stays a narrow
    * projection, so the plan shape (no shuffle, pushdown intact around it)
    * is unchanged at any scale.
    */
  val decodeSamples: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte]) =>
      Png.decode(bytes).map(_.samples.toSeq)
        .orElse(Wav.decode(bytes).map(_.samples.toSeq))
        .getOrElse(Seq.empty[Int])
    }

  /** Typed payload metadata struct:
    * `(kind, width, height, channels, sample_rate, bits, n_samples)` —
    * dimensions for images, rate/bit-depth for audio, zeros for payloads
    * neither codec accepts.
    */
  val decodeMeta: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte]) =>
      Png.decode(bytes) match {
        case Some(img) =>
          ("image", img.width, img.height, img.channels, 0, 8, img.samples.length)
        case None => Wav.decode(bytes) match {
          case Some(a) =>
            ("audio", 0, 0, a.channels, a.sampleRate, a.bitsPerSample, a.samples.length)
          case None => ("opaque", 0, 0, 0, 0, 0, 0)
        }
      }
    }

  /** Modality sniffing from public magic numbers (PNG 89-50-4E-47,
    * JPEG FF-D8-FF, RIFF/WAVE, RIFF/AVI, GIF87a/89a, MP3 ID3/FFFB).
    */
  def sniffModality(content: Column): Column = {
    val h = hex(substring(content, 1, 12))
    when(h.startsWith("89504E47"), lit("image/png"))
      .when(h.startsWith("FFD8FF"), lit("image/jpeg"))
      .when(h.startsWith("474946383761") || h.startsWith("474946383961"), lit("image/gif"))
      .when(h.startsWith("52494646") && substring(h, 17, 8) === "57415645", lit("audio/wav"))
      .when(h.startsWith("52494646") && substring(h, 17, 8) === "41564920", lit("video/avi"))
      .when(h.startsWith("494433") || h.startsWith("FFFB"), lit("audio/mpeg"))
      .otherwise(lit("application/octet-stream"))
  }

  /** Raw-byte reinterpretation: the payload's bytes as an `array<int>` of
    * 0–255 values — the format-agnostic view behind the histogram/entropy
    * features (which deliberately see the container bytes, not decoded
    * samples). For format-aware decoding use [[decodeSamples]].
    */
  def pixels(content: Column): Column =
    element_at(
      transform(array(hex(content)), h =>
        transform(sequence(lit(1), (length(h) / 2).cast("int")),
          i => conv(substring(h, i * 2 - 1, lit(2)), 16, 10).cast("int"))),
      1)

  /** Deterministic stride resize of the decoded samples: every `stride`-th
    * sample (a real resize kernel would interpolate; the plumbing —
    * bounded output size, pure projection — is identical).
    */
  def resample(content: Column, stride: Int): Column = {
    require(stride > 0)
    filter(pixels(content), (_, i) => i % stride === 0)
  }

  /** Frame sampling: split the payload into fixed-size frames and keep
    * every `every`-th frame (video keyframe-sampling shape). Returns
    * `array<binary>`.
    */
  def frameSample(content: Column, frameBytes: Int, every: Int): Column = {
    require(frameBytes > 0 && every > 0)
    val nFrames = ceil(length(content).cast("double") / frameBytes).cast("int")
    element_at(
      transform(array(content), c =>
        transform(
          filter(sequence(lit(0), greatest(nFrames - 1, lit(0))), f => f % every === 0),
          f => substring(c, f * frameBytes + 1, lit(frameBytes)))),
      1)
  }

  /** Byte-value rows `(idCol, __byte)` — the exploded form behind
    * histogram/entropy features.
    */
  def explodeBytes(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    graft.Tables.spread(df)
      .select(col(idCol).as("__id"), explode(pixels(col(contentCol))).as("__byte"))

  /** Per-group byte histogram: `(groupCols*, byte, cnt)`. Byte explosion
    * multiplies rows by payload size — spread a single-split input first
    * so the explode+partial-agg doesn't run in one task.
    */
  def byteHistogram(df: DataFrame, groupCols: Seq[String], contentCol: String): DataFrame =
    graft.Tables.spread(df)
      .select(groupCols.map(col) :+ explode(pixels(col(contentCol))).as("byte"): _*)
      .groupBy(groupCols.map(col) :+ col("byte"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Per-group Shannon entropy (bits/byte) of the byte distribution plus
    * payload totals — the "feature extraction" step of the stub pipeline.
    * Two hash aggregations (histogram, then entropy over ≤256 rows per
    * group) with a window for the group totals in between.
    */
  def byteEntropy(df: DataFrame, groupCols: Seq[String], contentCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCols.map(col): _*)
    byteHistogram(df, groupCols, contentCol)
      .withColumn("__p", col("cnt") / sum(col("cnt")).over(w))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("cnt")).as("total_bytes"),
        (-sum(col("__p") * log2(col("__p")))).as("entropy_bits"))
  }
}
