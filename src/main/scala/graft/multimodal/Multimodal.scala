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

  /** 64-bit perceptual difference hash (dHash, Krawetz's public
    * kind-of-like-a-hash construction) of a decoded image: nearest-neighbor
    * resize of the first channel to a 9×8 grid, then one bit per
    * horizontal neighbor pair (`left > right`), packed row-major. Returned
    * as `struct(dhash_hi, dhash_lo)` — two 32-bit halves in `long`
    * columns so the value stays exactly representable on every engine
    * (a single 64-bit pack would need the sign bit; two unsigned halves
    * replay in plain integer SQL). Non-image payloads → null.
    *
    * Decode + resize + pack is a per-row imperative kernel (same
    * justification as [[decodeSamples]]); it stays a narrow projection so
    * the dedup shape around it — one hash shuffle on the hash value — is
    * unchanged at scale. Near-duplicate images differ in a few bits;
    * exact grouping on the pair catches re-encodes, and a banded
    * Hamming join (8 bands × 8 bits, complete for distance ≤ 7 by
    * pigeonhole — the SimHash band trick) catches the rest.
    */
  val dHash: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte]) =>
      Png.decode(bytes).map { img =>
        val w = img.width; val h = img.height; val ch = img.channels
        def px(r: Int, c: Int): Int =
          img.samples((r * h / 8) * w * ch + (c * w / 9) * ch)
        var hi = 0L; var lo = 0L
        var j = 0
        while (j < 64) {
          val r = j / 8; val c = j % 8
          if (px(r, c) > px(r, c + 1)) {
            if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
          }
          j += 1
        }
        (hi, lo)
      }.orNull
    }

  /** Box-filter (area-average) downsample of a decoded single-channel
    * row-major pixel array by integer factor `f`: each destination pixel
    * is the floor-mean of its f×f source block — the CLIP-preprocessing
    * resize shape with a deterministic integer kernel, so every output
    * value replays bit-for-bit in plain SQL (contrast [[resample]]'s
    * stride subsampling, which drops rather than averages). Pure HOF
    * expression past the decode — stays inside codegen, no UDF; the
    * sample array is let-bound via the single-element `transform(array)`
    * idiom so the (possibly UDF-decoded) input is evaluated once per
    * row, not once per output pixel.
    */
  def resizeBox(decoded: Column, srcW: Int, srcH: Int, f: Int): Column = {
    require(f > 0 && srcW % f == 0 && srcH % f == 0,
      s"factor must divide both dims: $srcW x $srcH by $f")
    val dw = srcW / f
    val dh = srcH / f
    element_at(
      transform(array(decoded), s =>
        transform(sequence(lit(0), lit(dh * dw - 1)), j => {
          val dr = floor(j / lit(dw)).cast("int")
          val dc = pmod(j, lit(dw)).cast("int")
          val blockSum = (for (rr <- 0 until f; cc <- 0 until f) yield
            element_at(s,
              ((dr * f + rr) * srcW + dc * f + cc + 1).cast("int"))
              .cast("long"))
            .reduce(_ + _)
          floor(blockSum / lit(f * f)).cast("long")
        })),
      1)
  }

  /** Fixed-length audio frame features over decoded samples: for each
    * complete `frameLen`-sample frame, `(frame_idx, sum_sq, n_zc,
    * sum_abs)` — energy (Σx²), zero crossings (adjacent pairs with
    * strictly negative product), and Σ|x|; integer-exact so the values
    * replay bit-for-bit in any SQL engine. A trailing partial frame is
    * dropped (the keras/librosa "valid" framing convention).
    *
    * Pure HOF expression — no UDF past the decode. Both the sample array
    * and each frame slice are let-bound via the single-element
    * `transform(array(…), v => …)` idiom so no outer expression is
    * re-evaluated per element (the round-9 quadratic-lambda lesson,
    * see [[graft.text.Quality]]'s header).
    */
  def frameFeatures(decoded: Column, frameLen: Int): Column = {
    require(frameLen > 1)
    element_at(
      transform(array(decoded), s =>
        when(size(s) >= frameLen,
          transform(sequence(lit(0), floor(size(s) / frameLen).cast("int") - 1),
            f => element_at(
              transform(array(slice(s, f * frameLen + 1, lit(frameLen))), fr =>
                struct(
                  f.cast("long").as("frame_idx"),
                  aggregate(fr, lit(0L),
                    (a, x) => a + x.cast("long") * x.cast("long")).as("sum_sq"),
                  aggregate(sequence(lit(1), lit(frameLen - 1)), lit(0L),
                    (a, i) => a + when(
                      element_at(fr, i) * element_at(fr, i + 1) < 0, 1L)
                      .otherwise(0L)).as("n_zc"),
                  aggregate(fr, lit(0L),
                    (a, x) => a + abs(x).cast("long")).as("sum_abs"))),
              1)))
          .otherwise(array().cast(
            "array<struct<frame_idx:bigint,sum_sq:bigint,n_zc:bigint,sum_abs:bigint>>"))),
      1)
  }

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
