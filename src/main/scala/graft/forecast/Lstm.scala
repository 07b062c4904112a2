package graft.forecast

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.HashRandom

/** Hand-built LSTM / Conv1D+LSTM forecaster — the reference's deep
  * `TimeSeriesPredictor` architectures (`forecasting/time_series_model.py:168-237`:
  * `lstm` = LSTM(units) → Dropout → Dense(out_steps); `convlstm` =
  * Conv1D(filters, 3, relu) → MaxPooling1D(2) → LSTM(units) → Dropout →
  * Dense(out_steps); MSE loss, Adam), re-expressed for Spark with no
  * deep-learning library: the forward pass and backpropagation-through-
  * time are written out longhand (Hochreiter & Schmidhuber 1997 LSTM
  * equations; Werbos 1990 BPTT), and training is data-parallel in the
  * exact shape MLlib's own optimizers use — the flat parameter vector is
  * broadcast each epoch, every partition accumulates gradient and loss
  * over its rows, `treeAggregate` reduces them, and the driver applies an
  * Adam step (Kingma & Ba 2015). Nothing about the data ever sits on the
  * driver: at 100 TB of windows each epoch is one gradient pass over the
  * cluster, parameters are O(model) not O(data) (~41k doubles at the
  * reference's H=100), and the tree reduction keeps the driver's inbound
  * traffic logarithmic in partitions.
  *
  * Determinism: initialization (glorot-uniform, unit forget-gate bias —
  * the keras defaults) and the per-(epoch, sample, unit) dropout masks
  * all come from the stateless [[HashRandom]], so a (seed, data) pair
  * reproduces bit-identical training on any cluster layout. Full-batch
  * gradients per epoch (not keras's shuffled mini-batches — a shuffle
  * order is not reproducible on a distributed corpus); with Adam this is
  * the standard deterministic data-parallel training shape.
  */
object DeepNet {

  /** Static architecture: `d` input features per LSTM step, `t` LSTM
    * steps, `h` hidden units, `os` output steps; `conv` adds the
    * Conv1D(filters,k)+MaxPool(pool) front end (then `d` = filters and
    * `t` = (rawT − k + 1) / pool).
    */
  case class Cfg(
      rawT: Int, h: Int, os: Int,
      conv: Boolean, filters: Int, k: Int, pool: Int) {
    val convT: Int = if (conv) rawT - k + 1 else 0
    val d: Int = if (conv) filters else 1
    val t: Int = if (conv) convT / pool else rawT
    require(t >= 1, s"window too short: rawT=$rawT k=$k pool=$pool leaves $t LSTM steps")
    // flat parameter layout offsets
    val offW = 0 // W: 4h × d (input kernel, gate order i,f,g,o)
    val offU: Int = offW + 4 * h * d // U: 4h × h (recurrent kernel)
    val offB: Int = offU + 4 * h * h // b: 4h
    val offWd: Int = offB + 4 * h // Wd: os × h (dense head)
    val offBd: Int = offWd + os * h // bd: os
    val offWc: Int = offBd + os // Wc: filters × k (conv kernel, 1 channel)
    val offBc: Int = offWc + (if (conv) filters * k else 0)
    val size: Int = offBc + (if (conv) filters else 0)
  }

  /** Glorot-uniform init from the hash stream; forget-gate bias 1.0
    * (keras `unit_forget_bias`), every other bias 0.
    */
  def init(cfg: Cfg, seed: Long): Array[Double] = {
    val p = new Array[Double](cfg.size)
    def glorot(off: Int, n: Int, fanIn: Int, fanOut: Int, stream: Long): Unit = {
      val lim = math.sqrt(6.0 / (fanIn + fanOut))
      var i = 0
      while (i < n) {
        p(off + i) = (2.0 * HashRandom.uniform(seed, stream, i.toLong) - 1.0) * lim
        i += 1
      }
    }
    glorot(cfg.offW, 4 * cfg.h * cfg.d, cfg.d, 4 * cfg.h, 1L)
    glorot(cfg.offU, 4 * cfg.h * cfg.h, cfg.h, 4 * cfg.h, 2L)
    glorot(cfg.offWd, cfg.os * cfg.h, cfg.h, cfg.os, 3L)
    if (cfg.conv) glorot(cfg.offWc, cfg.filters * cfg.k, cfg.k, cfg.filters, 4L)
    java.util.Arrays.fill(p, cfg.offB + cfg.h, cfg.offB + 2 * cfg.h, 1.0) // forget bias
    p
  }

  private def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  /** Forward pass only → predicted `os` values (inference: dropout off). */
  def predict(x: Array[Double], p: Array[Double], cfg: Cfg): Array[Double] = {
    val h = forwardHidden(x, p, cfg, null)
    val out = new Array[Double](cfg.os)
    var j = 0
    while (j < cfg.os) {
      var acc = p(cfg.offBd + j)
      var u = 0
      while (u < cfg.h) { acc += p(cfg.offWd + j * cfg.h + u) * h(u); u += 1 }
      out(j) = acc
      j += 1
    }
    out
  }

  /** Forward to the last hidden state; when `tape` is non-null the
    * per-step intermediates are recorded for backprop.
    */
  private def forwardHidden(
      x: Array[Double], p: Array[Double], cfg: Cfg, tape: Tape): Array[Double] = {
    // conv + pool front end (or the raw series as T×1 inputs)
    val xs: Array[Array[Double]] =
      if (!cfg.conv) Array.tabulate(cfg.t)(t => Array(x(t)))
      else {
        val a = Array.ofDim[Double](cfg.convT, cfg.filters)
        var t = 0
        while (t < cfg.convT) {
          var f = 0
          while (f < cfg.filters) {
            var acc = p(cfg.offBc + f)
            var j = 0
            while (j < cfg.k) { acc += p(cfg.offWc + f * cfg.k + j) * x(t + j); j += 1 }
            a(t)(f) = math.max(acc, 0.0) // relu
            f += 1
          }
          t += 1
        }
        if (tape != null) tape.convA = a
        val pooled = Array.ofDim[Double](cfg.t, cfg.filters)
        val amax = if (tape != null) Array.ofDim[Int](cfg.t, cfg.filters) else null
        var s = 0
        while (s < cfg.t) {
          var f = 0
          while (f < cfg.filters) {
            var best = a(s * cfg.pool)(f); var bi = s * cfg.pool
            var q = 1
            while (q < cfg.pool) {
              val v = a(s * cfg.pool + q)(f)
              if (v > best) { best = v; bi = s * cfg.pool + q }
              q += 1
            }
            pooled(s)(f) = best
            if (amax != null) amax(s)(f) = bi
            f += 1
          }
          s += 1
        }
        if (tape != null) tape.poolArg = amax
        pooled
      }
    if (tape != null) tape.xs = xs
    val H = cfg.h
    var hPrev = new Array[Double](H)
    var cPrev = new Array[Double](H)
    var t = 0
    while (t < cfg.t) {
      val xi = xs(t)
      val ig = new Array[Double](H); val fg = new Array[Double](H)
      val gg = new Array[Double](H); val og = new Array[Double](H)
      val cNew = new Array[Double](H); val tanhC = new Array[Double](H)
      val hNew = new Array[Double](H)
      var u = 0
      while (u < H) {
        // z = W x + U h_prev + b, four gate blocks at stride H
        var zi = p(cfg.offB + u); var zf = p(cfg.offB + H + u)
        var zg = p(cfg.offB + 2 * H + u); var zo = p(cfg.offB + 3 * H + u)
        var j = 0
        while (j < cfg.d) {
          val xv = xi(j)
          zi += p(cfg.offW + u * cfg.d + j) * xv
          zf += p(cfg.offW + (H + u) * cfg.d + j) * xv
          zg += p(cfg.offW + (2 * H + u) * cfg.d + j) * xv
          zo += p(cfg.offW + (3 * H + u) * cfg.d + j) * xv
          j += 1
        }
        var v = 0
        while (v < H) {
          val hv = hPrev(v)
          zi += p(cfg.offU + u * H + v) * hv
          zf += p(cfg.offU + (H + u) * H + v) * hv
          zg += p(cfg.offU + (2 * H + u) * H + v) * hv
          zo += p(cfg.offU + (3 * H + u) * H + v) * hv
          v += 1
        }
        ig(u) = sigmoid(zi); fg(u) = sigmoid(zf)
        gg(u) = math.tanh(zg); og(u) = sigmoid(zo)
        cNew(u) = fg(u) * cPrev(u) + ig(u) * gg(u)
        tanhC(u) = math.tanh(cNew(u))
        hNew(u) = og(u) * tanhC(u)
        u += 1
      }
      if (tape != null) {
        tape.i(t) = ig; tape.f(t) = fg; tape.g(t) = gg; tape.o(t) = og
        tape.c(t) = cNew; tape.tc(t) = tanhC; tape.hs(t) = hNew
      }
      hPrev = hNew; cPrev = cNew
      t += 1
    }
    hPrev
  }

  /** Per-sample intermediates for BPTT. */
  private final class Tape(cfg: Cfg) {
    var xs: Array[Array[Double]] = _
    var convA: Array[Array[Double]] = _
    var poolArg: Array[Array[Int]] = _
    val i = new Array[Array[Double]](cfg.t); val f = new Array[Array[Double]](cfg.t)
    val g = new Array[Array[Double]](cfg.t); val o = new Array[Array[Double]](cfg.t)
    val c = new Array[Array[Double]](cfg.t); val tc = new Array[Array[Double]](cfg.t)
    val hs = new Array[Array[Double]](cfg.t)
  }

  /** Forward + backward for one (window, targets) sample: returns the MSE
    * loss (mean over the `os` outputs, keras `mse`) and ADDS the gradient
    * into `grad` — callers accumulate many samples into one buffer, which
    * is what makes the partition-level `treeAggregate` cheap.
    * `mask` is the inverted-dropout mask on the last hidden state
    * (entries 0 or 1/(1−rate)); pass null for no dropout.
    */
  def forwardBackward(
      x: Array[Double], y: Array[Double], p: Array[Double], cfg: Cfg,
      mask: Array[Double], grad: Array[Double]): Double = {
    val tape = new Tape(cfg)
    val hLast = forwardHidden(x, p, cfg, tape)
    val H = cfg.h
    val hDrop = new Array[Double](H)
    var u = 0
    while (u < H) { hDrop(u) = if (mask == null) hLast(u) else hLast(u) * mask(u); u += 1 }
    // dense head + MSE
    var loss = 0.0
    val dY = new Array[Double](cfg.os)
    var j = 0
    while (j < cfg.os) {
      var acc = p(cfg.offBd + j)
      u = 0
      while (u < H) { acc += p(cfg.offWd + j * H + u) * hDrop(u); u += 1 }
      val e = acc - y(j)
      loss += e * e
      dY(j) = 2.0 * e / cfg.os
      j += 1
    }
    loss /= cfg.os
    val dH = new Array[Double](H)
    j = 0
    while (j < cfg.os) {
      val dyj = dY(j)
      grad(cfg.offBd + j) += dyj
      u = 0
      while (u < H) {
        grad(cfg.offWd + j * H + u) += dyj * hDrop(u)
        dH(u) += p(cfg.offWd + j * H + u) * dyj
        u += 1
      }
      j += 1
    }
    if (mask != null) { u = 0; while (u < H) { dH(u) *= mask(u); u += 1 } }
    // BPTT
    var dC = new Array[Double](H)
    var dHcur = dH
    val dXs = if (cfg.conv) Array.ofDim[Double](cfg.t, cfg.d) else null
    var t = cfg.t - 1
    while (t >= 0) {
      val ig = tape.i(t); val fg = tape.f(t); val gg = tape.g(t); val og = tape.o(t)
      val tc = tape.tc(t)
      val cPrev = if (t == 0) new Array[Double](H) else tape.c(t - 1)
      val hPrev = if (t == 0) new Array[Double](H) else tape.hs(t - 1)
      val xi = tape.xs(t)
      val dHnext = new Array[Double](H)
      val dCnext = new Array[Double](H)
      var uu = 0
      while (uu < H) {
        val dh = dHcur(uu)
        val dcTot = dC(uu) + dh * og(uu) * (1.0 - tc(uu) * tc(uu))
        val dzi = dcTot * gg(uu) * ig(uu) * (1.0 - ig(uu))
        val dzf = dcTot * cPrev(uu) * fg(uu) * (1.0 - fg(uu))
        val dzg = dcTot * ig(uu) * (1.0 - gg(uu) * gg(uu))
        val dzo = dh * tc(uu) * og(uu) * (1.0 - og(uu))
        grad(cfg.offB + uu) += dzi
        grad(cfg.offB + H + uu) += dzf
        grad(cfg.offB + 2 * H + uu) += dzg
        grad(cfg.offB + 3 * H + uu) += dzo
        var jj = 0
        while (jj < cfg.d) {
          val xv = xi(jj)
          grad(cfg.offW + uu * cfg.d + jj) += dzi * xv
          grad(cfg.offW + (H + uu) * cfg.d + jj) += dzf * xv
          grad(cfg.offW + (2 * H + uu) * cfg.d + jj) += dzg * xv
          grad(cfg.offW + (3 * H + uu) * cfg.d + jj) += dzo * xv
          if (dXs != null)
            dXs(t)(jj) += p(cfg.offW + uu * cfg.d + jj) * dzi +
              p(cfg.offW + (H + uu) * cfg.d + jj) * dzf +
              p(cfg.offW + (2 * H + uu) * cfg.d + jj) * dzg +
              p(cfg.offW + (3 * H + uu) * cfg.d + jj) * dzo
          jj += 1
        }
        var vv = 0
        while (vv < H) {
          val hv = hPrev(vv)
          grad(cfg.offU + uu * H + vv) += dzi * hv
          grad(cfg.offU + (H + uu) * H + vv) += dzf * hv
          grad(cfg.offU + (2 * H + uu) * H + vv) += dzg * hv
          grad(cfg.offU + (3 * H + uu) * H + vv) += dzo * hv
          dHnext(vv) += p(cfg.offU + uu * H + vv) * dzi +
            p(cfg.offU + (H + uu) * H + vv) * dzf +
            p(cfg.offU + (2 * H + uu) * H + vv) * dzg +
            p(cfg.offU + (3 * H + uu) * H + vv) * dzo
          vv += 1
        }
        dCnext(uu) = dcTot * fg(uu)
        uu += 1
      }
      dHcur = dHnext; dC = dCnext
      t -= 1
    }
    // conv + pool backward: route each pooled gradient to its argmax
    // position, gate by relu', accumulate the kernel gradient
    if (cfg.conv) {
      var s = 0
      while (s < cfg.t) {
        var f = 0
        while (f < cfg.filters) {
          val dv = dXs(s)(f)
          if (dv != 0.0) {
            val at = tape.poolArg(s)(f)
            if (tape.convA(at)(f) > 0.0) { // relu pass-through
              grad(cfg.offBc + f) += dv
              var jj = 0
              while (jj < cfg.k) {
                grad(cfg.offWc + f * cfg.k + jj) += dv * x(at + jj)
                jj += 1
              }
            }
          }
          f += 1
        }
        s += 1
      }
    }
    loss
  }
}

/** Driver-facing deep forecaster with the [[TimeSeriesForecaster]]
  * surface (`fit` / `predict` / `evaluate` over `x0..x{ts-1}` /
  * `y1..y{os}` window columns from [[Forecast.lagFeatures]]).
  * `modelType` ∈ {"lstm", "convlstm"} — the reference's two deep
  * architectures (`time_series_model.py:168-199`).
  */
class DeepForecaster(
    val timeSteps: Int = 50,
    val outputStep: Int = 1,
    val modelType: String = "lstm",
    val hidden: Int = 100,
    val filters: Int = 64,
    val kernelSize: Int = 3,
    val poolSize: Int = 2,
    val dropout: Double = 0.2,
    val epochs: Int = 100,
    val learningRate: Double = 0.01,
    val seed: Long = 7L) extends Serializable {

  require(modelType == "lstm" || modelType == "convlstm",
    s"unknown modelType $modelType (expected 'lstm' or 'convlstm')")
  require(dropout >= 0 && dropout < 1, s"dropout must be in [0,1), got $dropout")

  val cfg: DeepNet.Cfg = DeepNet.Cfg(
    rawT = timeSteps, h = hidden, os = outputStep,
    conv = modelType == "convlstm", filters = filters, k = kernelSize, pool = poolSize)

  private var params: Array[Double] = _
  /** Mean training loss per epoch (reference `history.history['loss']`). */
  var lossHistory: Vector[Double] = Vector.empty

  private val featCols = (0 until timeSteps).map(i => s"x$i")

  private def windows(df: DataFrame) = {
    val xArr = array(featCols.map(c => col(c).cast("double")): _*)
    val yArr = array((1 to outputStep).map(j => col(s"y$j").cast("double")): _*)
    df.select(xArr.as("__x"), yArr.as("__y"))
  }

  /** Distributed training: one `treeAggregate` gradient pass per epoch
    * over the cached window RDD, Adam on the driver. Small frames are
    * coalesced (same fit hygiene as the tree forecaster — per-epoch
    * stage-launch overhead dominates tiny fits at high parallelism).
    */
  def fit(train: DataFrame): this.type = {
    val spark = train.sparkSession
    val sc = spark.sparkContext
    val base = windows(train).rdd
      .map(r => (r.getSeq[Double](0).toArray, r.getSeq[Double](1).toArray))
      .zipWithIndex().map(_.swap)
    val n = base.count()
    require(n > 0, "no training windows")
    val data = (if (n <= graft.ml.FaultDetector.SmallFitRows) base.coalesce(4) else base)
      .cache()
    data.count() // materialize
    val size = cfg.size
    params = DeepNet.init(cfg, seed)
    // Adam state (Kingma & Ba 2015 defaults; lr is the one knob exposed)
    val m = new Array[Double](size); val v = new Array[Double](size)
    val b1 = 0.9; val b2 = 0.999; val eps = 1e-8
    val keep = 1.0 - dropout
    val cfgL = cfg; val seedL = seed; val dropL = dropout
    lossHistory = Vector.empty
    var epoch = 1
    var bc: Broadcast[Array[Double]] = null
    try {
      while (epoch <= epochs) {
        bc = sc.broadcast(params)
        val (gradSum, lossSum) = data.treeAggregate(
          (new Array[Double](size), 0.0))(
          seqOp = { case ((g, l), (idx, (x, y))) =>
            val mask =
              if (dropL == 0.0) null
              else Array.tabulate(cfgL.h) { u =>
                if (HashRandom.uniform(seedL, epoch.toLong * 0x9e3779b9L + idx, u.toLong) < keep)
                  1.0 / keep
                else 0.0
              }
            val loss = DeepNet.forwardBackward(x, y, bc.value, cfgL, mask, g)
            (g, l + loss)
          },
          combOp = { case ((g1, l1), (g2, l2)) =>
            var i = 0
            while (i < size) { g1(i) += g2(i); i += 1 }
            (g1, l1 + l2)
          })
        bc.destroy()
        bc = null
        val lr = learningRate
        val bc1 = 1.0 - math.pow(b1, epoch.toDouble)
        val bc2 = 1.0 - math.pow(b2, epoch.toDouble)
        var i = 0
        while (i < size) {
          val gi = gradSum(i) / n
          m(i) = b1 * m(i) + (1 - b1) * gi
          v(i) = b2 * v(i) + (1 - b2) * gi * gi
          params(i) -= lr * (m(i) / bc1) / (math.sqrt(v(i) / bc2) + eps)
          i += 1
        }
        lossHistory :+= lossSum / n
        epoch += 1
      }
    } finally {
      if (bc != null) bc.destroy()
      data.unpersist(blocking = false)
    }
    this
  }

  /** Fitted flat parameter vector (layout per [[DeepNet.Cfg]] offsets) —
    * bounded driver state (`cfg.size` doubles), exposed so the t4 oracle
    * can interpolate the weights as literals and replay the forward pass
    * in SQL (the x39/x40 fitted-state thunk device).
    */
  def fittedParams: Array[Double] = {
    require(params != null, "fit() before fittedParams")
    params.clone()
  }

  /** Adds `pred_y1..pred_y{os}` columns (dropout off at inference). */
  def predict(df: DataFrame): DataFrame = {
    require(params != null, "fit() before predict()")
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(params)
    val cfgL = cfg
    val predUdf = udf { xs: Seq[Double] => DeepNet.predict(xs.toArray, bc.value, cfgL).toSeq }
    val xArr = array(featCols.map(c => col(c).cast("double")): _*)
    val withP = df.withColumn("__pred", predUdf(xArr))
    (1 to outputStep).foldLeft(withP)((acc, j) =>
      acc.withColumn(s"pred_y$j", col("__pred").getItem(j - 1)))
      .drop("__pred")
  }

  /** Per-horizon RMSE — same surface as [[TimeSeriesForecaster.evaluate]]. */
  def evaluate(test: DataFrame): DataFrame = {
    val preds = predict(test)
    val exprs = (1 to outputStep).map(j =>
      sqrt(avg(pow(col(s"pred_y$j") - col(s"y$j"), 2))).as(s"rmse_y$j"))
    preds.agg(exprs.head, exprs.tail: _*)
  }
}
