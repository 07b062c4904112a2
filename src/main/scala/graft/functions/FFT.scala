package graft.functions

/** In-house FFT: iterative radix-2 Cooley–Tukey for power-of-two lengths,
  * Bluestein's chirp-z transform for arbitrary lengths. Public-knowledge
  * algorithms (Cooley & Tukey 1965; Bluestein 1970); results match
  * `np.fft.fft`/`ifft` to double precision. Pure JVM functions so the
  * bandpass kernel ([[graft.operators.Filters.bandpass]]) runs inside an
  * executor task with no native deps.
  */
object FFT {

  /** In-place radix-2 DIT FFT; n must be a power of two. */
  private def fftPow2(re: Array[Double], im: Array[Double], invert: Boolean): Unit = {
    val n = re.length
    if (n <= 1) return
    // bit reversal
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = (if (invert) 2 else -2) * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val p = base + k; val q = base + k + len / 2
          val vr = re(q) * cr - im(q) * ci
          val vi = re(q) * ci + im(q) * cr
          re(q) = re(p) - vr; im(q) = im(p) - vi
          re(p) += vr; im(p) += vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  private def nextPow2(n: Int): Int = {
    var p = 1
    while (p < n) p <<= 1
    p
  }

  /** Forward (invert=false) or inverse (true, 1/n-normalized) DFT of a
    * complex signal of ANY length. Bluestein: DFT(x)[k] = conj-chirp
    * convolution, evaluated with power-of-two FFTs.
    */
  def transform(re: Array[Double], im: Array[Double], invert: Boolean): (Array[Double], Array[Double]) = {
    val n = re.length
    if (n == 0) return (re.clone(), im.clone())
    if ((n & (n - 1)) == 0) {
      val r = re.clone(); val i = im.clone()
      fftPow2(r, i, invert)
      if (invert) {
        var k = 0
        while (k < n) { r(k) /= n; i(k) /= n; k += 1 }
      }
      (r, i)
    } else {
      // Bluestein: chirp c[k] = exp(sign·iπk²/n); X[k] = c*[k] · Σ_j x[j]c*[j]c[k−j]
      val sign = if (invert) 1.0 else -1.0
      val m = nextPow2(2 * n + 1)
      val cr = new Array[Double](n); val ci = new Array[Double](n)
      var k = 0
      while (k < n) {
        // k² mod 2n avoids precision loss for large k
        val kk = (k.toLong * k) % (2L * n)
        val ang = sign * math.Pi * kk / n
        cr(k) = math.cos(ang); ci(k) = math.sin(ang)
        k += 1
      }
      val ar = new Array[Double](m); val ai = new Array[Double](m)
      k = 0
      while (k < n) {
        // a[k] = x[k] · c[k]
        ar(k) = re(k) * cr(k) - im(k) * ci(k)
        ai(k) = re(k) * ci(k) + im(k) * cr(k)
        k += 1
      }
      val br = new Array[Double](m); val bi = new Array[Double](m)
      k = 0
      while (k < n) {
        // b[k] = conj(c[k]), wrapped for negative indices
        br(k) = cr(k); bi(k) = -ci(k)
        if (k > 0) { br(m - k) = cr(k); bi(m - k) = -ci(k) }
        k += 1
      }
      fftPow2(ar, ai, invert = false)
      fftPow2(br, bi, invert = false)
      k = 0
      while (k < m) {
        val r2 = ar(k) * br(k) - ai(k) * bi(k)
        ai(k) = ar(k) * bi(k) + ai(k) * br(k)
        ar(k) = r2
        k += 1
      }
      fftPow2(ar, ai, invert = true)
      val outR = new Array[Double](n); val outI = new Array[Double](n)
      k = 0
      while (k < n) {
        val vr = ar(k) / m; val vi = ai(k) / m
        // X[k] = conv[k] · c[k]
        outR(k) = vr * cr(k) - vi * ci(k)
        outI(k) = vr * ci(k) + vi * cr(k)
        if (invert) { outR(k) /= n; outI(k) /= n }
        k += 1
      }
      (outR, outI)
    }
  }

  def fft(signal: Array[Double]): (Array[Double], Array[Double]) =
    transform(signal, new Array[Double](signal.length), invert = false)

  /** `np.fft.fftfreq(n, d=1/sampleRate)`: bin k maps to `k·sr/n` for
    * `k < ceil(n/2)`, else `(k−n)·sr/n`.
    */
  def binFreq(k: Int, n: Int, sampleRate: Double): Double = {
    val half = (n + 1) / 2
    if (k < half) k * sampleRate / n else (k - n) * sampleRate / n
  }

  /** FFT → zero bins outside `[low, high]` in |frequency| → real(IFFT);
    * reference `fdi_flow/preprocessing/filters.py:275-285`.
    */
  def bandpass(signal: Array[Double], low: Double, high: Double, sampleRate: Double): Array[Double] = {
    val n = signal.length
    if (n == 0) return signal.clone()
    val (fr, fi) = fft(signal)
    var k = 0
    while (k < n) {
      val f = math.abs(binFreq(k, n, sampleRate))
      if (f < low || f > high) { fr(k) = 0; fi(k) = 0 }
      k += 1
    }
    transform(fr, fi, invert = true)._1
  }
}
