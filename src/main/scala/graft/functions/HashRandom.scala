package graft.functions

/** Stateless, splittable pseudo-randomness from the SplitMix64 finalizer
  * (public-domain mixing function; Steele, Lea & Flood, "Fast Splittable
  * Pseudorandom Number Generators", OOPSLA 2014). Every draw is a pure
  * function of (seed, stream, index) — no RNG state to carry across
  * executors, identical on every JVM, and any cell of a virtual random
  * matrix/tensor can be recomputed independently. This is the engine's
  * seeding discipline for Monte-Carlo sources (SURVEY §2.4) and random
  * projections.
  */
object HashRandom {
  val twoPi: Double = 2.0 * math.Pi

  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic U(0,1) from (seed, stream, index). */
  def uniform(seed: Long, stream: Long, index: Long): Double = {
    val h = mix(mix(mix(seed) ^ stream) ^ index)
    ((h >>> 11).toDouble + 0.5) / (1L << 53).toDouble
  }

  /** U(lo, hi). */
  def uniform(seed: Long, stream: Long, index: Long, lo: Double, hi: Double): Double =
    lo + uniform(seed, stream, index) * (hi - lo)

  /** Deterministic standard normal via Box–Muller on two hashed uniforms. */
  def gaussian(seed: Long, stream: Long, index: Long): Double = {
    val u1 = uniform(seed, stream, 2 * index)
    val u2 = uniform(seed, stream, 2 * index + 1)
    math.sqrt(-2.0 * math.log(u1)) * math.cos(twoPi * u2)
  }
}
