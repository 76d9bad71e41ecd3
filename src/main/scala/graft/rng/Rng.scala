package graft.rng

/** Deterministic, stateless randomness primitives.
  *
  * Re-implements (behaviorally, not bit-for-bit) the reference engine's
  * stateless hash RNG — sdvg `internal/generator/usecase/general/generator/utils.go:169-196`
  * (SplitMix64 finalizer + XorShift64 step mapped to [0,1)) — and the SHA-1
  * per-column seed derivation (`generator/generator.go:35-36`,
  * `common/utils.go:63`).
  *
  * Everything here is a pure function of its Long arguments, so it is safe to
  * call from any executor on any cluster topology: no broadcast state, no
  * partition-local seeding, identical results at any parallelism. This is the
  * bedrock of the engine's determinism contract (same seed => same data, on
  * 1 core or 1000 executors).
  */
object Rng {

  /** SplitMix64 finalizer (public domain, Steele et al.) — avalanches a Long. */
  @inline def mix64(zIn: Long): Long = {
    var z = zIn + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** xorshift64 step used as an extra scramble, mirroring the reference's
    * splitmix-then-xorshift pipeline. */
  @inline def xorshift64(xIn: Long): Long = {
    var x = xIn
    x ^= x << 13
    x ^= x >>> 7
    x ^= x << 17
    x
  }

  /** Stateless uniform double in [0, 1) from a seed+index pair.
    * ~1 ns/call; the workhorse behind null injection and value jitter.
    * Static method — invoked from codegen via StaticInvoke. */
  def randomDouble(seed: Long, n: Long): Double = {
    val h = xorshift64(mix64(seed + n))
    // top 53 bits -> [0,1)
    (h >>> 11) * 1.1102230246251565e-16 // 2^-53
  }

  /** Stateless uniform Long from a seed+index pair. */
  def randomLong(seed: Long, n: Long): Long = xorshift64(mix64(seed + n))

  /** Per-column seed: base seed + sum of the SHA-1 bytes of "model.column"
    * (behavior of sdvg `common/utils.go:63`: seed offset derived from the
    * column's fully-qualified name so each column draws an independent
    * stream while remaining reproducible from the single config seed). */
  def columnSeed(baseSeed: Long, modelName: String, columnName: String): Long = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    val digest = md.digest(s"$modelName.$columnName".getBytes("UTF-8"))
    var sum = 0L
    var i = 0
    while (i < digest.length) { sum += (digest(i) & 0xffL); i += 1 }
    baseSeed + sum
  }
}
