package graft.rng

/** Random-access pseudorandom permutation over [0, n).
  *
  * The reference engine guarantees exact-cardinality "random unique" values
  * with a Galois LFSR over ceil(log2 n) bits that skips out-of-range states
  * (sdvg `internal/generator/usecase/general/generator/utils.go:105-167`).
  * An LFSR is inherently sequential (each value depends on the previous
  * state), which would force per-partition fast-forwarding — O(n) skip cost
  * and a serialization point at 100 TB scale.
  *
  * We instead use a cycle-walking Feistel network (format-preserving
  * encryption over an arbitrary domain [0, n), cf. Black & Rogaway, "Ciphers
  * with Arbitrary Finite Domains", CT-RSA 2002): O(1) random access from any
  * row index, no state, no shuffle, perfectly parallel. Semantics preserved:
  * for a fixed (seed, n) the map i -> permute(i) is a bijection on [0, n),
  * deterministic across runs/partitionings/cluster sizes. Bit-parity with the
  * reference's LFSR output is explicitly a non-goal (SURVEY §7).
  *
  * Expected cycle-walk iterations < 4 (domain is padded to the next even bit
  * width, at most 4x the target domain).
  */
object Permutation {

  private final val Rounds = 4

  /** Feistel round function: seed- and round-keyed avalanche of the half. */
  @inline private def roundF(seed: Long, round: Int, half: Long): Long =
    Rng.mix64(seed ^ (round.toLong * 0xa24baed4963ee407L) ^ half)

  /** Permute index i within [0, n) — a bijection for fixed (seed, n).
    * Static + stateless: called from whole-stage codegen via StaticInvoke. */
  def permute(i: Long, seed: Long, n: Long): Long = {
    if (n <= 1) return 0L
    // total bits, rounded up to even so the two Feistel halves are equal width
    var bits = 64 - java.lang.Long.numberOfLeadingZeros(n - 1)
    if ((bits & 1) == 1) bits += 1
    if (bits < 2) bits = 2
    val halfBits = bits / 2
    val halfMask = (1L << halfBits) - 1
    var x = i
    // cycle-walk: re-encrypt until the result lands back inside [0, n)
    do {
      var l = (x >>> halfBits) & halfMask
      var r = x & halfMask
      var round = 0
      while (round < Rounds) {
        val t = l ^ (roundF(seed, round, r) & halfMask)
        l = r
        r = t
        round += 1
      }
      x = (l << halfBits) | r
    } while (x >= n || x < 0)
    x
  }

  /** Inverse permutation (not used in generation; kept for tests/tooling). */
  def invert(y: Long, seed: Long, n: Long): Long = {
    if (n <= 1) return 0L
    var bits = 64 - java.lang.Long.numberOfLeadingZeros(n - 1)
    if ((bits & 1) == 1) bits += 1
    if (bits < 2) bits = 2
    val halfBits = bits / 2
    val halfMask = (1L << halfBits) - 1
    var x = y
    do {
      var l = (x >>> halfBits) & halfMask
      var r = x & halfMask
      var round = Rounds - 1
      while (round >= 0) {
        val t = r ^ (roundF(seed, round, l) & halfMask)
        r = l
        l = t
        round -= 1
      }
      x = (l << halfBits) | r
    } while (x >= n || x < 0)
    x
  }
}
