package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` columns, built from Spark's
  * codegen'd higher-order functions (no UDFs).
  *
  * Cross-engine determinism: floating-point SUMS are order-sensitive, so an
  * oracle comparing Spark vs another engine bit-for-bit would be flaky. We
  * therefore compute dot products in FIXED-POINT: each component is quantized
  * to round(x * 1e6) as a 64-bit integer (exact, order-independent integer
  * sums; 64 dims x (1e6)^2 products stay far below 2^63), and only the final
  * cosine division happens in floating point — a single deterministic IEEE
  * op. At 100 TB this also halves the bytes moving through the aggregation.
  */
object VectorFns {

  val Scale = 1e6

  /** array<numeric> -> array<long> fixed-point (floor(x*1e6 + 0.5) — an
    * unambiguous round-half-up, identical in any engine). Implemented as a
    * JITed static kernel (see [[Kernels]]); the interpreted HOF equivalent is
    * `transform(v, x => floor(x*1e6 + 0.5).cast("long"))`. */
  def quantize(v: Column): Column =
    Kernels.quantize(v.cast("array<double>"), "double")

  /** Exact integer dot product of two quantized vectors. */
  def dotQ(qa: Column, qb: Column): Column = Kernels.dotQ(qa, qb)

  /** Exact integer squared norm of a quantized vector. */
  def norm2Q(q: Column): Column = Kernels.norm2Q(q)

  /** Cosine similarity of two raw vectors via fixed-point inner products.
    * Deterministic across engines and partitionings. */
  def cosine(a: Column, b: Column): Column = {
    val qa = quantize(a)
    val qb = quantize(b)
    dotQ(qa, qb).cast("double") /
      (sqrt(norm2Q(qa).cast("double")) * sqrt(norm2Q(qb).cast("double")))
  }

  /** Cosine from pre-quantized vectors and pre-computed squared norms —
    * the form used in pairwise joins so norms are computed once per row,
    * not once per pair. */
  def cosinePre(qa: Column, na: Column, qb: Column, nb: Column): Column =
    Kernels.cosineQCol(qa, na, qb, nb)
}
