package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.BinaryType

/** Semi-join reduction with a Catalyst bloom filter — prune the 100 TB probe
  * side BEFORE its shuffle.
  *
  * A selective dim-side predicate (`orders WHERE priority='1-URGENT'`) makes
  * most fact rows dead on arrival, but a plain shuffle join still pays the
  * full fact scan + shuffle before dropping them. Catalyst's own
  * `InjectRuntimeFilter` solves this when its size thresholds fire (10 GB+
  * probe scans — i.e. in production, not at test SF); this operator is the
  * same plan shape made explicit and deterministic, using the same Catalyst
  * expressions (`BloomFilterAggregate` / `BloomFilterMightContain`, the ones
  * whole-stage codegen already knows):
  *
  *  1. one pass over the (already filtered, small) build side aggregates its
  *     join keys into a bloom filter — partial aggregation runs map-side, so
  *     the shuffle moves only partial sketches, and the merged filter is a
  *     single row of `numBits/8` bytes;
  *  2. the filter is embedded as a literal in a `might_contain` predicate on
  *     the probe side, which therefore drops ~(1-fpp) of non-matching rows at
  *     the SCAN, before the join shuffle — the predicate sits inside the
  *     scan's WholeStageCodegen span (PlanSpec pins it below the Exchange);
  *  3. the real join still runs, so bloom false positives are removed and the
  *     result is exact. The filter only shrinks the shuffle.
  *
  * Driver memory is `numBits/8` bytes regardless of fact size (default 8
  * bits/key ~ 1 MB per million build keys) — the identical cost any broadcast
  * join already accepts for the build side, paid here for an arbitrary-size
  * shuffle join's probe reduction.
  *
  * No reference counterpart (sdvg has no joins); this is the Spark-first
  * answer to "filter a huge fact table by a small key set".
  */
object BloomJoin {

  /** Aggregate `key` of `build` into a bloom filter sized for
    * `expectedKeys` distinct keys at ~`fpp` false-positive rate.
    * Returns the serialized filter (driver-held, literal-embeddable). */
  def keyBloom(build: DataFrame, key: Column, expectedKeys: Long, fpp: Double = 0.03): Array[Byte] = {
    // n bits for target fpp: n = -k * ln(fpp) / (ln 2)^2  (standard sizing,
    // same formula BloomFilter.optimalNumOfBits uses)
    val numBits = math.ceil(-expectedKeys * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(Bridge.expression(key))),
      Literal(expectedKeys), Literal(numBits)).toAggregateExpression()
    build.select(Bridge.column(agg)).head().getAs[Array[Byte]](0)
  }

  /** `probe` rows whose `key` might be in `bloom` (exact set ⊆ result). */
  def bloomPrune(probe: DataFrame, key: Column, bloom: Array[Byte]): DataFrame =
    probe.filter(Bridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(Bridge.expression(key))))))

  /** Inner join `probe ⋈ build` where the probe side is bloom-pruned before
    * its shuffle. Exact (false positives die in the join); `expectedKeys`
    * sizes the filter — pass the build side's key cardinality estimate. */
  def bloomPrunedJoin(
      probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      expectedKeys: Long, fpp: Double = 0.03): DataFrame = {
    val bloom = keyBloom(build, build(buildKey), expectedKeys, fpp)
    bloomPrune(probe, probe(probeKey), bloom)
      .join(build, probe(probeKey) === build(buildKey))
  }
}
