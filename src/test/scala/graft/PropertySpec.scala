package graft

import graft.operators.{Behavior, Sketches}

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based tests (scalacheck) for the pure driver-side algebra the
  * distributed operators rely on: sketch state must be a commutative,
  * associative, idempotent monoid or map-side partial aggregation silently
  * produces partition-count-dependent results; decay tables must be
  * monotone or recency weighting inverts. No SparkSession — these run in
  * milliseconds. */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: $res")
  }

  private val hash40Gen = Gen.chooseNum(0L, (1L << 40) - 1)
  private val hashesGen = Gen.listOfN(60, hash40Gen)

  private def sketchOf(hs: List[Long]): Array[Long] = {
    val agg = new Sketches.HllRegisterAgg
    hs.foldLeft(agg.zero)((b, h) => agg.reduce(b, h))
  }

  test("HLL registers: order-independent reduce (the map-side-combine contract)") {
    check("order-independence", Prop.forAll(hashesGen, Gen.long) { (hs, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(hs)
      sketchOf(hs).toSeq == sketchOf(shuffled).toSeq
    })
  }

  test("HLL registers: merge is commutative, associative, idempotent, zero-identity") {
    val agg = new Sketches.HllRegisterAgg
    def m(a: Array[Long], b: Array[Long]) = agg.merge(a.clone(), b.clone())
    check("merge-laws", Prop.forAll(hashesGen, hashesGen, hashesGen) { (xs, ys, zs) =>
      val (a, b, c) = (sketchOf(xs), sketchOf(ys), sketchOf(zs))
      m(a, b).toSeq == m(b, a).toSeq &&
        m(m(a, b), c).toSeq == m(a, m(b, c)).toSeq &&
        m(a, a).toSeq == a.toSeq &&
        m(a, agg.zero).toSeq == a.toSeq
    })
    // split-merge == direct: the exact property partial aggregation needs
    check("split-merge", Prop.forAll(hashesGen, Gen.chooseNum(0, 60)) { (hs, cut) =>
      val (l, r) = hs.splitAt(math.min(cut, hs.length))
      m(sketchOf(l), sketchOf(r)).toSeq == sketchOf(hs).toSeq
    })
  }

  test("KMV: reduce/merge equal the naive k-smallest-distinct reference") {
    val k = 8
    val agg = new Sketches.KMinValues(k)
    val valsGen = Gen.listOf(Gen.chooseNum(Long.MinValue + 1, Long.MaxValue))
    check("kmv-reference", Prop.forAll(valsGen, Gen.chooseNum(0, 1000)) { (vs, cut) =>
      val (l, r) = vs.splitAt(math.min(cut, vs.length))
      val direct = vs.foldLeft(agg.zero)(agg.reduce)
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      val naive = vs.distinct.sorted.take(k)
      direct.toSeq == naive && merged.toSeq == naive
    })
  }

  test("decay weights: bounded, monotone non-increasing, exact at whole half-lives") {
    val hlGen = Gen.chooseNum(1, 60)
    check("decay", Prop.forAll(hlGen, Gen.chooseNum(1, 365)) { (hl, maxAge) =>
      val w = Behavior.decayWeights(hl.toDouble, maxAge)
      // the derived table length must always END at a zero weight — the
      // age-clamp soundness invariant decayedValue's default relies on
      val derived = Behavior.decayWeights(hl.toDouble, Behavior.defaultMaxAge(hl.toDouble))
      w.length == maxAge + 1 &&
        w(0) == 1000000000L &&
        w.forall(x => x >= 0 && x <= 1000000000L) &&
        w.sliding(2).forall(p => p.length < 2 || p(1) <= p(0)) &&
        (maxAge < hl || w(hl) == 500000000L) &&
        derived.last == 0L
    })
  }
}
