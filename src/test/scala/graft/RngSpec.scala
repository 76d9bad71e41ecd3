package graft

import graft.rng.{Permutation, Rng}
import org.scalatest.funsuite.AnyFunSuite

class RngSpec extends AnyFunSuite {

  test("randomDouble is deterministic and in [0,1)") {
    val seed = 1738591926070236604L
    (0L until 10000L).foreach { n =>
      val v = Rng.randomDouble(seed, n)
      assert(v >= 0.0 && v < 1.0)
      assert(v == Rng.randomDouble(seed, n))
    }
  }

  test("randomDouble is roughly uniform") {
    val seed = 42L
    val n = 100000
    val mean = (0 until n).map(i => Rng.randomDouble(seed, i.toLong)).sum / n
    assert(math.abs(mean - 0.5) < 0.01, s"mean $mean")
  }

  test("columnSeed depends on model and column names") {
    val a = Rng.columnSeed(1L, "user", "id")
    val b = Rng.columnSeed(1L, "user", "id2")
    val c = Rng.columnSeed(1L, "token", "id")
    assert(a != b || a != c) // SHA-1 byte sums rarely collide on these
    assert(a == Rng.columnSeed(1L, "user", "id"))
  }

  test("permutation is a bijection on [0,n) for assorted n") {
    for (n <- Seq(1L, 2L, 3L, 7L, 100L, 251L, 1000L, 65536L, 100003L)) {
      val seen = new java.util.BitSet(n.toInt)
      var i = 0L
      while (i < n) {
        val p = Permutation.permute(i, 0xdeadbeefL, n)
        assert(p >= 0 && p < n, s"out of range: $p for n=$n")
        assert(!seen.get(p.toInt), s"collision at $p for n=$n")
        seen.set(p.toInt)
        i += 1
      }
    }
  }

  test("permutation inverse round-trips") {
    val n = 12345L
    (0L until n).foreach { i =>
      val p = Permutation.permute(i, 99L, n)
      assert(Permutation.invert(p, 99L, n) == i)
    }
  }

  test("different seeds give different permutations") {
    val n = 1000L
    val a = (0L until n).map(Permutation.permute(_, 1L, n))
    val b = (0L until n).map(Permutation.permute(_, 2L, n))
    assert(a != b)
  }
}
