package graft

import org.scalatest.funsuite.AnyFunSuite

/** The perf self-gate: an injected slowdown against a committed floor file
  * must surface as a regression (CI-style failure when enforcement is on);
  * noise inside the 2x band must not. */
class BenchGateSpec extends AnyFunSuite {

  test("regressions flags >2x minima and only those") {
    val floors = Map("q1" -> 1.0, "q2" -> 0.5, "q3" -> 2.0, "gone" -> 1.0)
    val current = Map(
      "q1" -> 2.5, // 2.5x — regression
      "q2" -> 0.9, // 1.8x — inside the documented noise band
      "q3" -> 2.0, // 1.0x — flat
      "new" -> 9.9) // no floor — never flagged
    val regs = Bench.regressions(current, floors)
    assert(regs.size == 1 && regs.head.startsWith("q1:"), regs.toString)
  }

  test("regressions honors a custom factor and zero/absent floors") {
    val regs = Bench.regressions(Map("q" -> 1.6), Map("q" -> 1.0), factor = 1.5)
    assert(regs.size == 1)
    assert(Bench.regressions(Map("q" -> 100.0), Map("q" -> 0.0)).isEmpty,
      "a zero floor must not divide-by-zero into a false positive")
  }

  test("regressions normalizes away uniform box-contention inflation at suite scale") {
    // 30 cells all ~2.4x slower (loaded box) + one genuinely 8x slower:
    // only the true regression survives the median normalization
    val floors = (1 to 30).map(i => s"q$i" -> 1.0).toMap + ("bad" -> 1.0)
    val uniform = (1 to 30).map(i => s"q$i" -> 2.4).toMap + ("bad" -> 8.0)
    val regs = Bench.regressions(uniform, floors)
    assert(regs.size == 1 && regs.head.startsWith("bad:"), regs.toString)
    // on a quiet run (median ~1x) the plain 2x gate still applies
    val quiet = (1 to 30).map(i => s"q$i" -> 1.0).toMap + ("bad" -> 2.5)
    val regsQuiet = Bench.regressions(quiet, floors)
    assert(regsQuiet.size == 1 && regsQuiet.head.startsWith("bad:"), regsQuiet.toString)
    // below the population gate (<20 cells) no normalization happens: a
    // half-regressed tiny set cannot mask itself
    val tiny = Bench.regressions(Map("a" -> 2.5, "b" -> 2.5), Map("a" -> 1.0, "b" -> 1.0))
    assert(tiny.size == 2, tiny.toString)
  }

  test("missingQueries flags both unbenched queries and stale bench keys") {
    val diff = Bench.missingQueries(Set("a", "b", "gone"), Set("a", "b", "new"))
    assert(diff == Seq("unbenched: new", "benched but gone: gone"), diff.toString)
    assert(Bench.missingQueries(Set("a"), Set("a")).isEmpty)
  }

  test("committed bench archive covers every SparkEntry query (bench/queries parity)") {
    // the r7 lesson: emb_meanpool landed after the final bench run and had
    // no r7 cell. This test makes that state fail `sbt test`: after adding
    // a query, re-run Bench (writes bench_full_latest.json) before shipping.
    // prefer the machine-local latest record (gitignored); fall back to the
    // newest COMMITTED per-round archive so the guard also fires on a fresh
    // checkout instead of assume-skipping
    val latest = java.nio.file.Paths.get("bench_full_latest.json")
    val p =
      if (java.nio.file.Files.exists(latest)) latest
      else {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.list(java.nio.file.Paths.get(".")).iterator().asScala
          .filter(_.getFileName.toString.matches("bench_full_r\\d+\\.json"))
          // sort by ROUND NUMBER: lexicographic order puts r10 before r8
          .toSeq.sortBy(p =>
            p.getFileName.toString.replaceAll("\\D", "").toInt).lastOption.orNull
      }
    assume(p != null, "no bench archive yet — first round")
    val benched = Bench.parseFloors(
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8")).keySet
    val diff = Bench.missingQueries(benched, SparkEntry.queries.keySet)
    assert(diff.isEmpty,
      s"bench archive and SparkEntry.queries diverge — re-run graft.Bench:\n${diff.mkString("\n")}")
  }

  test("genRegressions flags >2x rows/s drops and only those (higher-is-better)") {
    val floors = Map("gen_a" -> 1000000.0, "gen_b" -> 1000000.0, "gen_c" -> 1000000.0)
    val rates = Map(
      "gen_a" -> 400000.0, // 2.5x drop — regression
      "gen_b" -> 600000.0, // 1.7x drop — noise band
      "gen_new" -> 1.0) // no floor — never flagged
    val regs = Bench.genRegressions(rates, floors)
    assert(regs.size == 1 && regs.head.startsWith("gen_a:"), regs.toString)
    // inflation relaxes the gate the same way query cells do
    assert(Bench.genRegressions(rates, floors, inflation = 1.5).isEmpty)
    assert(Bench.genRegressions(Map("g" -> 1.0), Map("g" -> 0.0)).isEmpty,
      "a zero floor must not flag")
  }

  test("parseGenFloors reads the generator_rows_per_sec block") {
    val json = """{"queries":{"q1":1.0},"generator_rows_per_sec":{"gen_text":311020,"gen_uuid":9618840}}"""
    assert(Bench.parseGenFloors(json) ==
      Map("gen_text" -> 311020.0, "gen_uuid" -> 9618840.0))
    assert(Bench.parseGenFloors("""{"queries":{"q":1}}""").isEmpty)
  }

  test("committed floors file carries generator floors (gen gate is live)") {
    val p = java.nio.file.Paths.get("bench_floors.json")
    assume(java.nio.file.Files.exists(p))
    val gf = Bench.parseGenFloors(
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
    val missing = Bench.genCells.map(_._1).filterNot(gf.contains)
    assert(missing.isEmpty, s"generator cells without floors: $missing")
  }

  test("microBenchConfirm with no flagged cells spawns nothing") {
    assert(Bench.microBenchConfirm(Nil, "/tmp").isEmpty)
  }

  test("parseFloors reads the bench_full record's per-query minima") {
    val json = """{"metric":"total_query_secs","value":3.0,"unit":"sec",
      |"queries":{"q1":1.25,"q2":0.75},"sf":"/x"}""".stripMargin
    assert(Bench.parseFloors(json) == Map("q1" -> 1.25, "q2" -> 0.75))
    assert(Bench.parseFloors("""{"no_queries":1}""").isEmpty)
  }
}
