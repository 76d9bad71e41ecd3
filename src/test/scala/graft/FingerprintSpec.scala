package graft

/** Input-fingerprint self-protection: the gate must refuse epoch-drifted
  * fixtures (the round-8 silent-garbage class) and pass the live ones. */
class FingerprintSpec extends SparkSuite {

  test("live fixtures fingerprint clean and the events unit branch is reported") {
    val fps = Fingerprints.report(spark, "/root/testdata/sf0.001")
    assert(fps.nonEmpty)
    val ev = fps.find(_.table == "events").get
    assert(ev.rows > 0)
    val ts = ev.cols.find(_.name == "ts").get
    assert(ts.min.take(4).toInt >= 1990 && ts.max.take(4).toInt < 2100)
  }

  test("existence probe goes through Hadoop FS: file:-scheme paths work and an empty dir fails loudly") {
    // A URI-scheme path java.io.File cannot see — must still fingerprint,
    // because the probe rides the same Hadoop FileSystem as the readers.
    val fps = Fingerprints.report(spark, "file:///root/testdata/sf0.001")
    assert(fps.nonEmpty)
    // A directory with no known tables must FAIL, not pass vacuously.
    val empty = java.nio.file.Files.createTempDirectory("fp_empty").toString
    val e = intercept[IllegalArgumentException](Fingerprints.report(spark, empty))
    assert(e.getMessage.contains("zero input tables"))
  }

  test("an epoch-drifted time column fails the sanity gate loudly") {
    val drifted = Seq(Fingerprints.TableFp("events", 10L, Seq(
      Fingerprints.ColFp("event_id", "bigint", "1", "10"),
      Fingerprints.ColFp("ts", "timestamp",
        "1970-01-20 03:21:07.654", "1970-01-20 03:38:12.001"))))
    val e = intercept[IllegalArgumentException](Fingerprints.assertSane(drifted))
    assert(e.getMessage.contains("FINGERPRINT FAILURE"))
    // sane ranges pass, null-range (empty table) passes
    Fingerprints.assertSane(Seq(Fingerprints.TableFp("events", 0L, Seq(
      Fingerprints.ColFp("ts", "timestamp", "null", "null")))))
    Fingerprints.assertSane(Seq(Fingerprints.TableFp("events", 2L, Seq(
      Fingerprints.ColFp("ts", "timestamp", "2024-01-01 00:00:00", "2024-12-31 23:59:59")))))
  }
}
