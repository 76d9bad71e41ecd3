package graft

import graft.config.ConfigParser
import graft.engine.{Engine, Output}

/** End-to-end continue/force semantics over real file output (reference
  * `output/general/test/unit_test.go:70-171`, fixture F5): an interrupted run
  * resumed with `--continue` lands on exactly the full dataset; `--force`
  * wipes conflicting output. */
class ResumeSpec extends SparkSuite {

  private def cfgYaml(dir: String, generateTo: Option[Long]): String =
    s"""
       |random_seed: 42
       |output: { type: parquet, dir: $dir }
       |models:
       |  m:
       |    rows_count: 1000
       |${generateTo.map(t => s"    generate_to: $t").getOrElse("")}
       |    columns:
       |      - { name: id, type: integer, type_params: { bit_width: 64, from: 0, to: 999 }, ordered: true, distinct_percentage: 1 }
       |      - { name: u, type: uuid }
       |      - { name: grp, type: integer, values: [1, 2, 3] }
       |""".stripMargin

  test("continue generation resumes to the exact full dataset") {
    val dir = java.nio.file.Files.createTempDirectory("resume").toString
    // partial run: first 400 rows
    Engine.run(spark, ConfigParser.parseYaml(cfgYaml(dir, Some(400L))))
    assert(spark.read.parquet(s"$dir/m").count() == 400)
    // resume: recompute generate_from from committed output, append the rest
    val full = ConfigParser.parseYaml(cfgYaml(dir, None))
    val resumed = Engine.resumedConfig(spark, full)
    assert(resumed.model("m").generateFrom == 400)
    Engine.run(spark, resumed, resume = true)
    val got = spark.read.parquet(s"$dir/m")
    assert(got.count() == 1000)
    // content identical to a clean full run
    val cleanDir = java.nio.file.Files.createTempDirectory("clean").toString
    Engine.run(spark, ConfigParser.parseYaml(cfgYaml(cleanDir, None)))
    val clean = spark.read.parquet(s"$cleanDir/m")
    assert(got.orderBy("id").collect().toSeq == clean.orderBy("id").collect().toSeq)
    // resuming a complete run writes nothing more
    val again = Engine.resumedConfig(spark, full)
    assert(again.model("m").generateFrom == 1000)
    Engine.run(spark, again, resume = true)
    assert(spark.read.parquet(s"$dir/m").count() == 1000)
  }

  test("resume after a simulated mid-job failure is prefix-safe (no dups, no gaps)") {
    val dir = java.nio.file.Files.createTempDirectory("crash").toString
    Engine.run(spark, ConfigParser.parseYaml(cfgYaml(dir, Some(400L))))
    // Simulate a follow-up job that died after committing SOME task files:
    // Spark commits per task, so a crash leaves extra part files holding an
    // arbitrary row subset. Model it by duplicating a committed part file.
    val modelDir = new java.io.File(s"$dir/m")
    val part = modelDir.listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(modelDir, "part-99999-deadbeef-c000.snappy.parquet").toPath)
    assert(spark.read.parquet(s"$dir/m").count() > 400) // dir is now corrupted
    // A raw row count would set generate_from past 400 AND keep the dup rows.
    // The checkpoint-manifest resume must drop the stray file and append 400..1000.
    val resumed = Engine.resumedConfig(spark, ConfigParser.parseYaml(cfgYaml(dir, None)))
    assert(resumed.model("m").generateFrom == 400)
    Engine.run(spark, resumed, resume = true)
    val got = spark.read.parquet(s"$dir/m")
    assert(got.count() == 1000)
    val cleanDir = java.nio.file.Files.createTempDirectory("clean2").toString
    Engine.run(spark, ConfigParser.parseYaml(cfgYaml(cleanDir, None)))
    assert(got.orderBy("id").collect().toSeq
      == spark.read.parquet(s"$cleanDir/m").orderBy("id").collect().toSeq)
  }

  test("intra-model checkpointing: a kill mid-model resumes from the last slice, bit-identical") {
    val dir = java.nio.file.Files.createTempDirectory("midmodel").toString
    val sliced = cfgYaml(dir, None).replace("rows_count: 1000",
      "rows_count: 1000\n    checkpoint_rows: 250")
    // die after the second 250-row slice commits — mid-model, not mid-job
    val boom = intercept[RuntimeException] {
      Engine.run(spark, ConfigParser.parseYaml(sliced),
        onSliceDone = (_, upTo) => if (upTo >= 500L) throw new RuntimeException("kill"))
    }
    assert(boom.getMessage == "kill")
    val cfg = ConfigParser.parseYaml(sliced)
    assert(Output.savedRows(spark, cfg, cfg.model("m")) == 500L,
      "checkpoint must sit at the last completed slice, not 0 or 1000")
    // resume restarts at row 500 — the crash cost one slice, not the model
    val resumed = Engine.resumedConfig(spark, cfg)
    assert(resumed.model("m").generateFrom == 500)
    Engine.run(spark, resumed, resume = true)
    val got = spark.read.parquet(s"$dir/m")
    assert(got.count() == 1000)
    // rows bit-identical to an uninterrupted, unsliced run
    val cleanDir = java.nio.file.Files.createTempDirectory("midclean").toString
    Engine.run(spark, ConfigParser.parseYaml(cfgYaml(cleanDir, None)))
    assert(got.orderBy("id").collect().toSeq
      == spark.read.parquet(s"$cleanDir/m").orderBy("id").collect().toSeq)
    // checkpoint granularity is not data-shaping: the sliced dir resumes
    // cleanly under a config with no checkpoint_rows at all
    Engine.resumedConfig(spark, ConfigParser.parseYaml(cfgYaml(dir, None)))
  }

  test("continue refuses when the config changed since the backup snapshot") {
    val dir = java.nio.file.Files.createTempDirectory("backupcmp").toString
    Engine.run(spark, ConfigParser.parseYaml(cfgYaml(dir, Some(400L))))
    // same model, edited rows_count -> different data-shaping fingerprint
    val edited = cfgYaml(dir, None).replace("rows_count: 1000", "rows_count: 2000")
    val ex = intercept[IllegalStateException] {
      Engine.resumedConfig(spark, ConfigParser.parseYaml(edited))
    }
    assert(ex.getMessage.contains("config differs"))
    // unchanged config still resumes to completion
    Engine.run(spark,
      Engine.resumedConfig(spark, ConfigParser.parseYaml(cfgYaml(dir, None))), resume = true)
    assert(spark.read.parquet(s"$dir/m").count() == 1000)
  }

  test("resume works against a file:-qualified URI (Hadoop FS metadata path)") {
    val dir = "file://" + java.nio.file.Files.createTempDirectory("fsuri").toString
    Engine.run(spark, ConfigParser.parseYaml(cfgYaml(dir, Some(300L))))
    val resumed = Engine.resumedConfig(spark, ConfigParser.parseYaml(cfgYaml(dir, None)))
    assert(resumed.model("m").generateFrom == 300)
    Engine.run(spark, resumed, resume = true)
    assert(spark.read.parquet(s"$dir/m").count() == 1000)
  }

  test("legacy v1 checkpoint (saved_rows only) resumes WITHOUT wiping committed data") {
    val dir = java.nio.file.Files.createTempDirectory("legacy").toString
    Engine.run(spark, ConfigParser.parseYaml(cfgYaml(dir, Some(400L))))
    // rewrite the checkpoint to the pre-manifest format: no files/watermark
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/m_checkpoint.json"),
      """{"saved_rows":400}""".getBytes)
    // drop the Hadoop checksum sidecar invalidated by the raw rewrite
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(s"$dir/.m_checkpoint.json.crc"))
    val resumed = Engine.resumedConfig(spark, ConfigParser.parseYaml(cfgYaml(dir, None)))
    assert(resumed.model("m").generateFrom == 400,
      "legacy checkpoint's saved_rows must be honored")
    // the committed 400 rows MUST survive (treating the missing manifest as
    // 'nothing committed' would wipe them and leave a permanent row gap)
    assert(spark.read.parquet(s"$dir/m").count() == 400)
    Engine.run(spark, resumed, resume = true)
    assert(spark.read.parquet(s"$dir/m").count() == 1000)
    val cleanDir = java.nio.file.Files.createTempDirectory("legacyclean").toString
    Engine.run(spark, ConfigParser.parseYaml(cfgYaml(cleanDir, None)))
    assert(spark.read.parquet(s"$dir/m").orderBy("id").collect().toSeq
      == spark.read.parquet(s"$cleanDir/m").orderBy("id").collect().toSeq)
  }

  test("checkpoint stays bounded: no per-file manifest regardless of file count") {
    val dir = java.nio.file.Files.createTempDirectory("bounded").toString
    // 1000 rows / 50 per file -> ~20 data files
    val yaml = cfgYaml(dir, None).replace("rows_count: 1000",
      "rows_count: 1000\n    rows_per_file: 50")
    Engine.run(spark, ConfigParser.parseYaml(yaml))
    val cp = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/m_checkpoint.json")))
    assert(!cp.contains("part-"), s"checkpoint must not embed file paths: $cp")
    assert(cp.length < 200, s"checkpoint must be O(1) in size, got ${cp.length} bytes")
    assert(cp.contains("\"file_count\"") && cp.contains("\"max_mtime\""))
  }

  test("force invalidates backup.json so a crashed forced run doesn't block the new config") {
    val dir = java.nio.file.Files.createTempDirectory("forcebackup").toString
    Engine.run(spark, ConfigParser.parseYaml(cfgYaml(dir, None)))
    // force-preflight under an EDITED config (as a forced rerun would), then
    // simulate the run dying before writeBackup: backup.json must be gone,
    // so resuming the new config is not refused by the old fingerprint
    val edited = ConfigParser.parseYaml(
      cfgYaml(dir, None).replace("rows_count: 1000", "rows_count: 500"))
    Output.preflight(spark, edited, force = true)
    assert(!new java.io.File(s"$dir/backup.json").exists(),
      "stale backup.json must not survive a force wipe")
    Engine.run(spark, Engine.resumedConfig(spark, edited), resume = true)
    assert(spark.read.parquet(s"$dir/m").count() == 500)
  }

  test("force wipes conflicting output; without force it refuses") {
    val dir = java.nio.file.Files.createTempDirectory("force").toString
    val cfg = ConfigParser.parseYaml(cfgYaml(dir, None))
    Engine.run(spark, cfg)
    intercept[IllegalStateException] { Engine.run(spark, cfg) }
    Engine.run(spark, cfg, force = true)
    assert(spark.read.parquet(s"$dir/m").count() == 1000)
  }

  test("write_to_output: true keeps the column in BOTH dirs and payload (F5)") {
    val dir = java.nio.file.Files.createTempDirectory("wto").toString
    val yaml =
      s"""
         |random_seed: 42
         |output: { type: parquet, dir: $dir }
         |models:
         |  m:
         |    rows_count: 300
         |    columns:
         |      - { name: v, type: integer, type_params: { bit_width: 64 } }
         |      - { name: grp, type: integer, values: [1, 2, 3] }
         |    partition_columns:
         |      - { name: grp, write_to_output: true }
         |""".stripMargin
    Engine.run(spark, ConfigParser.parseYaml(yaml))
    val dirs = new java.io.File(s"$dir/m").listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("grp=1", "grp=2", "grp=3"), dirs.toSeq)
    // the payload files themselves still contain the column
    val oneFile = new java.io.File(s"$dir/m/grp=1").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val payload = spark.read.parquet(oneFile.toString)
    assert(payload.columns.contains("grp"), payload.columns.toSeq)
    assert(payload.select("grp").distinct().collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("hive-partitioned write produces partition dirs readable back") {
    val dir = java.nio.file.Files.createTempDirectory("part").toString
    val yaml =
      s"""
         |random_seed: 42
         |output: { type: parquet, dir: $dir }
         |models:
         |  m:
         |    rows_count: 1000
         |    columns:
         |      - { name: v, type: integer, type_params: { bit_width: 64 } }
         |      - { name: grp, type: integer, values: [1, 2, 3] }
         |    partition_columns:
         |      - { name: grp }
         |""".stripMargin
    Engine.run(spark, ConfigParser.parseYaml(yaml))
    val dirs = new java.io.File(s"$dir/m").listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("grp=1", "grp=2", "grp=3"))
    val back = spark.read.parquet(s"$dir/m")
    assert(back.count() == 1000)
    assert(back.select("grp").distinct().count() == 3)
  }

  test("null partition values write col=null dirs (reference layout parity), resume counts hold") {
    // reference model_writer.go:226-227 writes the literal `null` dir, not
    // Spark's __HIVE_DEFAULT_PARTITION__ — the renamer closes the gap
    val dir = java.nio.file.Files.createTempDirectory("nullpart").toString
    // the null draw keys on the VALUE number (reference generator.go:232 —
    // fastRandomFloat(seed+num)), so a wide domain is needed for a mix of
    // null and non-null partitions
    def yaml(upTo: Option[Long]) =
      s"""
         |random_seed: 42
         |output: { type: parquet, dir: $dir }
         |models:
         |  m:
         |    rows_count: 600
         |${upTo.map(n => s"    generate_to: $n").getOrElse("")}
         |    columns:
         |      - { name: v, type: integer, type_params: { bit_width: 64 } }
         |      - { name: grp, type: integer, type_params: { from: 0, to: 9 }, null_percentage: 0.4 }
         |    partition_columns:
         |      - { name: grp }
         |""".stripMargin
    Engine.run(spark, ConfigParser.parseYaml(yaml(Some(400L))))
    def dirNames() = new java.io.File(s"$dir/m").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    val dirs = dirNames()
    assert(dirs.contains("grp=null"), dirs.toSeq)
    assert(dirs.exists(d => d != "grp=null"), dirs.toSeq)
    assert(!dirs.exists(_.contains("HIVE_DEFAULT")), dirs.toSeq)
    // resume to a larger total: the append re-creates Spark's default dir,
    // the renamer must MERGE it into the existing grp=null, not nest it
    val resumed = Engine.resumedConfig(spark, ConfigParser.parseYaml(yaml(None)))
    assert(resumed.model("m").generateFrom == 400)
    Engine.run(spark, resumed, resume = true)
    val dirs2 = dirNames()
    assert(!dirs2.exists(_.contains("HIVE_DEFAULT")), dirs2.toSeq)
    val back = spark.read.parquet(s"$dir/m")
    assert(back.count() == 600, back.count())
    // no nested leftovers under the merged null dir
    val nested = new java.io.File(s"$dir/m/grp=null").listFiles().filter(_.isDirectory)
    assert(nested.isEmpty, nested.map(_.getName).toSeq)
  }

  test("jsonl sink writes newline-delimited JSON, checkpointed and resumable") {
    def yaml(dir: String, generateTo: Option[Long]): String =
      s"""
         |random_seed: 42
         |output: { type: jsonl, dir: $dir }
         |models:
         |  m:
         |    rows_count: 500
         |${generateTo.map(t => s"    generate_to: $t").getOrElse("")}
         |    columns:
         |      - { name: id, type: integer, type_params: { bit_width: 64, from: 0, to: 499 }, ordered: true, distinct_percentage: 1 }
         |      - { name: u, type: uuid }
         |""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    // partial run + resume, same contract as the parquet sink
    Engine.run(spark, ConfigParser.parseYaml(yaml(dir, Some(200L))))
    val resumed = Engine.resumedConfig(spark, ConfigParser.parseYaml(yaml(dir, None)))
    assert(resumed.model("m").generateFrom == 200)
    Engine.run(spark, resumed, resume = true)
    // raw layout: one JSON object per line, parseable without Spark
    val files = new java.io.File(s"$dir/m").listFiles()
      .filter(f => f.getName.startsWith("part-") && !f.getName.endsWith(".crc"))
    assert(files.nonEmpty)
    val firstLine = scala.io.Source.fromFile(files.head).getLines().next()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(firstLine)
    assert(node.has("id") && node.has("u"))
    // full dataset, no dups/gaps
    val back = spark.read.json(s"$dir/m")
    assert(back.count() == 500)
    assert(back.select("id").distinct().count() == 500)
  }

  test("per-column parquet dictionary control reaches the file footer") {
    // Two low-cardinality string columns that parquet-mr would BOTH
    // dictionary-encode by default; the PLAIN column's config must turn its
    // dictionary OFF while the RLE_DICTIONARY column keeps it (reference
    // parquet.go:123,178-189: WithDictionaryDefault(false) +
    // WithDictionaryFor on *_DICT encodings — our default follows Spark,
    // the per-column toggle is the contract under test).
    val dir = java.nio.file.Files.createTempDirectory("pqenc").toString
    val yaml =
      s"""
         |random_seed: 42
         |output: { type: parquet, dir: $dir }
         |models:
         |  m:
         |    rows_count: 2000
         |    columns:
         |      - { name: id, type: integer, type_params: { bit_width: 64, from: 0, to: 1999 }, ordered: true, distinct_percentage: 1 }
         |      - { name: s_plain, type: string, values: [aaaa, bbbb, cccc], parquet: { encoding: PLAIN } }
         |      - { name: s_dict, type: string, values: [dddd, eeee, ffff], parquet: { encoding: RLE_DICTIONARY } }
         |""".stripMargin
    Engine.run(spark, ConfigParser.parseYaml(yaml))
    val file = new java.io.File(s"$dir/m").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.getAbsolutePath),
        spark.sessionState.newHadoopConf()))
    try {
      import scala.jdk.CollectionConverters._
      val cols = reader.getFooter.getBlocks.asScala.head.getColumns.asScala
        .map(c => c.getPath.toDotString -> c.getEncodings.asScala.map(_.name).toSet).toMap
      def hasDict(c: String) =
        cols(c).exists(e => e.contains("DICTIONARY")) // PLAIN_DICTIONARY or RLE_DICTIONARY
      assert(hasDict("s_dict"), s"s_dict should be dictionary-encoded: ${cols("s_dict")}")
      assert(!hasDict("s_plain"), s"s_plain dictionary must be disabled: ${cols("s_plain")}")
    } finally reader.close()
    // unknown encoding names fail at CONFIG time, not mid-write
    val bad = intercept[ConfigParser.ConfigException](ConfigParser.parseYaml(
      yaml.replace("PLAIN", "FANCY_ENC")))
    assert(bad.errors.exists(_.contains("unknown parquet encoding")), bad.errors.toString)
  }

  test("declared v2 encodings select writer version 2 and reach the footer") {
    // DELTA_* are v2-only: declaring one must flip parquet.writer.version
    // to v2 for the model so the requested encoding actually lands in the
    // written pages (reference parquet.go:45-52,178-189). parquet-mr picks
    // DELTA_BINARY_PACKED for ints and DELTA_BYTE_ARRAY for strings once
    // the column's dictionary is off under v2 — exactly the declared names.
    val dir = java.nio.file.Files.createTempDirectory("pqv2").toString
    val yaml =
      s"""
         |random_seed: 42
         |output: { type: parquet, dir: $dir }
         |models:
         |  m:
         |    rows_count: 2000
         |    columns:
         |      - { name: id, type: integer, type_params: { bit_width: 64, from: 0, to: 1999 }, ordered: true, distinct_percentage: 1, parquet: { encoding: DELTA_BINARY_PACKED } }
         |      - { name: s, type: string, type_params: { logical_type: first_name }, parquet: { encoding: DELTA_BYTE_ARRAY } }
         |      - { name: s_dict, type: string, values: [dddd, eeee, ffff], parquet: { encoding: RLE_DICTIONARY } }
         |""".stripMargin
    Engine.run(spark, ConfigParser.parseYaml(yaml))
    val file = new java.io.File(s"$dir/m").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.getAbsolutePath),
        spark.sessionState.newHadoopConf()))
    try {
      import scala.jdk.CollectionConverters._
      val cols = reader.getFooter.getBlocks.asScala.head.getColumns.asScala
        .map(c => c.getPath.toDotString -> c.getEncodings.asScala.map(_.name).toSet).toMap
      assert(cols("id").contains("DELTA_BINARY_PACKED"), s"id: ${cols("id")}")
      assert(cols("s").contains("DELTA_BYTE_ARRAY"), s"s: ${cols("s")}")
      // the dictionary column is unharmed by the model-wide v2 switch
      assert(cols("s_dict").exists(_.contains("DICTIONARY")), s"s_dict: ${cols("s_dict")}")
    } finally reader.close()
  }
}
