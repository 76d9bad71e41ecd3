package graft

import graft.config.{ConfigAuthoring, ConfigParser}
import graft.engine.Engine

/** Deterministic config authoring: DDL and data samples translate to valid,
  * runnable generation configs (replacing the reference's LLM flows). */
class AuthoringSpec extends SparkSuite {

  test("CREATE TABLE ddl -> valid config -> runnable generation") {
    val ddl =
      """CREATE TABLE users (
        |  id BIGINT NOT NULL,
        |  name STRING,
        |  age INT NOT NULL,
        |  balance DOUBLE,
        |  created TIMESTAMP NOT NULL
        |);
        |CREATE TABLE events (ev_id BIGINT NOT NULL, kind STRING NOT NULL)""".stripMargin
    val yaml = ConfigAuthoring.fromDdl(spark, ddl, defaultRows = 100)
    val cfg = ConfigParser.parseYaml(yaml)
    assert(cfg.models.keySet == Set("users", "events"))
    val users = cfg.model("users")
    assert(users.columns.map(_.name) == Seq("id", "name", "age", "balance", "created"))
    assert(users.columns.find(_.name == "name").get.ranges.head.nullPercentage > 0)
    assert(users.columns.find(_.name == "age").get.ranges.head.nullPercentage == 0)
    // and it actually generates
    val df = Engine.modelFrame(spark, cfg, users)
    assert(df.count() == 100)
    assert(df.schema.fieldNames.toSeq == Seq("id", "name", "age", "balance", "created"))
  }

  test("csv sample -> inferred config with observed bounds") {
    val dir = java.nio.file.Files.createTempDirectory("sample")
    val csv = dir.resolve("people.csv")
    java.nio.file.Files.write(csv,
      "id,age,city\n1,30,Paris\n2,45,Rome\n3,28,Oslo\n".getBytes("UTF-8"))
    val yaml = ConfigAuthoring.fromSample(spark, csv.toString, defaultRows = 50)
    val cfg = ConfigParser.parseYaml(yaml)
    val m = cfg.model("people")
    val age = m.columns.find(_.name == "age").get.ranges.head.intParams.get
    assert(age.from == 28 && age.to == 45)
    val rows = Engine.modelFrame(spark, cfg, m).collect()
    assert(rows.length == 50)
  }
}
