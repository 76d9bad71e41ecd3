package graft.config

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Deterministic config authoring — the reference's `generate-config
  * sql-query` / `data-sample` modes feed the input to an LLM
  * (`cli/commands/config/sql_query.go:13-57`, `data_sample.go:13-57`); here
  * both are real translators (SURVEY §2.10 plan: "strictly stronger"):
  *
  *  - DDL mode: `CREATE TABLE` statements parsed with Spark's own SQL parser
  *    -> one model per table, columns mapped to generator types.
  *  - Sample mode: a CSV/JSON sample read with schema inference -> config
  *    skeleton with observed min/max bounds per numeric column.
  *
  * Output is a YAML config that round-trips through [[ConfigParser]] (the
  * validation loop the reference builds around the LLM is kept: we emit,
  * re-parse, and fail loudly if invalid).
  */
object ConfigAuthoring {

  private def columnYaml(name: String, dt: DataType, nullable: Boolean): String = {
    val base = dt match {
      case ByteType => s"{ name: $name, type: integer, type_params: { bit_width: 8 } }"
      case ShortType => s"{ name: $name, type: integer, type_params: { bit_width: 16 } }"
      case IntegerType => s"{ name: $name, type: integer }"
      case LongType => s"{ name: $name, type: integer, type_params: { bit_width: 64 } }"
      case FloatType => s"{ name: $name, type: float }"
      case DoubleType => s"{ name: $name, type: float, type_params: { bit_width: 64 } }"
      case _: DecimalType => s"{ name: $name, type: float, type_params: { bit_width: 64 } }"
      case DateType | TimestampType | TimestampNTZType => s"{ name: $name, type: datetime }"
      case StringType => s"{ name: $name, type: string }"
      case BooleanType => s"{ name: $name, type: integer, values: [0, 1] }"
      case other =>
        s"{ name: $name, type: string } # TODO unsupported source type: ${other.simpleString}"
    }
    if (nullable && !base.contains("TODO"))
      base.dropRight(2) + ", null_percentage: 0.1 }"
    else base
  }

  private def modelYaml(table: String, fields: Seq[StructField], rows: Long): String = {
    val cols = fields.map(f => s"      - ${columnYaml(f.name, f.dataType, f.nullable)}")
    s"""  $table:
       |    rows_count: $rows
       |    columns:
       |${cols.mkString("\n")}""".stripMargin
  }

  /** CREATE TABLE DDL (one or more statements, `;`-separated) -> config YAML.
    * Parsing is Spark's `sqlParser.parsePlan` — full ANSI DDL surface, not a
    * 3 KB prompt excerpt. */
  def fromDdl(spark: SparkSession, ddl: String, defaultRows: Long = 1000L): String = {
    val parser = spark.sessionState.sqlParser
    val stmts = ddl.split(";").map(_.trim).filter(_.nonEmpty)
    val models = stmts.flatMap { stmt =>
      val plan = parser.parsePlan(stmt)
      // extract (table name, schema) reflectively across CreateTable shapes:
      // the plan exposes `name` (UnresolvedIdentifier/ResolvedIdentifier) and
      // `tableSchema`/`columns`
      val cls = plan.getClass
      def call[A](n: String): Option[A] =
        cls.getMethods.find(m => m.getName == n && m.getParameterCount == 0)
          .map(_.invoke(plan).asInstanceOf[A])
      val schema: Option[StructType] =
        call[StructType]("tableSchema").orElse {
          call[Seq[Any]]("columns").map { cols =>
            StructType(cols.map { c =>
              val cc = c.getClass
              StructField(
                cc.getMethod("name").invoke(c).asInstanceOf[String],
                cc.getMethod("dataType").invoke(c).asInstanceOf[DataType],
                cc.getMethod("nullable").invoke(c).asInstanceOf[Boolean])
            })
          }
        }
      val name: String = call[Any]("name").map { n =>
        val nc = n.getClass
        nc.getMethods
          .find(m => (m.getName == "nameParts" || m.getName == "multipartIdentifier")
            && m.getParameterCount == 0)
          .map(_.invoke(n).asInstanceOf[Seq[String]].last)
          .getOrElse(n.toString.split("\\.").last.replaceAll("[^A-Za-z0-9_]", ""))
      }.getOrElse("table")
      schema.map(sch => modelYaml(name, sch.fields.toSeq, defaultRows))
    }
    require(models.nonEmpty, "no CREATE TABLE statement found in DDL")
    val yaml = s"""random_seed: 1
                  |models:
                  |${models.mkString("\n")}
                  |""".stripMargin
    ConfigParser.parseYaml(yaml) // validation loop: emit -> re-parse -> throw if bad
    yaml
  }

  /** Data sample (CSV with header or JSON lines) -> config YAML with inferred
    * schema and observed numeric bounds. */
  def fromSample(spark: SparkSession, path: String, defaultRows: Long = 1000L): String = {
    val df =
      if (path.endsWith(".json")) spark.read.json(path)
      else spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    val fields = df.schema.fields.toSeq
    // observed bounds for numeric columns make the generated data resemble
    // the sample (a deterministic stand-in for the LLM's guesswork)
    import org.apache.spark.sql.functions._
    val numeric = fields.filter(f => f.dataType.isInstanceOf[NumericType])
    val bounds: Map[String, (String, String)] =
      if (numeric.isEmpty) Map.empty
      else {
        val row = df.agg(
          numeric.flatMap(f => Seq(min(col(f.name)), max(col(f.name)))).head,
          numeric.flatMap(f => Seq(min(col(f.name)), max(col(f.name)))).tail: _*).collect()(0)
        numeric.zipWithIndex.map { case (f, i) =>
          f.name -> (String.valueOf(row.get(2 * i)), String.valueOf(row.get(2 * i + 1)))
        }.toMap
      }
    val cols = fields.map { f =>
      val base = columnYaml(f.name, f.dataType, f.nullable)
      bounds.get(f.name) match {
        case Some((lo, hi)) if !base.contains("TODO") && base.contains("type_params") =>
          s"      - ${base.replace("} }", s", from: $lo, to: $hi } }")}"
        case Some((lo, hi)) if !base.contains("TODO") && !base.contains("values") =>
          s"      - ${base.dropRight(2) + s", type_params: { from: $lo, to: $hi } }"}"
        case _ => s"      - $base"
      }
    }
    val table = new java.io.File(path).getName.split("\\.").head.replaceAll("[^A-Za-z0-9_]", "")
    val yaml = s"""random_seed: 1
                  |models:
                  |  $table:
                  |    rows_count: $defaultRows
                  |    columns:
                  |${cols.mkString("\n")}
                  |""".stripMargin
    ConfigParser.parseYaml(yaml)
    yaml
  }
}
