package graft.engine

import graft.config._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, TimestampType}

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Sinks: csv / parquet / devnull / http, partitioned-write routing, conflict
  * pre-flight, backup + checkpoint metadata.
  *
  * Maps the reference's writer stack (sdvg
  * `internal/generator/output/general`, `writer/{csv,parquet,devnull,http,tcs}`)
  * onto Spark's native writers: file rotation -> `maxRecordsPerFile`, hive
  * partition routing -> `partitionBy`, buffered flush/ordered commit -> the
  * file-commit protocol, conflict scan -> explicit directory check +
  * SaveMode, checkpoint -> post-commit JSON metadata.
  */
object Output {

  def modelPath(cfg: GenerationConfig, model: ModelConfig): String = {
    val base = cfg.output.dir
    if (base.isEmpty) model.modelDir else s"$base/${model.modelDir}"
  }

  /** Conflict pre-flight (reference `output/general/conflicts.go:25-96`):
    * refuse to touch directories holding previous model output unless forced. */
  def preflight(cfg: GenerationConfig, force: Boolean): Unit = cfg.output match {
    case _: DevNullOutput | _: HttpOutput => ()
    case out =>
      cfg.activeModels.foreach { m =>
        val dir = Paths.get(modelPath(cfg, m))
        if (Files.exists(dir)) {
          if (force) deleteRecursively(dir)
          else if (Files.list(dir).findFirst().isPresent)
            throw new IllegalStateException(
              s"output dir $dir already contains data; use force to overwrite")
        }
      }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) Files.list(p).forEach(deleteRecursively(_))
    Files.deleteIfExists(p)
  }

  /** Shadow-column prefix for `write_to_output: true` partition columns:
    * Spark's `partitionBy` always removes partition columns from file
    * payloads, but the reference keeps them in BOTH the hive directory and
    * the file (`model_writer.go:167-233` + `PartitionColumn.WriteToOutput`).
    * We partition by a prefixed duplicate and rename the directories after
    * commit, so payload and directory layout both match. */
  private val ShadowPrefix = "__p_"

  def writeModel(spark: SparkSession, cfg: GenerationConfig, model: ModelConfig, df0: DataFrame): Unit = {
    val written = model.partitionColumns.filter(_.writeToOutput).map(_.name)
    val df = written.foldLeft(df0)((acc, n) =>
      acc.withColumn(s"$ShadowPrefix$n", org.apache.spark.sql.functions.col(n)))
    val partitionCols = model.partitionColumns.map(pc =>
      if (pc.writeToOutput) s"$ShadowPrefix${pc.name}" else pc.name)
    cfg.output match {
      case _: DevNullOutput =>
        df.write.format("noop").mode(SaveMode.Overwrite).save()

      case o: ParquetOutput =>
        val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
        spark.conf.set(
          "spark.sql.parquet.outputTimestampType",
          if (o.timestampUnit == "ms") "TIMESTAMP_MILLIS" else "TIMESTAMP_MICROS")
        try {
          var w = df.write
            .option("compression", o.compression)
            .option("maxRecordsPerFile", model.rowsPerFile)
            .mode(SaveMode.Append)
          // per-column encoding config (best-effort, SURVEY §7: parquet-mr
          // picks concrete encodings; dictionary on/off is controllable)
          model.columns.flatMap(c => c.parquet.map(c.name -> _)).foreach { case (name, p) =>
            if (p.encoding.nonEmpty) {
              val dict = p.encoding.toUpperCase.contains("DICT")
              w = w.option(s"parquet.enable.dictionary#$name", dict.toString)
            }
          }
          if (partitionCols.nonEmpty) w = w.partitionBy(partitionCols: _*)
          w.parquet(modelPath(cfg, model))
        } finally prev match {
          case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
          case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
        }
        renameShadowPartitionDirs(spark, modelPath(cfg, model))
        writeCheckpoint(cfg, model)

      case o: CsvOutput =>
        // float precision + datetime formatting parity with the reference CSV
        // writer (`writer/csv/csv.go:250-289`): floats rendered with fixed
        // precision, datetimes with the configured pattern or epoch seconds
        val formatted = df.schema.fields.foldLeft(df) { (acc, f) =>
          f.dataType match {
            case FloatType | DoubleType =>
              acc.withColumn(f.name, format_string(s"%.${o.floatPrecision}f", col(f.name)))
            case TimestampType if o.datetimeFormat == "unix" =>
              acc.withColumn(f.name, unix_timestamp(col(f.name)))
            case _ => acc
          }
        }
        var w = formatted.write
          .option("header", !o.withoutHeaders)
          .option("sep", o.delimiter)
          .option("maxRecordsPerFile", model.rowsPerFile)
          .mode(SaveMode.Append)
        if (o.datetimeFormat.nonEmpty && o.datetimeFormat != "unix")
          w = w.option("timestampFormat", o.datetimeFormat)
        if (partitionCols.nonEmpty) w = w.partitionBy(partitionCols: _*)
        w.csv(modelPath(cfg, model))
        renameShadowPartitionDirs(spark, modelPath(cfg, model))
        writeCheckpoint(cfg, model)

      case o: HttpOutput =>
        HttpSink.write(df, model.name, o)
    }
  }

  /** Post-commit rename of `__p_col=v` hive dirs to `col=v` (recursively; a
    * dir level per partition column). Uses the Hadoop FileSystem API so it
    * works on any supported filesystem (rename is O(1) on HDFS/local;
    * copy-based on object stores — a documented cost of write_to_output). */
  private def renameShadowPartitionDirs(spark: SparkSession, root: String): Unit = {
    val hadoopPath = new org.apache.hadoop.fs.Path(root)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hadoopPath)) return
    def walk(p: org.apache.hadoop.fs.Path): Unit = {
      fs.listStatus(p).filter(_.isDirectory).foreach { st =>
        val name = st.getPath.getName
        val target =
          if (name.startsWith(ShadowPrefix)) {
            val renamed = new org.apache.hadoop.fs.Path(p, name.stripPrefix(ShadowPrefix))
            fs.rename(st.getPath, renamed)
            renamed
          } else st.getPath
        walk(target)
      }
    }
    walk(hadoopPath)
  }

  /** Rows already committed for `model` (resume support). */
  def savedRows(spark: SparkSession, cfg: GenerationConfig, model: ModelConfig): Long = {
    val path = modelPath(cfg, model)
    if (!Files.exists(Paths.get(path))) return 0L
    try cfg.output match {
      case _: ParquetOutput => spark.read.parquet(path).count()
      case o: CsvOutput => spark.read.option("header", !o.withoutHeaders).csv(path).count()
      case _ => 0L
    } catch { case _: Exception => 0L }
  }

  /** Post-commit checkpoint `<model>_checkpoint.json{"saved_rows":n}`
    * (reference `model_writer.go:120-164`). With Spark's atomic commit there
    * are no partial files, so the checkpoint is written once per action. */
  private def writeCheckpoint(cfg: GenerationConfig, model: ModelConfig): Unit = {
    val dir = Paths.get(cfg.output.dir)
    if (cfg.output.dir.nonEmpty) {
      Files.createDirectories(dir)
      Files.write(
        dir.resolve(s"${model.name}_checkpoint.json"),
        s"""{"saved_rows":${model.generateTo}}""".getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    }
  }

  /** Config snapshot for resume comparison (reference `backup/backup.go:29-40`
    * writes the `backup:"true"` field subset; we snapshot the resolved config). */
  def writeBackup(cfg: GenerationConfig): Unit = {
    if (cfg.output.dir.isEmpty) return
    val dir = Paths.get(cfg.output.dir)
    Files.createDirectories(dir)
    val models = cfg.models.toSeq.sortBy(_._1).map { case (n, m) =>
      s""""$n":{"rows_count":${m.rowsCount},"rows_per_file":${m.rowsPerFile},"columns":${m.columns.size}}"""
    }.mkString("{", ",", "}")
    Files.write(
      dir.resolve("backup.json"),
      s"""{"random_seed":${cfg.randomSeed},"models":$models}""".getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }
}
