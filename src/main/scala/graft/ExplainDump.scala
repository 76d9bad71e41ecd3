package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Plan snapshot tool for optimization rounds: `runMain graft.ExplainDump
  * <sfDir> <outDir> <tag> <query>...` writes each named query's
  * `.explain("formatted")` output to `<outDir>/<query>_<tag>.txt` — the
  * before/after plan evidence the optimization deliverable requires
  * (plans/r17/...). Builds the DataFrames (driver-side build jobs run) but
  * executes no query action, so a full dump is cheap. Uses the same session
  * shape as [[MicroBench]] so plans match what the bench executes. */
object ExplainDump {
  def main(args: Array[String]): Unit =
    graft.operators.Residuals.withScope(graft.operators.Residuals.newScope()) {
      require(args.length >= 4, "usage: ExplainDump <sfDir> <outDir> <tag> <query>...")
      val (sfDir, outDir, tag) = (args(0), args(1), args(2))
      Files.createDirectories(Paths.get(outDir))
      val spark = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      for (q <- args.drop(3)) {
        try {
          val df = SparkEntry.queries(q)(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          Files.write(Paths.get(s"$outDir/${q}_$tag.txt"), txt.getBytes("UTF-8"))
          println(s"[explain] wrote $outDir/${q}_$tag.txt")
        } catch {
          case t: Throwable =>
            System.err.println(s"[explain] $q failed: ${t.getMessage}")
        }
        graft.operators.Residuals.release()
      }
      spark.stop()
    }
}
