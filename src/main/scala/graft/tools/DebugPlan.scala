package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway optimization-round helper: `runMain graft.tools.DebugPlan
  * <sfDir> <query> <outFile>` writes the OPTIMIZED logical plan tree (the
  * relation the plan audits walk) for one gate query. */
object DebugPlan {
  def main(args: Array[String]): Unit =
    graft.operators.Residuals.withScope(graft.operators.Residuals.newScope()) {
      val Array(sfDir, q, out) = args
      val spark = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        df.queryExecution.optimizedPlan.treeString.getBytes("UTF-8"))
      spark.stop()
    }
}
