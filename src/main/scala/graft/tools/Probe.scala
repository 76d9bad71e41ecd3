package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Dev probe: time individual SparkEntry queries and dump plans.
  * Usage: runMain graft.tools.Probe <sfDir> <queryName>[,<queryName>...] [--plan]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val showPlan = args.contains("--plan")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // overflow contracts across operators assume ANSI raises loudly —
      // pinned, not inherited from the build default (r14 ADVICE)
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      if (showPlan) fn(spark, sfDir).explain("formatted")
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode(SaveMode.Overwrite).save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name%-28s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
