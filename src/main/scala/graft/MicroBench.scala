package graft

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Single-query benchmark harness: `runMain graft.MicroBench <query>...`
  * times 3 samples of each named [[SparkEntry.queries]] entry in a FRESH
  * session at sf0.1. Bench.scala answers "how fast is the suite"; this
  * answers "is THIS query slow, or is it inheriting a dirty JVM" — the
  * distinction that separated real regressions from GC bleed in round 4. */
object MicroBench {
  def main(args: Array[String]): Unit =
    // own residual scope: two harnesses sharing a JVM can no longer
    // release each other's in-flight caches (r11 verdict #8)
    graft.operators.Residuals.withScope(graft.operators.Residuals.newScope()) {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // overflow contracts across operators assume ANSI raises loudly —
      // pinned, not inherited from the build default (r14 ADVICE)
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      // experiment knob (default matches Bench): parallelismFirst=false lets
      // AQE size post-shuffle partitions by advisory bytes instead of core
      // count — the production-efficiency setting Spark's tuning guide
      // recommends; exposed here so A/B runs can measure it per query
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_AQE_PF", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    // SPARK_GRAFT_JOBSTATS=1: per-sample job/stage/task counts — the
    // round-overhead dissector for iterative operators (a fixpoint loop's
    // wall time at small SF is job-count x scheduling cost, invisible in
    // plans; this listener makes the job count a measured number)
    val stats =
      if (!sys.env.get("SPARK_GRAFT_JOBSTATS").contains("1")) None
      else {
        val l = new org.apache.spark.scheduler.SparkListener {
          val jobs = new java.util.concurrent.atomic.AtomicLong
          val stages = new java.util.concurrent.atomic.AtomicLong
          val tasks = new java.util.concurrent.atomic.AtomicLong
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            jobs.incrementAndGet()
          override def onStageCompleted(
              s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            stages.incrementAndGet()
            tasks.addAndGet(s.stageInfo.numTasks.toLong)
          }
        }
        spark.sparkContext.addSparkListener(l)
        Some(l)
      }
    for (q <- args) {
      // bpe_deep<N>: realistic-merge-count tokenizer training (not a gated
      // query — 200 unrolled CTE rounds have no sane oracle); times the
      // batched loop the r7 verdict asked to prove out, e.g. bpe_deep200
      val run: () => Unit =
        if (q.startsWith("bpe_deep")) { () =>
          val rounds = q.stripPrefix("bpe_deep").toInt
          val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          val r = graft.operators.TextAnalysis.bpeMerges(docs, "text", rounds)
          val n = r.count()
          println(s"  bpe rounds=$n cycles=${graft.operators.TextAnalysis.lastBpeBatchRounds}")
        }
        else if (Bench.genCells.exists(_._1 == q)) { () =>
          // generator cell: genRate already takes min-of-3 internally and
          // returns rows/s; report the rate per sample position
          val (_, rows, yaml) = Bench.genCells.find(_._1 == q).get
          val rate = Bench.genRate(spark, rows, yaml)
          println(f"  $q rows/s (min-of-3): $rate%.0f")
        }
        else { () =>
          SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode(SaveMode.Overwrite).save()
        }
      val secs = (1 to 3).map { _ =>
        val (j0, s0, t0n) = stats.map(l =>
          (l.jobs.get(), l.stages.get(), l.tasks.get())).getOrElse((0L, 0L, 0L))
        val t0 = System.nanoTime()
        run()
        val s = (System.nanoTime() - t0) / 1e9
        stats.foreach { l =>
          // drain the async bus deterministically (r17 ADVICE: a fixed
          // sleep bled a heavy sample's late events into the next delta)
          org.apache.spark.graft.ListenerDrain.waitUntilEmpty(
            spark.sparkContext, 10000L)
          println(f"  STATS $q jobs=${l.jobs.get() - j0} stages=${l.stages.get() - s0} " +
            f"tasks=${l.tasks.get() - t0n} secs=$s%.2f")
        }
        graft.operators.Residuals.release() // outside the timed window
        s
      }
      println(f"MICRO $q%s ${secs.map(s => f"$s%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
