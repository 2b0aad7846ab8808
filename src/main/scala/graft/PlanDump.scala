package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a set of declared queries to files —
  * the judge-facing plan evidence for optimization rounds.
  *
  * Usage: `runMain graft.PlanDump <outDir> <suffix> <q1,q2,...>`
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_GRAPH_LOCAL=0 to dump the forced-distributed plans. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(',').map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      // count jobs/stages/tasks across the WHOLE query (graph-family
      // operators run eager internal jobs and return localCheckpoint'd
      // results, so the final explain alone under-reports the work —
      // the execution profile is the honest before/after evidence)
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val stages = new java.util.concurrent.atomic.AtomicInteger(0)
      val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
      val shuffles = new java.util.concurrent.atomic.AtomicLong(0L)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(s.stageInfo.numTasks)
          shuffles.addAndGet(
            s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      // diagnostics (the bench's scale workloads) dump beside declared
      // queries — they are the optimization rounds' primary targets
      val diags: Map[String, SparkSession => org.apache.spark.sql.DataFrame] =
        Map(
          "substr_synth1m" -> (s => Workloads.substrSynth(s, 1_000_000L)),
          "minhash_synth1m" -> (s => Workloads.dedupSynth(s, 1_000_000L)),
          "ann_synth1m" -> (s => Workloads.annSynth(s, 1_000_000L)),
          "ann_index_rt_synth1m" ->
            (s => Workloads.annIndexRoundTrip(s, 1_000_000L)),
          "kdeps_synth200k" ->
            (s => Workloads.kdEpsSynth(s, 200_000L, eps = 0.2)),
          "textstats_synth1m" ->
            (s => Workloads.textStatsSynth(s, 1_000_000L)),
          "curation_synth250k" -> (s => Workloads.curationSynth(s, 250_000L)),
          "pagerank_synth10m" ->
            (s => Workloads.pagerankSynth(s, 10_000_000L, 1_000_000L)),
          "dbscan_synth500k" -> (s => Workloads.dbscanSynth(s, 500_000L,
            k = 25, dims = 5, eps = 1.0, minPts = 5)),
          "substr_anchored" -> (s =>
            graft.operators.SubstringDedup.duplicatedSpansAnchored(
              s.read.parquet(s"$sfDir/documents.parquet"), "doc_id",
              "text", l = 40, stride = 4)))
      val df = diags.get(name) match {
        case Some(fn) => fn(spark)
        case None => SparkEntry.queries(name)(spark, sfDir)
      }
      df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the async listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val profile = f"== execution profile ($suffix) ==%n" +
        f"wall: $sec%.2f s  jobs: ${jobs.get}  stages: ${stages.get}  " +
        f"tasks: ${tasks.get}  shuffle bytes written: ${shuffles.get}%n%n"
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        profile + plan)
      println(s"[plandump] $name ($suffix): ${jobs.get} jobs, " +
        f"${stages.get} stages, $sec%.2f s")
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
