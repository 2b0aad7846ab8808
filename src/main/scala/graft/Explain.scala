package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Plan/profile tool: run one SparkEntry query (or a reference-dataset
  * DBSCAN) and report the formatted physical plan plus per-job wall times —
  * the feedback loop for shuffle/pushdown/codegen tuning.
  *
  * Usage: sbt "runMain graft.Explain q8_agg_pricing [sfDir]"
  *        sbt "runMain graft.Explain dbscan_part64"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q8_agg_pricing")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // listener callbacks run on the listener-bus thread; the report reads
    // `done` on the main thread — take the lock on both sides
    val lock = new Object
    val jobs = mutable.Map.empty[Int, (Long, String)]
    val done = mutable.ArrayBuffer.empty[(Int, Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        lock.synchronized {
          val desc = Option(js.properties.getProperty("spark.job.description"))
            .orElse(Option(js.properties.getProperty("callSite.short")))
            .getOrElse("")
          jobs(js.jobId) = (System.nanoTime(), desc)
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        lock.synchronized {
          jobs.remove(je.jobId).foreach { case (t0, desc) =>
            done += ((je.jobId, System.nanoTime() - t0, desc))
          }
        }
    })

    import org.apache.spark.sql.functions.{col, explode}
    // several workloads run actions EAGERLY during construction (e.g.
    // Dbscan.run's CC loop) — start the clock before, or they're invisible
    val tBuild = System.nanoTime()
    val df = name match {
      case "dbscan_clus50k" =>
        Workloads.dbscanBin(spark, "/root/reference/clus50k.bin", 25.0, 5)
      case "dbscan_clus50k_dist" =>
        Workloads.dbscanBin(spark, "/root/reference/clus50k.bin", 25.0, 5,
          localThreshold = 0L)
      case "dbscan_part64" =>
        Workloads.dbscanBin(spark, "/root/reference/part64.bin", 0.01, 5, 0.96)
      case "dbscan_synth500k" =>
        Workloads.dbscanSynth(spark, 500_000L, k = 25, dims = 5,
          eps = 1.0, minPts = 5)
      case "minhash_synth1m" => Workloads.dedupSynth(spark, 1_000_000L)
      case "pagerank_synth2m" =>
        Workloads.pagerankSynth(spark, 2_000_000L, 200_000L)
      case "pagerank_synth10m" =>
        Workloads.pagerankSynth(spark, 10_000_000L, 1_000_000L)
      case "x_shingles" =>
        spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"),
            explode(graft.functions.TextFunctions.shingles(col("text"), 3)))
      case "x_sigs" =>
        graft.operators.Dedup.minHashSignatures(
          spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text", 3, 64)
      case q => SparkEntry.queries(q)(spark, sfDir)
    }

    val buildSecs = (System.nanoTime() - tBuild) / 1e9
    df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let listener drain
    val snapshot = lock.synchronized { done.sortBy(_._1).toVector }
    println(s"== jobs (${snapshot.size}) ==")
    snapshot.foreach { case (id, ns, desc) =>
      println(f"job $id%3d  ${ns / 1e9}%8.3f s  ${desc.take(90)}")
    }
    println(f"[explain] $name rows=$n build_time=$buildSecs%.3f s " +
      f"count_time=$total%.3f s jobs=${snapshot.size}")
    spark.stop()
  }
}
