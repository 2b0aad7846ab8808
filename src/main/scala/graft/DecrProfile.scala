package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off profiler for the decremental fold — times each phase of
  * removePoints' work against the 500k standing state so the expensive
  * stage is measured, not guessed. Not part of the bench surface. */
object DecrProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-decr-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{EpsilonJoin, IncrementalDbscan}
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[decrprof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val (n, k, dims, eps, minPts) = (500000L, 25, 5, 1.0, 5)
    val pts = Workloads.synthPoints(spark, n, k, dims).persist()
    val bDims = EpsilonJoin.pickBucketDims(pts, "features", eps,
      knownDim = dims)
    val st0 = t("init+pin")(IncrementalDbscan.pin(IncrementalDbscan.init(
      pts, "id", "features", eps, minPts, bDims)))
    val expired = pts.select("id")
      .filter(pmod(xxhash64(col("id"), lit("c")), lit(k.toLong)) < 2)
    // phase-by-phase replay of removePoints' internals
    val rm = t("rm")(expired.select(col("id")).distinct().persist())
    t("rm count")(System.err.println("  rm=" + rm.count()))
    val gone = t("gone")(st0.points.join(rm, "id").persist())
    t("gone isEmpty")(gone.isEmpty)
    val remaining = t("remaining")(
      st0.points.join(rm, Seq("id"), "left_anti").persist())
    val cut = t("cut join (build)")(EpsilonJoin.join(gone, remaining,
        "id", "vec", eps, bDims)
      .join(rm.withColumnRenamed("id", "a_id"), Seq("a_id"), "left_anti")
      .select(col("a_id"), col("b_id"))
      .persist())
    t("cut materialize")(System.err.println("  cut=" + cut.count()))
    val dec = cut.groupBy(col("a_id").as("id")).agg(count(lit(1)).as("d"))
    val counts = t("counts")(st0.counts
      .join(rm, Seq("id"), "left_anti")
      .join(dec, Seq("id"), "left")
      .select(col("id"), (col("n") - coalesce(col("d"), lit(0L))).as("n"))
      .filter(col("n") > 0)
      .persist())
    t("counts materialize")(System.err.println("  counts=" + counts.count()))
    val nowCore = t("nowCore")(counts
      .filter(col("n") + lit(1L) >= lit(minPts.toLong)).select("id")
      .persist())
    val demoted = t("demoted")(st0.counts
      .filter(col("n") + lit(1L) >= lit(minPts.toLong)).select("id")
      .join(rm, Seq("id"), "left_anti")
      .join(nowCore, Seq("id"), "left_anti")
      .persist())
    t("demoted materialize")(System.err.println("  demoted=" + demoted.count()))
    val touched = t("touchedComps")(st0.coreComp
      .join(gone.select("id").union(demoted.select("id")).distinct(), "id")
      .select("comp").distinct().persist())
    t("touched materialize")(System.err.println("  touched=" + touched.count()))
    val members = st0.coreComp.join(broadcast(touched), "comp")
      .join(nowCore, "id").join(remaining, "id").select("id", "vec")
    t("members count")(System.err.println("  members=" + members.count()))
    val scope = members.unionByName(
      demoted.join(remaining, "id").select("id", "vec"))
    val scopePairs = t("scope selfJoin")(EpsilonJoin
      .selfJoin(scope, "id", "vec", eps, bDims)
      .select("a_id", "b_id").persist())
    t("scopePairs materialize")(
      System.err.println("  scopePairs=" + scopePairs.count()))
    val full = t("full removePoints")(IncrementalDbscan.removePoints(
      st0, expired, "id", eps, minPts, bDims))
    t("labels")(System.err.println("  labeled=" +
      IncrementalDbscan.labels(full).count()))
    spark.stop()
  }
}
