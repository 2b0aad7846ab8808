package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reference-dataset workload constructors shared by [[Bench]] and
  * [[Explain]] — one definition of the persist-before-pickBucketDims
  * dance and the localThreshold plumbing, so the profiled plan is always
  * the benchmarked plan. */
object Workloads {

  /** Full DBSCAN over one of the reference's binary point files.
    * @param localThreshold forwarded to [[operators.Dbscan.run]]; pass 0
    *   to force the distributed pipeline. */
  def dbscanBin(spark: SparkSession, path: String, eps: Double, minPts: Int,
      samplePct: Double = 1.0,
      localThreshold: Long = 100_000L): DataFrame = {
    val pts0 = graft.sources.BinaryPoints.read(spark, path)
    // cache before pickBucketDims: it and Dbscan.run share the scan
    val pts = graft.operators.PointSink.sampleGate(pts0, samplePct).persist()
    val dims = graft.operators.EpsilonJoin.pickBucketDims(pts, "features",
      eps, knownDim = graft.sources.BinaryPoints.header(path)._2)
    graft.operators.Dbscan.run(pts, "id", "features", eps, minPts, dims,
      localThreshold = localThreshold)
  }
}
