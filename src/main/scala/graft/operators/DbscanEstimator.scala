package graft.operators

import org.apache.spark.sql.DataFrame

/** spark.ml-style front door for DBSCAN (SURVEY §7 design stance: the
  * clustering is both a `DataFrame → DataFrame` transform — [[Dbscan.run]]
  * — and this fluent estimator). DBSCAN is transductive (labels exist only
  * for the fitted points), so `fit` returns a model holding the labels,
  * and the model's `transform` joins them onto the input by id.
  *
  * {{{
  *   val model = new DbscanEstimator()
  *     .setEps(25.0).setMinPts(5)
  *     .setIdCol("id").setFeaturesCol("features")
  *     .fit(points)
  *   model.transform(points)   // + cluster_id column
  *   model.stats               // reference-style report (K-2)
  * }}}
  */
class DbscanEstimator {
  private var eps: Double = 0.5
  private var minPts: Int = 5
  private var idCol: String = "id"
  private var featuresCol: String = "features"
  private var bucketDims: Option[Seq[Int]] = None
  private var maxBucketDims: Int = 3
  private var minClusterSize: Int = 2
  private var samplePct: Double = 1.0

  def setEps(v: Double): this.type = { eps = v; this }
  def setMinPts(v: Int): this.type = { minPts = v; this }
  def setIdCol(v: String): this.type = { idCol = v; this }
  def setFeaturesCol(v: String): this.type = { featuresCol = v; this }
  /** Fix bucket dims explicitly (otherwise chosen by spread — see
    * [[EpsilonJoin.pickBucketDims]]). */
  def setBucketDims(v: Seq[Int]): this.type = { bucketDims = Some(v); this }
  def setMaxBucketDims(v: Int): this.type = { maxBucketDims = v; this }
  def setMinClusterSize(v: Int): this.type = { minClusterSize = v; this }
  /** The reference's vestigial `-p` sampling gate (op C-6), actually
    * applied here. */
  def setSamplePct(v: Double): this.type = { samplePct = v; this }

  def fit(points: DataFrame): DbscanModel = {
    val pts = PointSink.sampleGate(points, samplePct).persist()
    val dims = bucketDims.getOrElse(
      EpsilonJoin.pickBucketDims(pts, featuresCol, eps, maxBucketDims))
    val labels = Dbscan.run(pts, idCol, featuresCol, eps, minPts, dims,
      minClusterSize)
    new DbscanModel(labels, idCol)
  }
}

/** Fitted DBSCAN labels. `labels`: (`id`, `cluster_id`), noise = 0. */
class DbscanModel(val labels: DataFrame, idCol: String) {
  /** Join cluster ids onto any table carrying the fitted id column. */
  def transform(df: DataFrame): DataFrame =
    df.join(labels.withColumnRenamed("id", idCol), Seq(idCol), "left")

  /** The reference's end-of-run report (op K-2). */
  def stats: DataFrame = Dbscan.stats(labels)
}
