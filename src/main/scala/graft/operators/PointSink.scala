package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Output-side parity with the reference (ops K-1/K-2 + C-6).
  *
  * The reference writes netCDF with columns `position_col_X0 ..
  * position_col_X{D-1}` (float) + `cluster_id` (int), noise id 0
  * (`dbscan.cpp:546-569`, `:399`). Our canonical sink is parquet; this
  * projection reproduces the reference's exact column layout so a
  * reference consumer can read our output unchanged. For the literal
  * netCDF-3 classic FILE (byte-level parity, library-free), see
  * [[graft.sources.NetcdfPoints]].
  */
object PointSink {

  /** points (`idCol`, `vecCol: array<float>`) ⋈ labels (`id`, `cluster_id`)
    * → reference column layout. */
  def toReferenceLayout(points: DataFrame, labels: DataFrame,
      idCol: String, vecCol: String, dims: Int): DataFrame = {
    val posCols = (0 until dims).map(d =>
      element_at(col(vecCol), d + 1).as(s"position_col_X$d"))
    points.join(labels, points(idCol) === labels("id"))
      .select(posCols :+ col("cluster_id").cast("int").as("cluster_id"): _*)
  }

  /** The vestigial sampling gate (op C-6): the reference accepts
    * `-k seeds / -p pct` but never applies them (`mpi_main.cpp:134` TODO).
    * We implement the intended semantics: a seeded Bernoulli sample
    * pre-stage — deterministic for a fixed seed. */
  def sampleGate(points: DataFrame, fraction: Double,
      seed: Long = 42L): DataFrame =
    if (fraction >= 1.0) points else points.sample(withReplacement = false, fraction, seed)
}
