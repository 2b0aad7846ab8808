package graft

import graft.operators.IncrementalDbscan
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The fused single-task state builds must be BIT-IDENTICAL to the
  * distributed incremental folds — every state table, row for row (the
  * AnnSearchLocalSpec discipline applied to IncrementalDbscan). */
class IncrementalDbscanLocalSpec extends SparkSpec {

  // SparkEntry's q164/q231/q235 geometry (Eps=1.2, MinPts=8) — the
  // fixture actually clusters at this radius, so the equality is
  // exercised on non-trivial cores/borders/components
  private val Eps = 1.2
  private val MinPts = 8

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").persist()

  private def tbl(df: DataFrame): Seq[Seq[String]] =
    df.collect().map(_.toSeq.map(String.valueOf)).toSeq.sorted(
      Ordering.by((s: Seq[String]) => s.mkString("|")))

  private def assertStateEqual(a: IncrementalDbscan.State,
      b: IncrementalDbscan.State): Unit = {
    assert(tbl(a.points.select("id")) == tbl(b.points.select("id")),
      "points differ")
    assert(tbl(a.counts) == tbl(b.counts), "counts differ")
    assert(tbl(a.coreComp) == tbl(b.coreComp), "coreComp differ")
    assert(tbl(a.borderPairs) == tbl(b.borderPairs), "borderPairs differ")
  }

  test("init: fused state == distributed state, all four tables") {
    val fused = IncrementalDbscan.init(emb, "vec_id", "embedding",
      Eps, MinPts, Nil)
    val dist = IncrementalDbscan.init(emb, "vec_id", "embedding",
      Eps, MinPts, Nil, localThreshold = 0L)
    assertStateEqual(fused, dist)
    assert(fused.counts.count() > 0, "degenerate fixture: no pairs")
  }

  test("addPoints: fused fold == distributed fold") {
    val old = emb.filter(col("vec_id") % 10 =!= 0)
    val batch = emb.filter(col("vec_id") % 10 === 0)
    val f = IncrementalDbscan.addPoints(
      IncrementalDbscan.pin(IncrementalDbscan.init(old, "vec_id",
        "embedding", Eps, MinPts, Nil)),
      batch, "vec_id", "embedding", Eps, MinPts, Nil)
    val d = IncrementalDbscan.addPoints(
      IncrementalDbscan.pin(IncrementalDbscan.init(old, "vec_id",
        "embedding", Eps, MinPts, Nil, localThreshold = 0L)),
      batch, "vec_id", "embedding", Eps, MinPts, Nil,
      localThreshold = 0L)
    assertStateEqual(f, d)
    // and labels downstream agree too (the user-facing contract)
    assert(tbl(IncrementalDbscan.labels(f)) ==
      tbl(IncrementalDbscan.labels(d)))
  }

  test("removePoints: fused fold == distributed fold (+ unknown ids)") {
    val rm = emb.filter(col("vec_id") % 7 === 0).select("vec_id")
      .unionAll(spark.range(900000, 900005).select(
        col("id").as("vec_id"))) // unknown ids must be ignored
    val f = IncrementalDbscan.removePoints(
      IncrementalDbscan.pin(IncrementalDbscan.init(emb, "vec_id",
        "embedding", Eps, MinPts, Nil)),
      rm, "vec_id", Eps, MinPts, Nil)
    val d = IncrementalDbscan.removePoints(
      IncrementalDbscan.pin(IncrementalDbscan.init(emb, "vec_id",
        "embedding", Eps, MinPts, Nil, localThreshold = 0L)),
      rm, "vec_id", Eps, MinPts, Nil, localThreshold = 0L)
    assertStateEqual(f, d)
    assert(tbl(IncrementalDbscan.labels(f)) ==
      tbl(IncrementalDbscan.labels(d)))
  }

  test("state round-trip through saveState/loadState stays fused-equal") {
    val p = java.nio.file.Files.createTempDirectory("graft_state_spec")
    try {
      val st0 = IncrementalDbscan.pin(IncrementalDbscan.init(emb,
        "vec_id", "embedding", Eps, MinPts, Nil))
      IncrementalDbscan.saveState(st0, p.toString, Eps, MinPts, Nil)
      val st1 = IncrementalDbscan.loadState(spark, p.toString, Eps,
        MinPts, Nil)
      val rm = emb.filter(col("vec_id") % 10 === 0).select("vec_id")
      val f = IncrementalDbscan.removePoints(st1, rm, "vec_id", Eps,
        MinPts, Nil)
      val d = IncrementalDbscan.removePoints(st1, rm, "vec_id", Eps,
        MinPts, Nil, localThreshold = 0L)
      assertStateEqual(f, d)
    } finally Workloads.deleteTree(p.toString)
  }

  test("minPts <= 1: every point is core in both paths") {
    val f = IncrementalDbscan.init(emb, "vec_id", "embedding", Eps, 1, Nil)
    val d = IncrementalDbscan.init(emb, "vec_id", "embedding", Eps, 1,
      Nil, localThreshold = 0L)
    assertStateEqual(f, d)
    assert(f.coreComp.count() == emb.count(),
      "minPts=1 must make every point core")
  }
}
