package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {

  import spark.implicits._

  /** Deterministic pseudo-random in [-1, 1) from (i, tag). */
  private def u(i: Int, tag: Int): Double = {
    val h = scala.util.hashing.MurmurHash3.productHash((i, tag))
    (h.toDouble / Int.MaxValue.toDouble) % 1.0
  }

  private def mkDf(rows: Seq[Array[Float]]) =
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))

  test("covariance matches a naive driver computation (quantization-close)") {
    val d = 5
    val rows = (0 until 400).map(i =>
      Array.tabulate(d)(k => (u(i, k) * 0.5).toFloat))
    val got = Pca.covariance(mkDf(rows), "embedding", d)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    assert(got.size == d * (d + 1) / 2)
    val n = rows.size.toDouble
    for (i <- 0 until d; j <- i until d) {
      val exy = rows.map(r => r(i).toDouble * r(j).toDouble).sum / n
      val ex = rows.map(_(i).toDouble).sum / n
      val ey = rows.map(_(j).toDouble).sum / n
      val naive = exy - ex * ey
      assert(math.abs(got((i, j)) - naive) < 2e-6,
        s"cov($i,$j): ${got((i, j))} vs naive $naive")
    }
  }

  test("covariance is exactly partitioning-invariant (integer moments)") {
    val rows = (0 until 300).map(i =>
      Array.tabulate(6)(k => (u(i, k + 10) * 0.4).toFloat))
    val a = Pca.covariance(mkDf(rows), "embedding", 6).collect().toSet
    val b = Pca.covariance(mkDf(rows).repartition(13), "embedding", 6)
      .collect().toSet
    assert(a == b)
  }

  test("topComponent recovers a planted dominant direction") {
    val d = 8
    // unit direction u ~ (1,1,...)/sqrt(d); x = t*dir + small noise
    val dir = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    val rows = (0 until 500).map { i =>
      val tt = u(i, 99) * 2.0 // strong signal along dir
      Array.tabulate(d)(k => (tt * dir(k) + u(i, k) * 0.05).toFloat)
    }
    val (lambda, v) = Pca.topComponent(mkDf(rows), "embedding", d)
    val cos = v.zip(dir).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.995, s"eigvec misaligned: cos=$cos")
    // eigenvalue ~ variance of t (u(i,99) in [-1,1) * 2 -> var ~ 4/3)
    assert(lambda > 0.5 && lambda < 3.0, s"lambda=$lambda")
    // sign convention: leading nonzero coordinate positive
    assert(v(v.indexWhere(_ != 0.0)) > 0)
    // deterministic across reruns and partitionings
    val (l2, v2) = Pca.topComponent(mkDf(rows).repartition(7),
      "embedding", d)
    assert(l2 == lambda && v2.sameElements(v))
  }

  test("topComponents: deflation recovers two planted orthogonal axes") {
    val d = 6
    // two orthogonal planted directions with well-separated variances
    val u1 = Array(1.0, 1.0, 0.0, 0.0, 0.0, 0.0).map(_ / math.sqrt(2.0))
    val u2 = Array(0.0, 0.0, 1.0, -1.0, 0.0, 0.0).map(_ / math.sqrt(2.0))
    val rows = (0 until 600).map { i =>
      val t1 = u(i, 7) * 3.0  // dominant axis
      val t2 = u(i, 8) * 1.0  // secondary axis
      Array.tabulate(d)(k =>
        (t1 * u1(k) + t2 * u2(k) + u(i, k + 20) * 0.03).toFloat)
    }
    val comps = Pca.topComponents(mkDf(rows), "embedding", d, k = 2)
    assert(comps.size == 2)
    val Seq((l1, v1), (l2, v2)) = comps
    assert(l1 > l2 && l2 > 0, s"eigenvalues not descending: $l1, $l2")
    def cos(a: Array[Double], b: Array[Double]) =
      math.abs(a.zip(b).map { case (x, y) => x * y }.sum)
    assert(cos(v1, u1) > 0.99, s"first axis misaligned: ${cos(v1, u1)}")
    assert(cos(v2, u2) > 0.99, s"second axis misaligned: ${cos(v2, u2)}")
    assert(cos(v1, v2) < 0.02, "components not orthogonal")
    assertThrows[IllegalArgumentException] {
      Pca.topComponents(mkDf(rows), "embedding", d, k = d + 1)
    }
  }

  test("project: hand-checked dot products against the component") {
    val df = mkDf(Seq(Array(1f, 0f, 2f), Array(0.5f, 1f, -1f)))
    val got = Pca.project(df, "vec_id", "embedding",
      Array(0.5, 0.25, 0.125))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(0L) == 0.75) // 0.5 + 0 + 0.25
    assert(got(1L) == 0.375) // 0.25 + 0.25 - 0.125
  }

  test("degenerate input (all-identical vectors) yields eigenvalue 0, " +
      "not a crash") {
    // Zero covariance maps every start vector to zero — a valid corpus
    // (deduplicated to one template, or a single row) must not abort
    // the job.
    val d = 4
    val rows = (0 until 50).map(_ => Array(1f, 2f, 3f, 4f))
    val (lambda, v) = Pca.topComponent(mkDf(rows), "embedding", d)
    assert(lambda == 0.0)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-12) // still unit
    val single = Pca.topComponents(mkDf(Seq(Array(9f, 8f, 7f, 6f))),
      "embedding", d, k = 2)
    assert(single.forall(_._1 == 0.0))
  }

  test("moment aggregate rejects short rows and wrong types") {
    val df = mkDf(Seq(Array(1f, 2f)))
    assertThrows[Exception] {
      Pca.covariance(df, "embedding", 3).collect()
    }
    assertThrows[org.apache.spark.sql.AnalysisException] {
      spark.range(3).select(col("id").as("embedding"))
        .agg(Pca.moments(col("embedding"), 2)).collect()
    }
  }
}
