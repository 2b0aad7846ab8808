package graft

import graft.operators.Logistic
import org.apache.spark.sql.functions._

/** Batch-GD logistic regression (q202): learning on separable data,
  * exact partitioning invariance of the decimal-summed gradient, and
  * degenerate-input behavior. */
class LogisticSpec extends SparkSpec {

  /** splitmix-style uniform in [0,1). */
  private def u(i: Long, s: Long): Double = {
    var z = i * 1000 + s + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= z >>> 31
    (z & 0xFFFFFFFFFL).toDouble / 0x1000000000L.toDouble
  }

  private def planted(n: Int, margin: Double) = {
    import spark.implicits._
    // y = [2*a - b > 0.5], points pushed `margin` away from the boundary
    (0 until n).map { i =>
      val a = u(i, 1)
      val b = u(i, 2)
      val raw = 2 * a - b - 0.5
      val y = if (raw > 0) 1 else 0
      val shift = (if (raw > 0) margin else -margin) / 2
      (i.toLong, a + shift, b, y)
    }.toDF("id", "a", "b", "y")
  }

  test("learns a separable planted rule to high accuracy") {
    val df = planted(2000, margin = 0.3).persist()
    val w = Logistic.fit(df, Seq(col("a"), col("b")), col("y"),
      lr = 5.0, iters = 120)
    // direction must match the planted rule (+a, -b)
    assert(w(1) > 0 && w(2) < 0, s"wrong direction: ${w.toSeq}")
    val acc = df.select(
        (when((Logistic.sigmoid(Seq(col("a"), col("b")), w) > 0.5)
          .cast("int") === col("y"), 1).otherwise(0)).as("hit"))
      .agg(avg(col("hit"))).head.getDouble(0)
    assert(acc > 0.95, s"accuracy $acc after 120 iters")
    df.unpersist()
  }

  test("weights are bit-identical across partitionings") {
    val df = planted(500, margin = 0.1)
    val w1 = Logistic.fit(df, Seq(col("a"), col("b")), col("y"),
      lr = 2.0, iters = 5)
    val w2 = Logistic.fit(df.repartition(13), Seq(col("a"), col("b")),
      col("y"), lr = 2.0, iters = 5)
    assert(w1.sameElements(w2),
      s"partitioning changed weights: ${w1.toSeq} vs ${w2.toSeq}")
  }

  test("all-one-label input drives the bias toward that label") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, u(i, 3), 1))
      .toDF("id", "a", "y")
    val w = Logistic.fit(df, Seq(col("a")), col("y"), lr = 5.0, iters = 50)
    assert(w(0) > 0.5, s"bias ${w(0)} should push toward p > 0.5")
    val p = df.select(avg(Logistic.sigmoid(Seq(col("a")), w)))
      .head.getDouble(0)
    assert(p > 0.8, s"mean p $p after 50 one-label iters")
  }

  test("empty input and bad params fail loudly") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Double, Int)].toDF("id", "a", "y")
    intercept[IllegalArgumentException] {
      Logistic.fit(empty, Seq(col("a")), col("y"), lr = 1.0, iters = 3)
    }
    val one = Seq((1L, 0.5, 1)).toDF("id", "a", "y")
    intercept[IllegalArgumentException] {
      Logistic.fit(one, Seq(col("a")), col("y"), lr = 1.0, iters = 0)
    }
    intercept[IllegalArgumentException] {
      Logistic.sigmoid(Seq(col("a")), Array(0.0)) // needs 2 weights
    }
  }
}
