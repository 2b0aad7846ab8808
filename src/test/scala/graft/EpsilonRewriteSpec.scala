package graft

import graft.functions.VectorExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The injected optimizer rule: `squared_l2 <= ε²` (and the mirrored
  * `ε² >= squared_l2`) becomes the early-exit within_eps kernel;
  * strict/dynamic forms are left alone; results are unchanged. */
class EpsilonRewriteSpec extends SparkSpec {

  // registering the rule mutates experimental.extraOptimizations — do it
  // on a DERIVED session (own SessionState, shared SparkContext) so the
  // shared SparkSpec session's plans stay rule-free for every other
  // suite, regardless of execution order
  private lazy val s2: org.apache.spark.sql.SparkSession = {
    val s = spark.newSession()
    GraftExtensions.register(s)
    s
  }

  private def opt(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  private def pts = s2.createDataFrame(Seq(
    (1L, Array(0f, 0f)), (2L, Array(3f, 4f)), (3L, Array(10f, 0f))
  )).toDF("id", "v")

  test("DataFrame and SQL radius predicates rewrite to within_eps") {
    val d2 = VectorExpressions.squaredL2(col("a.v"), col("b.v"))
    val dfForm = pts.as("a").crossJoin(pts.as("b")).filter(d2 <= lit(25.0))
    assert(opt(dfForm).contains("within_eps"), opt(dfForm))
    assert(!opt(dfForm).contains("squared_l2"), opt(dfForm))
    // boundary row (d2 == 25.0 exactly) must stay included
    assert(dfForm.filter(col("a.id") === 1 && col("b.id") === 2).count() == 1)

    pts.createOrReplaceTempView("eps_pts")
    val sqlForm = s2.sql(
      """SELECT a.id, b.id FROM eps_pts a JOIN eps_pts b
        |ON squared_l2(a.v, b.v) <= 25.0 AND a.id != b.id""".stripMargin)
    assert(opt(sqlForm).contains("within_eps"), opt(sqlForm))
    assert(sqlForm.count() == 2) // (1,2) and (2,1)

    val mirrored = pts.as("a").crossJoin(pts.as("b"))
      .filter(lit(25.0) >= VectorExpressions.squaredL2(col("a.v"), col("b.v")))
    assert(opt(mirrored).contains("within_eps"))
  }

  test("strict <, dynamic thresholds, non-finite radii do not rewrite") {
    val d2 = VectorExpressions.squaredL2(col("a.v"), col("b.v"))
    // WithinEps requires a finite ε² — an Infinity radius is a legal
    // degenerate comparison and must plan (unrewritten), not throw
    val inf = pts.as("a").crossJoin(pts.as("b"))
      .filter(d2 <= lit(Double.PositiveInfinity))
    assert(!opt(inf).contains("within_eps"), opt(inf))
    assert(inf.count() == 9)
    // strict < has different boundary semantics
    val strict = pts.as("a").crossJoin(pts.as("b")).filter(d2 < lit(25.0))
    assert(!opt(strict).contains("within_eps"), opt(strict))
    // non-literal threshold: within_eps bakes ε² into codegen
    val dyn = pts.as("a").crossJoin(pts.as("b"))
      .filter(d2 <= col("a.id").cast("double"))
    assert(!opt(dyn).contains("within_eps"), opt(dyn))
    // a projected distance stays a projected distance
    val proj = pts.as("a").crossJoin(pts.as("b")).select(d2.as("d2"))
    assert(opt(proj).contains("squared_l2"), opt(proj))
  }
}
