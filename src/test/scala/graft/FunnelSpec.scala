package graft

import graft.operators.Funnel
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {

  private val Steps = Seq("view", "click", "purchase")

  /** brute-force funnel: first step-1 event, then first step-i event
    * at-or-after step-{i-1}'s (within the horizon), else chain breaks */
  private def ref(evs: Seq[(Long, Long, String)], within: Option[Long])
      : Map[Long, Seq[Option[Long]]] =
    evs.filter(e => Steps.contains(e._3)).groupBy(_._1).map { case (u, es) =>
      val first = es.filter(_._3 == Steps.head).map(_._2).minOption
      val chain = Steps.tail.scanLeft(first) { (prev, step) =>
        prev.flatMap { p =>
          es.filter(e => e._3 == step && e._2 >= p &&
            within.forall(t => e._2 <= p + t)).map(_._2).minOption
        }
      }
      u -> chain
    }

  private def run(evs: Seq[(Long, Long, String)], within: Option[Long]) = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(evs, 4)).toDF("user_id", "ms", "etype")
    Funnel.steps(df, "user_id", "ms", "etype", Steps, within)
      .collect().map(r => r.getLong(0) ->
        (1 to 3).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i))).toSeq)
      .toMap
  }

  test("funnel == brute force on random event streams") {
    val rnd = new scala.util.Random(31)
    val types = Seq("view", "click", "purchase", "error", "signup")
    val evs = (0 until 2000).map(_ => (rnd.nextInt(40).toLong,
      rnd.nextInt(500).toLong, types(rnd.nextInt(types.size))))
    for (within <- Seq(None, Some(50L), Some(5L)))
      assert(run(evs, within) == ref(evs, within), s"within=$within")
  }

  test("chain semantics: ties qualify, horizon binds, broken chain stays null") {
    val evs = Seq(
      (1L, 100L, "view"), (1L, 100L, "click"), (1L, 150L, "purchase"),
      (2L, 100L, "view"), (2L, 300L, "click"),   // click outside horizon
      (3L, 100L, "click"), (3L, 200L, "purchase"), // no view at all
      (4L, 100L, "view"), (4L, 90L, "click"))    // click BEFORE first view
    val got = run(evs, Some(100L))
    assert(got(1L) == Seq(Some(100L), Some(100L), Some(150L))) // tie at 100
    assert(got(2L) == Seq(Some(100L), None, None))
    assert(got(3L) == Seq(None, None, None)) // appears, but never viewed
    assert(got(4L) == Seq(Some(100L), None, None))
  }

  test("partition-count invariance") {
    val rnd = new scala.util.Random(5)
    val evs = (0 until 800).map(_ => (rnd.nextInt(20).toLong,
      rnd.nextInt(300).toLong, Steps(rnd.nextInt(3))))
    def at(parts: Int) = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(evs, parts)).toDF("user_id", "ms", "etype")
      Funnel.steps(df, "user_id", "ms", "etype", Steps, Some(60L))
        .collect().map(_.toSeq).toSet
    }
    assert(at(1) == at(7))
  }
}
