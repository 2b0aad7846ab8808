package graft

import graft.operators.FuzzyJoin
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def run(vals: Seq[String]): Set[(String, String, Int)] =
    FuzzyJoin.selfJoinEd1(
      spark.createDataFrame(vals.map(Tuple1(_))).toDF("s"), "s")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

  private def brute(vals: Seq[String]): Set[(String, String, Int)] = {
    val n = vals.filter(_ != null).distinct
    (for {
      a <- n; b <- n if a < b
      d = lev(a, b) if d <= 1
    } yield (a, b, d)).toSet
  }

  test("hand cases: substitution/indel match, transposition filtered") {
    val vals = Seq("red bolt", "red colt", "red bol", "redd bolt",
      "red oblt", // ed 2 from 'red bolt' via transposition — shares a
                  // deletion variant but must be filtered out
      "blue gear", null)
    assert(run(vals) == brute(vals))
    val got = run(vals)
    assert(got.contains(("red bolt", "red colt", 1))) // substitution
    assert(got.contains(("red bol", "red bolt", 1)))  // insertion
    assert(!got.exists(p => p._1 == "red oblt" || p._2 == "red oblt"))
  }

  test("random strings == brute force (duplicates and empties included)") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abc"
    val vals = Seq.fill(300)(
      (0 until rnd.nextInt(5)).map(_ => alphabet(rnd.nextInt(3))).mkString)
    // short strings over a 3-letter alphabet force dense ed-1 structure,
    // empty strings, and duplicate values all at once
    assert(run(vals) == brute(vals))
  }
}
