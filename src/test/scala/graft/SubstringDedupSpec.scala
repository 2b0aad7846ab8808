package graft

import graft.operators.SubstringDedup
import org.apache.spark.sql.functions._

/** ExactSubstr spans against a brute-force in-memory oracle: enumerate
  * every L-char window, count content multiplicity corpus-wide, merge
  * consecutive duplicated starts, union char intervals. Exercises the
  * cases the fixture may not: same-doc repeats, spans overlapping by
  * < L chars, docs shorter than L, a doc that is one giant dup. */
class SubstringDedupSpec extends SparkSpec {

  private val L = 8
  private val corpus: Seq[(Long, String)] = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    // shares a long run with doc 1 -> cross-doc span
    2L -> "xx the quick brown fox sleeps",
    // internal repeat: same 12-char phrase twice in ONE doc
    3L -> "abcdefghijkl....abcdefghijkl",
    // entirely duplicated: exact copy of doc 2
    4L -> "xx the quick brown fox sleeps",
    // shorter than L: must be ignored, not crash
    5L -> "tiny",
    // no duplicated window anywhere
    6L -> "zzzz unique content 0123456789 qqqq")

  private def bruteSpans: Map[Long, Set[(Long, Long, Long)]] = {
    val wins = corpus.flatMap { case (id, t) =>
      (0 to t.length - L).map(p => (id, p + 1L, t.substring(p, p + L)))
    }
    val mult = wins.groupBy(_._3).map { case (w, g) => w -> g.size }
    val dup = wins.filter(w => mult(w._3) > 1)
    dup.groupBy(_._1).map { case (id, ps) =>
      val sorted = ps.map(_._2).sorted
      // merge consecutive starts into runs
      val runs = sorted.foldLeft(List.empty[(Long, Long, Long)]) {
        case ((s, e, n) :: rest, p) if p == e + 1 => (s, p, n + 1) :: rest
        case (acc, p) => (p, p, 1L) :: acc
      }
      id -> runs.map { case (s, e, n) => (s, e - s + L, n) }.toSet
    }
  }

  test("duplicatedSpans == brute-force oracle (same-doc repeats, " +
      "full-doc dups, short docs)") {
    val df = spark.createDataFrame(corpus).toDF("doc_id", "text")
      .repartition(4)
    val got = SubstringDedup.duplicatedSpans(df, "doc_id", "text", L)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      }
    val exp = bruteSpans
    assert(got == exp, s"got=$got\nexp=$exp")
    // the planted cases actually fire
    assert(exp.contains(3L), "same-doc repeat must produce spans")
    assert(exp(2L) == exp(4L), "identical docs must get identical spans")
    assert(!exp.contains(5L) && !exp.contains(6L))
  }

  test("duplicatedCharStats unions overlapping span intervals exactly") {
    val df = spark.createDataFrame(corpus).toDF("doc_id", "text")
    val got = SubstringDedup.duplicatedCharStats(df, "doc_id", "text", L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // brute: union of [p, p+L-1] for every duplicated start p
    val exp = bruteSpans.map { case (id, spans) =>
      val chars = spans.flatMap { case (s, len, _) => s until (s + len) }
      id -> ((corpus.find(_._1 == id).get._2.length.toLong,
        chars.size.toLong))
    }
    assert(got == exp, s"got=$got\nexp=$exp")
    // doc 4 is a verbatim copy of doc 2: every char duplicated
    assert(got(4L)._1 == got(4L)._2, "full-copy doc must be 100% covered")
  }
}
