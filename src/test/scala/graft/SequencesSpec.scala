package graft

import graft.operators.Sequences
import org.apache.spark.sql.functions._

class SequencesSpec extends SparkSpec {

  // user 1: a(1) b(2) a(3) c(4); user 2: b(1) b(2) a(3); user 3: c(5)
  private def events = spark.createDataFrame(Seq(
    (1L, "a", 1L, 10L), (1L, "b", 2L, 11L), (1L, "a", 3L, 12L),
    (1L, "c", 4L, 13L),
    (2L, "b", 1L, 20L), (2L, "b", 2L, 21L), (2L, "a", 3L, 22L),
    (3L, "c", 5L, 30L)
  )).toDF("u", "t", "ms", "eid")

  test("transitions: counts and conditional probabilities") {
    val got = Sequences.transitions(events, "u", "t", "ms", Seq("eid"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // steps: u1 a→b, b→a, a→c; u2 b→b, b→a
    assert(got == Map(
      ("a", "b") -> (1L, 0.5), ("a", "c") -> (1L, 0.5),
      ("b", "a") -> (2L, round2(2.0 / 3)), ("b", "b") -> (1L, round2(1.0 / 3))))
  }

  private def round2(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("transitions: ms ties broken by the tie column") {
    val df = spark.createDataFrame(Seq(
      (1L, "x", 5L, 1L), (1L, "y", 5L, 2L), (1L, "z", 5L, 3L)
    )).toDF("u", "t", "ms", "eid")
    val got = Sequences.transitions(df, "u", "t", "ms", Seq("eid"))
      .select("src_type", "dst_type").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("x", "y"), ("y", "z")))
  }

  test("precedencePairs: exists-before via min/max spans") {
    val got = Sequences.precedencePairs(events, "u", "t", "ms")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // u1: a<b yes (1<2), b<a yes (2<3), a<c, b<c, c<a? c max... c(4) vs
    // a max 3 → no; u2: b<a yes (1<3), a<b? min a=3 < max b=2 no
    assert(got == Map(
      ("a", "b") -> 1L, ("b", "a") -> 2L,
      ("a", "c") -> 1L, ("b", "c") -> 1L))
  }

  test("precedencePairs: strict ordering excludes simultaneous-only pairs") {
    val df = spark.createDataFrame(Seq(
      (1L, "x", 5L), (1L, "y", 5L)
    )).toDF("u", "t", "ms")
    assert(Sequences.precedencePairs(df, "u", "t", "ms").count() == 0)
  }

  test("patternTriples: hand case incl. repeated types needing 3 instants") {
    val df = spark.createDataFrame(Seq(
      (1L, "A", 1L), (1L, "B", 2L), (1L, "C", 3L), // A<B<C only
      (2L, "A", 1L), (2L, "A", 2L), (2L, "A", 3L), // A<A<A (3 instants)
      (3L, "A", 1L), (3L, "A", 2L)                 // only 2 — no triple
    )).toDF("u", "t", "ms")
    val got = Sequences.patternTriples(df, "u", "t", "ms")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
    assert(got == Map(("A", "B", "C") -> 1L, ("A", "A", "A") -> 1L))
  }

  test("patternTriples == brute-force subsequence check on random logs") {
    val rnd = new scala.util.Random(67)
    val types = Seq("a", "b", "c", "d")
    val rows = (1 to 500).map(_ => (rnd.nextInt(30).toLong,
      types(rnd.nextInt(types.size)), rnd.nextInt(12).toLong))
    val df = spark.createDataFrame(rows).toDF("u", "t", "ms")
      .repartition(5)
    val got = Sequences.patternTriples(df, "u", "t", "ms")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
    val byKey = rows.distinct.groupBy(_._1)
    val brute = (for {
      ta <- types; tb <- types; tc <- types
      n = byKey.values.count { es =>
        es.exists { case (_, t1, m1) => t1 == ta &&
          es.exists { case (_, t2, m2) => t2 == tb && m2 > m1 &&
            es.exists { case (_, t3, m3) => t3 == tc && m3 > m2 } } }
      }
      if n > 0
    } yield (ta, tb, tc) -> n.toLong).toMap
    assert(got == brute)
  }
}
