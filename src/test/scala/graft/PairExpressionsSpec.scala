package graft

import graft.functions.PairExpressions
import org.apache.spark.sql.functions._

import scala.util.Random

/** The two pair kernels exist in two forms each — array-returning (SQL
  * surface) and lazy generator (operator surface). All four must agree
  * with a plain Scala reference on arbitrary posting lists. */
class PairExpressionsSpec extends SparkSpec {

  private val rnd = new Random(11)

  test("generator == array form == scala reference (plain pairs)") {
    val lists = Seq.fill(30)(
      Seq.fill(rnd.nextInt(12))(rnd.nextInt(20).toLong).distinct.sorted) ++
      Seq(Seq.empty[Long], Seq(7L))
    val df = spark.createDataFrame(lists.map(Tuple1(_))).toDF("ids")
    val viaArray = df.select(explode(PairExpressions.postingPairs(col("ids"))).as("p"))
      .select(col("p.a_id"), col("p.b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val viaGen = df.select(PairExpressions.explodePostingPairs(col("ids")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val ref = lists.flatMap(ids =>
      for (i <- ids.indices; j <- i + 1 until ids.length)
        yield (ids(i), ids(j))).sorted
    assert(viaGen.toSeq == ref)
    assert(viaArray.toSeq == ref)
  }

  test("generator == array form == scala reference (size pairs + filter)") {
    val t = 0.4
    val lists = Seq.fill(30)(
      Seq.fill(rnd.nextInt(10))(
        (rnd.nextInt(100).toLong, 1L + rnd.nextInt(50)))
        .distinctBy(_._1).sortBy(_._1)) ++
      Seq(Seq.empty[(Long, Long)], Seq((3L, 9L)))
    val df = spark.createDataFrame(lists.map(Tuple1(_))).toDF("raw")
      .select(expr("transform(raw, x -> struct(x._1 AS id, x._2 AS sz))").as("ids"))
    val viaArray = df.select(
        explode(PairExpressions.postingPairsWithSize(col("ids"), t)).as("p"))
      .select(col("p.a_id"), col("p.b_id"), col("p.a_sz"), col("p.b_sz"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted
    val viaGen = df.select(
        PairExpressions.explodePostingPairsWithSize(col("ids"), t))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted
    val ref = lists.flatMap(ids =>
      for {
        i <- ids.indices; j <- i + 1 until ids.length
        (a, asz) = ids(i); (b, bsz) = ids(j)
        if math.min(asz, bsz).toDouble / math.max(asz, bsz) >= t
      } yield (a, b, asz, bsz)).sorted
    assert(viaGen.toSeq == ref)
    assert(viaArray.toSeq == ref)
  }

  test("array form rejects lists past its one-row allocation cap; the " +
      "generator streams the same list fine") {
    val n = PairExpressions.maxArrayPostingLength + 1
    val big = (0L until n.toLong).toSeq
    val df = spark.createDataFrame(Seq(Tuple1(big))).toDF("ids")
    val e = intercept[org.apache.spark.SparkException] {
      df.select(explode(PairExpressions.postingPairs(col("ids")))).count()
    }
    assert(e.getMessage.contains("explode_posting_pairs") ||
      Option(e.getCause).exists(_.getMessage.contains("explode_posting_pairs")))
    // the same list is legal for the O(1)-memory generator
    val got = df.select(PairExpressions.explodePostingPairs(col("ids"))).count()
    assert(got == n.toLong * (n - 1) / 2)
  }

  test("generator rejects stopword-grade lists past maxPostingLength") {
    val big = (0L until (PairExpressions.maxPostingLength + 1).toLong).toSeq
    val df = spark.createDataFrame(Seq(Tuple1(big))).toDF("ids")
    for (gen <- Seq(
        PairExpressions.explodePostingPairs(col("ids")),
        PairExpressions.explodePostingPairsWithSize(
          expr("transform(ids, x -> struct(x AS id, 5L AS sz))"), 0.5))) {
      val e = intercept[org.apache.spark.SparkException] {
        df.select(gen).count()
      }
      assert(e.getMessage.contains("maxDocFreq") ||
        Option(e.getCause).exists(_.getMessage.contains("maxDocFreq")))
    }
  }
}
