package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** Pareto frontier (skyline): rows not dominated by any other row, where
  * `b` dominates `a` iff `b` is ≤ `a` on every criterion and < on at
  * least one (all criteria minimized; negate a column to maximize).
  * Multi-objective shortlisting — "no part is both cheaper and smaller"
  * — that no single ORDER BY can express.
  *
  * Scale shape: the two-phase distributed-skyline decomposition. Phase 1
  * prunes each partition to its LOCAL skyline with an in-memory dominance
  * buffer (narrow, no shuffle; the global skyline is a subset of the
  * union of local skylines, so the prune is lossless). Phase 2 removes
  * cross-partition dominance with a broadcast nested-loop ANTI join of
  * the candidate set against itself — candidates are the only rows that
  * ever move, and skylines of low-dimensional data are tiny relative to
  * input (anti-correlated worst cases grow the frontier itself, at which
  * point no exact algorithm returns a small answer). Equal-on-all-criteria
  * rows do not dominate each other: ties survive together.
  */
object Skyline {

  /** Rows of `df` not dominated on `criteria` (all minimized).
    * Criteria columns must be non-null numerics. Output schema = input
    * schema, original rows preserved. */
  def pareto(df: DataFrame, criteria: Seq[String]): DataFrame = {
    require(criteria.nonEmpty, "at least one criterion")
    val schema = df.schema
    val idx = criteria.map { c =>
      val i = schema.fieldIndex(c)
      require(schema(i).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"criterion $c must be numeric")
      i
    }

    // phase 1: per-partition skyline via a dominance buffer. Exact within
    // the partition; across partitions it is a lossless candidate prune.
    val local = df.mapPartitions { it =>
      val buf = ArrayBuffer.empty[(Array[Double], Row)]
      it.foreach { row =>
        val v = idx.map(i => row.getAs[Number](i).doubleValue()).toArray
        var dominated = false
        var j = 0
        while (j < buf.length && !dominated) {
          val u = buf(j)._1
          if (dominates(u, v)) dominated = true
          else if (dominates(v, u)) { // incoming row evicts buffered ones
            buf(j) = buf(buf.length - 1); buf.remove(buf.length - 1)
            j -= 1 // re-check the swapped-in element
          }
          j += 1
        }
        if (!dominated) buf += ((v, row))
      }
      buf.iterator.map(_._2)
    }(org.apache.spark.sql.Encoders.row(schema))

    // phase 2: global pass — drop candidates dominated by any other
    // candidate. Both sides are the (small) candidate set; broadcast the
    // build side so the anti join never shuffles.
    val cand = local
    val other = cand.select(criteria.map(c => col(c).as(s"__o_$c")): _*)
    val allLe = criteria.map(c => col(s"__o_$c") <= col(c)).reduce(_ && _)
    val oneLt = criteria.map(c => col(s"__o_$c") < col(c)).reduce(_ || _)
    cand.join(broadcast(other), allLe && oneLt, "left_anti")
  }

  private def dominates(b: Array[Double], a: Array[Double]): Boolean = {
    var allLe = true
    var oneLt = false
    var i = 0
    while (i < b.length && allLe) {
      if (b(i) > a(i)) allLe = false
      else if (b(i) < a(i)) oneLt = true
      i += 1
    }
    allLe && oneLt
  }
}
