package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact frequency heavy hitters (count · k > n) in two phases —
  * the canonical "approximate candidates, exact verify" scale
  * pattern (same shape as the MinHash→verify and IVF→re-rank paths):
  *
  *   1. per-partition Misra–Gries summaries with k−1 counters. MG
  *      guarantees any item with partition count > partSize/k keeps a
  *      counter, and an item with GLOBAL count > n/k must exceed
  *      size_p/k in at least one partition (else summing the per-
  *      partition bounds gives ≤ n/k) — so the candidate union is a
  *      superset of every true heavy hitter. At most (k−1)·partitions
  *      candidate values, collected and broadcast.
  *   2. one exact count restricted to candidate rows (broadcast semi
  *      join BEFORE the aggregation shuffle), then the threshold
  *      filter `cnt · k > n` — integer arithmetic, no division.
  *
  * The long tail — the overwhelming majority of a Zipfian corpus —
  * never enters the aggregation: phase 1 reads it with O(k) state and
  * phase 2's shuffle carries candidate rows only. A plain
  * groupBy-count-HAVING shuffles every distinct value's partial
  * counts; at 100 TB of tokens that is the dominant exchange, while
  * this plan's exchange is bounded by candidates × partitions.
  *
  * The result is EXACT and partitioning-independent (phase 1 only
  * widens the candidate set; phase 2 decides membership exactly), so
  * a plain SQL GROUP BY / HAVING is a faithful oracle.
  */
object HeavyHitters {

  /** Items with count·k > n over `items(itemCol)`; NULLs are ignored.
    *
    * Exactly two passes over the data: phase 1 emits the MG candidate
    * keys AND the per-partition row counts in one job (the tiny
    * summary — ≤ k candidates + 1 count row per partition — is
    * persisted, so deriving n and the distinct candidate set doesn't
    * re-scan the input; cache released with the plan by the
    * ContextCleaner, as elsewhere). Phase 2 is the exact count.
    *
    * @return (item, cnt) — `itemCol`'s name is preserved. */
  def exactOverThreshold(items: DataFrame, itemCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark: SparkSession = items.sparkSession
    import spark.implicits._
    val vals = items.select(col(itemCol).cast("string"))
      .filter(col(itemCol).isNotNull)
    // phase 1: Misra–Gries per partition (k-1 counters) + row count;
    // count rows travel as (null, n_partial)
    val summary = vals.as[String].mapPartitions { it =>
      var nPart = 0L
      val counters = new scala.collection.mutable.HashMap[String, Long]
      it.foreach { v =>
        nPart += 1L
        if (counters.contains(v)) counters(v) += 1L
        else if (counters.size < k - 1) counters(v) = 1L
        else {
          // decrement-all; drop zeros. Each decrement event burns k
          // units of inserted count mass, so events ≤ n/k and the
          // total cost stays O(n).
          val dead = List.newBuilder[String]
          counters.mapValuesInPlace((_, c) => c - 1L)
          counters.foreach { case (key, c) => if (c == 0L) dead += key }
          dead.result().foreach(counters.remove)
        }
      }
      Iterator((null: String, nPart)) ++
        counters.keysIterator.map(key => (key, 0L))
    }.toDF(itemCol, "__n").persist()
    val n = summary.filter(col(itemCol).isNull)
      .agg(coalesce(sum("__n"), lit(0L))).head.getLong(0)
    val candidates = summary.filter(col(itemCol).isNotNull)
      .select(itemCol).distinct()
    // phase 2: exact count over candidate rows only; the broadcast
    // semi join prunes before the aggregation exchange
    vals.join(broadcast(candidates), Seq(itemCol), "left_semi")
      .groupBy(itemCol).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > n)
  }
}
