package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-step funnel attribution: for each user, the timestamp of the
  * first event of step 1, then the first step-2 event at-or-after it
  * (within a horizon), then the first step-3 event at-or-after THAT, …
  * — the standard conversion-funnel computation of product analytics.
  * The reference engine has no such operator (SURVEY §2.6); this is
  * part of the events-pipeline extension surface.
  *
  * Spark-first plan — ONE shuffle: events are filtered to the step
  * types (predicate reaches the scan), hash-partitioned by user, and
  * each step's qualifying timestamp is a full-partition conditional
  * `min(...)` window over the SAME partitioning — k chained Window
  * nodes but zero additional exchanges, and the final per-user
  * collapse reuses the partitioning too (no shuffle before the
  * aggregate). No per-user event list is ever collected, so a hot user
  * with millions of events costs one fat partition, not driver memory.
  */
object Funnel {

  /** @param events   event log
    * @param userCol  entity column (funnel is computed per user)
    * @param tsCol    numeric event time (e.g. epoch millis)
    * @param typeCol  event-type column matched against `stepTypes`
    * @param stepTypes funnel steps in order; step i+1 must occur
    *                  at-or-after step i's qualifying event
    * @param withinTs max step-to-step delay in `tsCol`'s own unit
    *                 (step 1 is unconstrained); None = unbounded
    * @return one row per user having >= 1 event of ANY step type:
    *         (`userCol`, `step_1_ts`, …, `step_k_ts`), NULL where the
    *         chain broke */
  def steps(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stepTypes: Seq[String],
      withinTs: Option[Long] = None): DataFrame = {
    require(stepTypes.nonEmpty, "at least one funnel step")
    val relevant = events
      .filter(col(typeCol).isin(stepTypes: _*) && col(userCol).isNotNull &&
        col(tsCol).isNotNull)
      .select(col(userCol), col(tsCol), col(typeCol))
    val w = Window.partitionBy(userCol)
    // step_i depends on step_{i-1}'s full-partition value — a chain of
    // withColumn Windows, all on the same partitionBy (one exchange)
    val withSteps = stepTypes.zipWithIndex.foldLeft(relevant) {
      case (df, (step, i)) =>
        val qualifies =
          if (i == 0) col(typeCol) === step
          else {
            val prev = col(s"step_$i" + "_ts")
            val horizon = withinTs match {
              case Some(t) => col(tsCol) <= prev + t
              case None => lit(true)
            }
            col(typeCol) === step && col(tsCol) >= prev && horizon
          }
        df.withColumn(s"step_${i + 1}_ts",
          min(when(qualifies, col(tsCol))).over(w))
    }
    // per-user collapse: every row of a user carries identical step
    // columns (full-partition windows), min() just picks the one value
    val aggs = stepTypes.indices.map(i =>
      min(col(s"step_${i + 1}_ts")).as(s"step_${i + 1}_ts"))
    withSteps.groupBy(userCol).agg(aggs.head, aggs.tail: _*)
  }
}
