package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence mining over a keyed, timestamped event log — the
  * order-sensitive analytics the reference's batch pipeline has no
  * analog for (SURVEY §2.6: no windows, no state). Two classic
  * first-stage operators:
  *
  *  - [[transitions]]: the empirical Markov transition matrix — for
  *    every ordered (state → next state) step within a key's timeline,
  *    its count and conditional probability. One exchange on the key
  *    for the `lead` window; the (src, dst) aggregate and the per-src
  *    normalizing sum are over the tiny state×state table.
  *
  *  - [[precedencePairs]]: sequential-pattern support counting (the
  *    depth-1 PrefixSpan/SPADE step) — for every ordered pair of event
  *    types (a, b), how many keys exhibit "some a strictly before some
  *    b". `∃ a before b  ⟺  min(ts | a) < max(ts | b)`, so the whole
  *    operator is one (key, type) min/max aggregate followed by a
  *    per-key self-join on the handful of types each key has — never a
  *    join on raw events.
  *
  * Both shapes scale as: one shuffle of the event log by key, then
  * work proportional to (#keys × #types), not events².
  */
object Sequences {

  /** @param df       event log
    * @param keyCol   sequence key (e.g. user id)
    * @param typeCol  the state / event-type column
    * @param tsCol    ordering instant (long); `tieCols` break ts ties
    *                 deterministically (e.g. an event id)
    * @return (src_type, dst_type, cnt, p) — p = cnt / Σ cnt over src,
    *   rounded to 6 places (one exact integer division per row) */
  def transitions(df: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, tieCols: Seq[String]): DataFrame = {
    val steps = stepCounts(df, keyCol, typeCol, tsCol, tieCols)
    val wSrc = Window.partitionBy("src_type")
    steps.withColumn("p",
      round(col("cnt").cast("double") / sum(col("cnt")).over(wSrc), 6))
  }

  /** The shared (src_type, dst_type, cnt) transition counting —
    * [[transitions]] and [[transitionEval]] MUST see the same ordering
    * and tie-break contract, so it lives once. */
  private def stepCounts(df: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, tieCols: Seq[String]): DataFrame = {
    val order: Seq[Column] = col(tsCol) +: tieCols.map(col)
    val w = Window.partitionBy(keyCol).orderBy(order: _*)
    df.select(col(keyCol) +: col(typeCol).as("src_type") +: col(tsCol) +:
        tieCols.map(col): _*)
      .withColumn("dst_type", lead(col("src_type"), 1).over(w))
      .filter(col("dst_type").isNotNull)
      .groupBy("src_type", "dst_type")
      .agg(count(lit(1)).as("cnt"))
  }

  /** In-sample next-event prediction report for the empirical Markov
    * model: per current state, predict the most frequent successor
    * (ties to the smallest label — the q84 argmax) and score it
    * against every observed transition. "How predictable is the next
    * step from the current one alone" — the evaluation loop closing
    * [[transitions]]'s matrix the way inertia closes the k-means fit.
    * In-sample by construction (the matrix and the eval share the
    * data); split first for honest accuracy.
    *
    * Pure counting: the transition table aggregates once, the
    * one-row-per-state argmax joins back broadcast-size, accuracy is
    * one division.
    *
    * @return (src_type, predicted, n_steps, n_correct, accuracy). */
  def transitionEval(df: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, tieCols: Seq[String]): DataFrame = {
    val steps = stepCounts(df, keyCol, typeCol, tsCol, tieCols)
      .persist() // argmax + the scoring join both read it
    val pred = steps.groupBy(col("src_type"))
      .agg(min(struct((-col("cnt")).as("nc"), col("dst_type").as("d")))
        .as("m"))
      .select(col("src_type"), col("m.d").as("predicted"))
    steps.join(broadcast(pred), "src_type")
      .groupBy(col("src_type"), col("predicted"))
      .agg(sum(col("cnt")).as("n_steps"),
        sum(when(col("dst_type") === col("predicted"), col("cnt"))
          .otherwise(0L)).as("n_correct"))
      .withColumn("accuracy", round(col("n_correct").cast("double") /
        col("n_steps").cast("double"), 6))
  }

  /** @return (type_a, type_b, n_keys) for every ordered type pair with
    *   a ≠ b: the number of keys where some `a` event strictly precedes
    *   some `b` event. */
  def precedencePairs(df: DataFrame, keyCol: String, typeCol: String,
      tsCol: String): DataFrame = {
    val spans = df.groupBy(col(keyCol).as("k"), col(typeCol).as("t"))
      .agg(min(col(tsCol)).as("mn"), max(col(tsCol)).as("mx"))
    spans.as("x").join(spans.as("y"),
        col("x.k") === col("y.k") && col("x.t") =!= col("y.t") &&
          col("x.mn") < col("y.mx"))
      .groupBy(col("x.t").as("type_a"), col("y.t").as("type_b"))
      .agg(count(lit(1)).as("n_keys"))
  }

  /** Depth-2 sequential-pattern support: for every ordered type triple
    * (a, b, c), the number of keys exhibiting `a before b before c`
    * (strict timestamps; repeated types allowed — a⟨a,a,a⟩ key needs
    * three distinct instants). Uses the span reduction of
    * [[precedencePairs]] twice:
    *
    * `∃ tₐ < t_b < t_c  ⟺  ∃ b-occurrence in (min(ts|a), max(ts|c))`
    *
    * — pick tₐ = min(a) and t_c = max(c); so only the MIDDLE element
    * ever touches event instants, the outer two collapse to their
    * spans.
    *
    * Scale shape: the span table and the distinct middle-event table
    * are each one hash aggregate of the log; both joins are
    * co-partitioned per-key equi-joins, so per-key work is
    * |types|² × |distinct instants| — never events² — and the per-key
    * witness `distinct` collapses before the global (a, b, c) count.
    *
    * @return (type_a, type_b, type_c, n_keys). */
  def patternTriples(df: DataFrame, keyCol: String, typeCol: String,
      tsCol: String): DataFrame = {
    val spans = df.groupBy(col(keyCol).as("k"), col(typeCol).as("t"))
      .agg(min(col(tsCol)).as("mn"), max(col(tsCol)).as("mx"))
    val mids = df.select(col(keyCol).as("k"), col(typeCol).as("t"),
      col(tsCol).as("ts")).distinct()
    spans.as("a").join(spans.as("c"),
        col("a.k") === col("c.k") && col("a.mn") < col("c.mx"))
      .join(mids.as("b"),
        col("b.k") === col("a.k") && col("b.ts") > col("a.mn") &&
          col("b.ts") < col("c.mx"))
      .select(col("a.k").as("k"), col("a.t").as("type_a"),
        col("b.t").as("type_b"), col("c.t").as("type_c"))
      .distinct()
      .groupBy("type_a", "type_b", "type_c")
      .agg(count(lit(1)).as("n_keys"))
  }
}
