package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: snap irregular observations onto a
  * per-key calendar spine and forward-fill the gaps (LOCF — last
  * observation carried forward). The missing half of every feature
  * store / metrics backfill: joins against an irregular event table
  * need a value for EVERY period, not just the ones that happened to
  * see an event.
  *
  * Scale shape: one aggregation collapses observations to (key,
  * period) grain; the spine derives from a key-grain aggregate of
  * that and explodes narrowly (`sequence` per key, no shuffle). When
  * the collapsed table is broadcast-able (the common case — its size
  * is keys × OBSERVED periods), the fill join is a broadcast join and
  * the LOCF window reuses the spine's hash(key) partitioning: two
  * exchanges total, none over raw observations' full width. In the
  * sort-merge regime it is one exchange more; nothing ever sorts
  * globally, and the spine row count is keys × periods — explicit,
  * not data-dependent.
  */
object TimeSeries {

  /** Per-key periodic spine (from each key's first to last observed
    * period) with the latest observation per period forward-filled
    * across empty periods.
    *
    * @param unit a `date_trunc` unit ("month", "week", "day") — also
    *   the spine step.
    * @param tieCols break ties among observations sharing `tsCol`
    *   within a period; (tsCol ++ tieCols) must be unique per key for
    *   a deterministic result.
    * @return keyCols :+ "period" :+ s"${valCol}_fill" */
  def forwardFill(obs: DataFrame, keyCols: Seq[String], tsCol: String,
      valCol: String, unit: String, tieCols: Seq[String] = Nil): DataFrame = {
    val step = unit.toLowerCase match {
      case "month" => expr("interval 1 month")
      case "week" => expr("interval 7 days")
      case "day" => expr("interval 1 day")
      case u => throw new IllegalArgumentException(s"unsupported unit: $u")
    }
    val period = date_trunc(unit, col(tsCol))
    // latest value per (key, period): max over struct(ts, ties..., val)
    // orders by ts first — one aggregate, no per-period sort
    val ordered = struct(
      (col(tsCol) +: tieCols.map(col)) :+ col(valCol).as("__v"): _*)
    val perPeriod = obs
      .groupBy((keyCols.map(col) :+ period.as("period")): _*)
      .agg(max(ordered).getField("__v").as("__val"))
    val spine = perPeriod
      .groupBy(keyCols.map(col): _*)
      .agg(min(col("period")).as("__mn"), max(col("period")).as("__mx"))
      .select((keyCols.map(col) :+
        explode(sequence(col("__mn"), col("__mx"), step)).as("period")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("period"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(perPeriod, keyCols :+ "period", "left")
      .select((keyCols.map(col) :+ col("period") :+
        last(col("__val"), ignoreNulls = true).over(w)
          .as(s"${valCol}_fill")): _*)
  }
}
