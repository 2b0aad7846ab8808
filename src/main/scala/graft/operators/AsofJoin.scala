package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for every left row, attach the single most
  * recent right row whose timestamp is at or before the left row's, per
  * equality key — the canonical point-in-time lookup of event/feature
  * pipelines (trades→quotes, click→last-purchase, example→latest-label).
  *
  * The reference engine has no such operator (SURVEY §2.6); this is part
  * of the training-data-pipeline extension surface. DuckDB's `ASOF JOIN`
  * is the oracle twin.
  *
  * Spark-first plan — NOT a range join: both sides are tagged and
  * unioned, then ONE shuffle on the key and one in-partition sort order
  * the merged timeline; a running `last(<right payload struct>,
  * ignoreNulls)` window picks the prevailing right row for every left
  * row. Cost is O((|L|+|R|) log) with zero pair explosion, vs a range
  * join's |L|×|R| candidate pairs per key before filtering. At 100 TB the
  * only scale hazard is a hot key (one giant window partition) — the same
  * hazard the data itself carries; pre-split hot keys upstream if needed.
  *
  * Determinism: right rows tied on the timestamp are resolved toward the
  * greatest payload tuple (they sort last under the window's order).
  */
object AsofJoin {

  /** @param left      probe side; ALL its columns pass through
    * @param right     build side: `keys` ++ rightTs ++ `payload` columns
    * @param keys      equality key columns (present on both sides)
    * @param leftTs    left timestamp column (numeric or timestamp)
    * @param rightTs   right timestamp column (same type as leftTs)
    * @param payload   right columns to attach (NULL when no match)
    * @param tolerance max leftTs − rightTs. Numeric ts columns: in the
    *                  columns' own unit. TIMESTAMP ts columns: in
    *                  MICROSECONDS (compared on `unix_micros`, so
    *                  sub-second precision is honored — a plain
    *                  `cast(long)` would truncate to whole seconds)
    * @return left columns ++ (`asof_ts` = matched rightTs) ++ payload */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightTypes = right.schema
    val tsType = rightTypes(rightTs).dataType

    // ASOF/equi-join semantics: a NULL equality key never matches (the
    // window's partitionBy would group nulls as EQUAL), and a right row
    // with a NULL timestamp sorts nulls-first and would "match" every
    // left row before the first real right row — drop such right rows up
    // front. Left rows with NULL keys keep left-join behavior: their
    // partition then contains no right rows, so the payload stays NULL.
    val rClean = right.filter(
      (col(rightTs).isNotNull +: keys.map(col(_).isNotNull)).reduce(_ && _))

    // merged timeline: right rows carry their payload in one nullable
    // struct (atomic pick — a per-column last() could stitch together
    // DIFFERENT right rows when payload columns contain nulls)
    val rTagged = rClean.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_ts"),
        lit(0).as("_tag"),
        struct(col(rightTs).as("_rts") +: payload.map(col): _*).as("_r")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c")): _*)
    val lTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).cast(tsType).as("_ts"),
        lit(1).as("_tag"),
        lit(null).cast(rTagged.schema("_r").dataType).as("_r")) ++
        leftCols.map(c => col(c).as(s"_l_$c")): _*)

    // right before left at equal ts (inclusive match); right-right ties
    // ordered by payload struct so the winner is deterministic
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_tag").asc, col("_r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = rTagged.unionByName(lTagged)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)

    // horizon check in the ts type's finest unit: unix_micros for
    // timestamps (cast(long) would silently round tolerance to seconds)
    def units(c: org.apache.spark.sql.Column) = tsType match {
      case _: org.apache.spark.sql.types.TimestampType => unix_micros(c)
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(c.cast("timestamp"))
      case _ => c.cast("long")
    }
    val inRange = tolerance match {
      case Some(tol) =>
        matched.withColumn("_m",
          when(units(col("_m._rts")) >= units(col("_ts")) - tol, col("_m")))
      case None => matched
    }
    inRange.select(
      leftCols.map(c => col(s"_l_$c").as(c)) ++
        (col("_m._rts").as("asof_ts") +:
          payload.map(p => col(s"_m.$p").as(p))): _*)
  }
}
