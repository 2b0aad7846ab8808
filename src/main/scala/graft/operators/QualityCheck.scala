package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints with a single-pass report —
  * the validation gate a training-data pipeline runs before a corpus
  * snapshot ships (schema sanity, key integrity, value envelopes).
  *
  * Scale shape: every ROW-LOCAL constraint (null checks, ranges,
  * arbitrary predicates) compiles into one conditional-sum column of
  * ONE aggregate pass — checking 50 constraints costs the same single
  * scan as checking one. Key-level constraints add exactly what they
  * must: uniqueness one hash aggregate, referential integrity one
  * (broadcastable) left-anti join on the distinct reference keys.
  * Nothing collects to the driver; the report is a tiny DataFrame of
  * `(check_name, violations)`.
  */
object QualityCheck {

  sealed trait Constraint { def name: String }

  /** Violation: the column is NULL. */
  case class NotNull(col: String) extends Constraint {
    def name = s"not_null($col)"
  }

  /** Violation: non-null value outside [lo, hi] (NULLs are
    * [[NotNull]]'s business, not a range violation). */
  case class InRange(col: String, lo: Double, hi: Double) extends Constraint {
    def name = s"in_range($col,$lo,$hi)"
  }

  /** Violation: any row whose predicate is not TRUE — a NULL predicate
    * counts as a violation (unprovable rows fail a quality gate). */
  case class Satisfies(label: String, predicate: Column) extends Constraint {
    def name = s"satisfies($label)"
  }

  /** Violation: every row in a key group of size > 1 (so the count is
    * "rows implicated in duplication", not "number of duplicate keys");
    * NULL keys group together, as in GROUP BY. */
  case class Unique(cols: Seq[String]) extends Constraint {
    def name = s"unique(${cols.mkString(",")})"
  }

  /** Violation: a non-null key with no match in the reference column
    * (the NOT-EXISTS side of a foreign key). */
  case class ReferentialTo(ref: DataFrame, col: String, refCol: String)
      extends Constraint {
    def name = s"ref($col->$refCol)"
  }

  /** Evaluate all constraints; one report row per constraint. */
  def report(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "need at least one constraint")
    require(constraints.map(_.name).distinct.size == constraints.size,
      "constraint names must be unique")
    val rowLocal: Seq[(String, Column)] = constraints.collect {
      case c @ NotNull(col0) =>
        c.name -> col(col0).isNull
      case c @ InRange(col0, lo, hi) =>
        c.name -> (col(col0).isNotNull &&
          (col(col0) < lit(lo) || col(col0) > lit(hi)))
      case c @ Satisfies(_, p) =>
        c.name -> !coalesce(p, lit(false))
    }
    val local: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else Some {
        // all row-local checks ride ONE partial+final aggregate pass
        // coalesce: a global sum over ZERO rows is NULL — an empty
        // table must report 0 violations, not a null a consumer trips on
        val aggs = rowLocal.map { case (n, viol) =>
          coalesce(sum(when(viol, 1L).otherwise(0L)), lit(0L)).as(n)
        }
        df.agg(aggs.head, aggs.tail: _*)
          .select(explode(array(rowLocal.map { case (n, _) =>
            struct(lit(n).as("check_name"), col(s"`$n`").as("violations"))
          }: _*)).as("r"))
          .select(col("r.check_name"), col("r.violations"))
      }
    val keyed: Seq[DataFrame] = constraints.collect {
      case c @ Unique(cols0) =>
        df.groupBy(cols0.map(col): _*).agg(count(lit(1)).as("_n"))
          .filter(col("_n") > 1)
          .agg(coalesce(sum(col("_n")), lit(0L)).as("violations"))
          .select(lit(c.name).as("check_name"), col("violations"))
      case c @ ReferentialTo(ref, col0, refCol) =>
        df.select(col(col0)).filter(col(col0).isNotNull)
          .join(ref.select(col(refCol).as(col0)).distinct(),
            Seq(col0), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(c.name).as("check_name"), col("violations"))
    }
    (local.toSeq ++ keyed).reduce(_.union(_))
  }
}
