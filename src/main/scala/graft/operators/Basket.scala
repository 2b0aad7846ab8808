package graft.operators

import graft.functions.PairExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Market-basket co-occurrence mining — frequent item pairs with the
  * A-priori prune: an item pair can only reach `minSupport` baskets if
  * BOTH items individually do, so the (small) frequent-item set filters
  * the baskets BEFORE the quadratic pair step. The canonical first
  * stage of association-rule mining, and squarely the reference
  * course's home turf.
  *
  * Scale shape (long item ids — every production caller): ONE exchange
  * collapses the observations to a sorted distinct item set per basket
  * (collect_set dedups in the aggregate); item supports, the A-priori
  * semi filter, and the per-basket regroup all REUSE that basket
  * partitioning (explode/broadcast-semi/groupBy-on-the-same-key add no
  * exchange); pairs then stream out of the native
  * `explode_posting_pairs` kernel (lazy, allocation-free) into the
  * pair-support aggregate — the [[Dedup.jaccardJoin]] posting-list
  * plan with baskets playing the postings. Two-and-a-half exchanges
  * total and the basket table is built once, replacing the previous
  * distinct + self-equi-join shape (double-computed join sides, ~2×
  * the stages). Pair cost is Σ_basket |surviving items|² — the prune
  * is what keeps a 100 TB run from exploding on promiscuous items.
  * Non-long item types (e.g. string SKUs) take the equivalent
  * self-join path; results are identical (spec-pinned).
  */
object Basket {

  /** @param df one row per (basket, item) observation; duplicates
    *   within a basket collapse.
    * @return (item_a, item_b, support) for unordered pairs co-occurring
    *   in ≥ `minSupport` baskets, item_a < item_b. */
  def frequentPairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val (pairs, _, _) = machinery(df, basketCol, itemCol, minSupport)
    pairs.select(col("ia").as("item_a"), col("ib").as("item_b"),
      col("support"))
  }

  /** (pairs(ia, ib, support), frequent itemN(i, n), baskets(nb_total))
    * — shared by [[frequentPairs]] and [[rules]]. */
  private def machinery(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): (DataFrame, DataFrame, DataFrame) =
    df.schema(itemCol).dataType match {
      case LongType => longPath(df, basketCol, itemCol, minSupport)
      case _ => genericPath(df, basketCol, itemCol, minSupport)
    }

  private def longPath(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): (DataFrame, DataFrame, DataFrame) = {
    // persisted: item supports, the prune pass, and the basket count
    // all read the per-basket sets (ContextCleaner releases with the
    // plan). collect_set = within-basket dedup inside the aggregate.
    val sets = df
      .groupBy(col(basketCol).as("b"))
      .agg(array_sort(collect_set(col(itemCol))).as("arr"))
      .persist()
    // arr elements are distinct, so the exploded count IS basket support
    val itemN = sets.select(explode(col("arr")).as("i"))
      .groupBy("i").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minSupport)
      .persist()
    // A-priori prune + regroup: hash(b) partitioning survives the
    // explode and the broadcast semi, so the re-collect needs no
    // exchange; single-survivor baskets emit no pairs downstream
    val pruned = sets.select(col("b"), explode(col("arr")).as("i"))
      .join(broadcast(itemN.select("i")), Seq("i"), "left_semi")
      .groupBy("b").agg(array_sort(collect_list(col("i"))).as("arr"))
    val pairs = pruned
      .select(PairExpressions.explodePostingPairs(col("arr")))
      .groupBy(col("a_id").as("ia"), col("b_id").as("ib"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    (pairs, itemN, sets.agg(count(lit(1)).as("nb_total")))
  }

  private def genericPath(df: DataFrame, basketCol: String,
      itemCol: String, minSupport: Long)
      : (DataFrame, DataFrame, DataFrame) = {
    val items = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct().persist()
    val itemN = items.groupBy("i").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minSupport).persist()
    val pruned = items.join(broadcast(itemN.select("i")), Seq("i"),
      "left_semi")
    val pairs = pruned.as("x")
      .join(pruned.as("y"),
        col("x.b") === col("y.b") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("ia"), col("y.i").as("ib"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    (pairs, itemN, items.agg(countDistinct(col("b")).as("nb_total")))
  }

  /** Association rules over the frequent pairs: each surviving
    * unordered pair {a, b} yields BOTH directed rules a⇒b and b⇒a
    * with
    *
    * ```
    * confidence(a⇒b) = supp(ab) / supp(a)
    * lift(a⇒b)       = supp(ab)·N / (supp(a)·supp(b))   (symmetric)
    * ```
    *
    * — the Agrawal/Srikant second stage the reference's course teaches
    * after frequent-itemset mining.
    *
    * Scale shape: everything downstream of the pair supports is
    * broadcast-sized — the per-item support table is the frequent-item
    * set (≤ vocabulary) and joins twice onto the pair table; the basket
    * count N attaches as a broadcast scalar. Both rule orientations
    * come from ONE explode of a 2-element array (a union would
    * re-execute the pair join). All counts are exact longs; confidence
    * and lift divide once each, in a fixed operand order.
    *
    * @return (antecedent, consequent, support, n_ante, n_cons,
    *   confidence, lift) — one row per direction, rounded to `scale`. */
  def rules(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, scale: Int = 6): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val (pairs, itemN, baskets) = machinery(df, basketCol, itemCol,
      minSupport)
    val both = pairs.select(col("support"),
        explode(array(
          struct(col("ia").as("antecedent"), col("ib").as("consequent")),
          struct(col("ib").as("antecedent"), col("ia").as("consequent"))
        )).as("r"))
      .select(col("r.antecedent"), col("r.consequent"), col("support"))
    both
      .join(broadcast(itemN.select(col("i").as("antecedent"),
        col("n").as("n_ante"))), "antecedent")
      .join(broadcast(itemN.select(col("i").as("consequent"),
        col("n").as("n_cons"))), "consequent")
      .crossJoin(broadcast(baskets))
      .select(col("antecedent"), col("consequent"), col("support"),
        col("n_ante"), col("n_cons"),
        round(col("support").cast("double") /
          col("n_ante").cast("double"), scale).as("confidence"),
        round(col("support").cast("double") *
          col("nb_total").cast("double") /
          (col("n_ante").cast("double") * col("n_cons").cast("double")),
          scale).as("lift"))
  }

  /** Frequent item TRIPLES — A-priori level 3: candidate {a,b,c} is
    * enumerated only when all three items AND all three sub-pairs are
    * individually frequent (the classic downward-closure prune, applied
    * at both levels), then counted exactly. The level-2 prune is what
    * survives scale: the triple fan-out runs over baskets already
    * stripped to frequent items, and candidates are semi-joined against
    * the (broadcast-sized) frequent-pair set BEFORE the counting
    * aggregate, so Σ|basket|³ only materializes for items that can
    * still win.
    *
    * Exactness is trivial (pure counting); both prunes are lossless by
    * downward closure, so a naive three-way-join SQL twin matches.
    *
    * @return (item_a, item_b, item_c, support) with item_a < item_b <
    *   item_c, support ≥ minSupport. */
  def frequentTriples(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val items = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct().persist() // feeds supports + the pruned re-read
    val itemN = items.groupBy("i").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minSupport)
    val pruned = items.join(broadcast(itemN.select("i")), Seq("i"),
      "left_semi").persist() // feeds the pair pass + three join sides
    val fp = pruned.as("x")
      .join(pruned.as("y"),
        col("x.b") === col("y.b") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("pa"), col("y.i").as("pb"))
      .agg(count(lit(1)).as("pn"))
      .filter(col("pn") >= minSupport)
      .select("pa", "pb")
    val p1 = pruned.select(col("b"), col("i").as("i1"))
    val p2 = pruned.select(col("b"), col("i").as("i2"))
    val p3 = pruned.select(col("b"), col("i").as("i3"))
    p1.join(p2, "b").filter(col("i1") < col("i2"))
      .join(p3, "b").filter(col("i2") < col("i3"))
      .join(broadcast(fp),
        col("i1") === col("pa") && col("i2") === col("pb"), "left_semi")
      .join(broadcast(fp),
        col("i2") === col("pa") && col("i3") === col("pb"), "left_semi")
      .join(broadcast(fp),
        col("i1") === col("pa") && col("i3") === col("pb"), "left_semi")
      .groupBy(col("i1").as("item_a"), col("i2").as("item_b"),
        col("i3").as("item_c"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }
}
