package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining — frequent item pairs with the
  * A-priori prune: an item pair can only reach `minSupport` baskets if
  * BOTH items individually do, so the (small) frequent-item set filters
  * the basket table BEFORE the quadratic pair step. The canonical
  * first stage of association-rule mining, and squarely the reference
  * course's home turf.
  *
  * Scale shape: basket-item dedup is one shuffle; the frequent-item
  * set is a broadcast semi filter (downward closure — lossless); pair
  * generation is a self-equi-join on the basket key, so its cost is
  * Σ_basket |items|² over SURVIVING items only — the prune is what
  * keeps a 100 TB run from exploding on promiscuous items, and basket
  * size caps (if needed) would bound the worst case explicitly.
  */
object Basket {

  /** @param df one row per (basket, item) observation; duplicates
    *   within a basket collapse.
    * @return (item_a, item_b, support) for unordered pairs co-occurring
    *   in ≥ `minSupport` baskets, item_a < item_b. */
  def frequentPairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val items = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct().persist()
    val freq = items.groupBy("i").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minSupport).select("i")
    val pruned = items.join(broadcast(freq), Seq("i"), "left_semi")
    val out = pruned.as("x")
      .join(pruned.as("y"),
        col("x.b") === col("y.b") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("item_a"), col("y.i").as("item_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    out
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
    * Scale shape: everything downstream of `frequentPairs` is
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
    val baskets = items.agg(countDistinct(col("b")).as("nb_total"))
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
}
