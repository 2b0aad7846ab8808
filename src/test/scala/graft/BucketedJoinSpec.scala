package graft

import java.nio.file.Files

import graft.sources.BucketedTables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Bucketed tables must deliver their scale contract: co-located joins and
  * aggregations on the bucket key run with ZERO shuffle exchanges, and the
  * results are identical to the unbucketed formulation. */
class BucketedJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def shuffleCount(df: DataFrame): Int = {
    // count ShuffleExchangeExec nodes; recurse through the AQE wrapper AND
    // query-stage leaves (in a finalized adaptive plan exchanges live
    // inside ShuffleQueryStageExec, whose `children` is Nil)
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[ShuffleExchangeExec] =
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case s: ShuffleExchangeExec => s +: s.children.flatMap(walk)
        case other => other.children.flatMap(walk)
      }
    walk(df.queryExecution.executedPlan).size
  }

  private def deleteTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteTree))
    f.delete()
  }

  test("bucketed fact-fact join: no shuffle on either side, same result") {
    val dir = Files.createTempDirectory("graft_buckets").toFile
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")

    BucketedTables.writeBucketed(orders, "orders_b", "o_orderkey", 4,
      path = Some(s"$dir/orders_b"))
    BucketedTables.writeBucketed(lineitem, "lineitem_b", "l_orderkey", 4,
      path = Some(s"$dir/lineitem_b"))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // disable broadcast: the point is the shuffle-free SHUFFLED join shape
    // (at 100 TB neither fact side broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("l_quantity"))
      assert(shuffleCount(joined) == 0,
        "bucketed join must not shuffle either side:\n" +
          joined.queryExecution.executedPlan)

      // same join on the raw parquet shuffles BOTH sides — the cost the
      // bucketed layout eliminates
      val plainJoin = orders.join(lineitem,
        col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("l_quantity"))
      assert(shuffleCount(plainJoin) == 2)

      // identical results
      val a = joined.groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val b = plainJoin.groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(a == b && a.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      // DROP on an external table leaves its files — remove the tree too
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      deleteTree(dir)
    }
  }

  test("aggregation on the bucket key runs in one stage (no exchange)") {
    val dir = Files.createTempDirectory("graft_buckets_agg").toFile
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    BucketedTables.writeBucketed(lineitem, "lineitem_agg_b", "l_orderkey", 4,
      path = Some(s"$dir/lineitem_agg_b"))
    try {
      val agg = spark.table("lineitem_agg_b")
        .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      assert(shuffleCount(agg) == 0,
        "groupBy on the bucket column must not shuffle:\n" +
          agg.queryExecution.executedPlan)
      // and the values match the unbucketed aggregate
      val a = agg.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      val b = lineitem.groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(a == b && a.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS lineitem_agg_b")
      deleteTree(dir)
    }
  }
}
