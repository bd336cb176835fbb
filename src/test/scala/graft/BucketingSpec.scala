package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Bucketing, Tables}

/** Co-located join via bucketing: both fact tables bucketed on order_id at
  * write time ⇒ the join plans with NO shuffle exchange (SURVEY.md §7 scale
  * design; the recurring KPI join becomes exchange-free).
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("join of co-bucketed tables plans without a shuffle and matches the plain join") {
    val sf = TestSession.sf
    val orders = Tables.ordersDomain(spark, sf)
    val items = Tables.orderItems(spark, sf)

    Bucketing.writeBucketed(orders, "b_orders", 8, "order_id")
    Bucketing.writeBucketed(items, "b_items", 8, "order_id")

    // force the non-broadcast path so the bucketing (not a broadcast) is
    // what eliminates the exchanges
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = spark.table("b_items")
        .join(spark.table("b_orders"), Seq("order_id"))
        .groupBy(col("order_id"))
        .agg(sum(col("sale_price")).as("rev"))
      assert(!Bucketing.hasShuffle(bucketed),
        "co-bucketed join + bucket-key aggregation must not shuffle")

      val plain = items.join(orders, Seq("order_id"))
        .groupBy(col("order_id")).agg(sum(col("sale_price")).as("rev"))
      assert(plain.exceptAll(bucketed).isEmpty && bucketed.exceptAll(plain).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_items")
    }
  }
}
