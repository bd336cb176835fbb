package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Kpi
import graft.sources.Tables

/** KPI cross-invariants on the fixture (SURVEY.md §5.2 property tests). */
class KpiInvariantsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private lazy val consolidated = Kpi.consolidatedOf(spark, TestSession.sf).cache()

  test("category revenues per date sum to the date's total item revenue") {
    val perCat = Kpi.categoryKpis(consolidated)
      .groupBy("order_date").agg(sum($"daily_revenue").as("cat_sum"))
    val direct = consolidated.groupBy("order_date")
      .agg(sum($"sale_price".cast("decimal(18,4)")).cast("double").as("total"))
    val joined = perCat.join(direct, "order_date").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (a, b) = (r.getAs[Double]("cat_sum"), r.getAs[Double]("total"))
      assert(math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(b)), s"$a vs $b")
    }
  }

  test("rates are probabilities; uniques never exceed order counts") {
    val daily = Kpi.orderKpis(Tables.ordersDomain(spark, TestSession.sf),
      Tables.orderItems(spark, TestSession.sf)).collect()
    assert(daily.nonEmpty)
    daily.foreach { r =>
      val rate = r.getAs[Double]("return_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("unique_customers") <= r.getAs[Long]("total_orders"))
      assert(r.getAs[Double]("total_revenue") >= 0.0)
      assert(r.getAs[Int]("total_items_sold") >= 0)
    }
  }

  test("category KPI item return rate matches the flag mean on the same slice") {
    val k = Kpi.categoryKpis(consolidated).filter($"avg_return_rate" > 0).limit(3).collect()
    k.foreach { row =>
      val cat = row.getAs[String]("category")
      val d = row.getAs[java.sql.Date]("order_date")
      val expected = consolidated
        .filter($"category" === cat && $"order_date" === d)
        .agg(avg($"returned_item_flag")).head().getDouble(0)
      assert(row.getAs[Double]("avg_return_rate") == expected)
    }
  }
}
