package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Kpi

/** Property tests over ARBITRARY generated domain instances — the SURVEY
  * §5.2 invariants the hand fixtures can't sweep:
  *   - mass conservation: Σ category daily_revenue ≡ Σ item sale_price
  *   - rate bounds: every return-rate mean ∈ [0, 1]
  *   - union-all invariance: KPIs over split-and-unioned parts ≡ whole
  *   - recompute idempotence: two evaluations land identical rows
  *   - order conservation: Σ total_orders ≡ distinct orders (itemless
  *     orders survive the left join — SURVEY §2.2.4)
  * Sampling is deterministic (fixed ScalaCheck seeds), so failures replay.
  */
class KpiPropertySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def ts(day: Int, h: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-${day}%02d $h%02d:00:00")

  /** One random domain instance: products (one id dangling from items'
    * range → null category), orders with optional returns, items with
    * dangling order/product FKs to exercise left-join null survival.
    */
  private case class Instance(
      products: DataFrame, orders: DataFrame, items: DataFrame, nOrders: Int)

  private val instanceGen: Gen[Instance] = for {
    nOrders <- Gen.chooseNum(1, 30)
    orderRows <- Gen.sequence[Seq[(Long, Long, Timestamp, Boolean)], (Long, Long, Timestamp, Boolean)](
      (1 to nOrders).map { oid =>
        for {
          user <- Gen.chooseNum(1L, 8L)
          day <- Gen.chooseNum(1, 3)
          hour <- Gen.chooseNum(0, 23)
          ret <- Gen.prob(0.3)
        } yield (oid.toLong, user, ts(day, hour), ret)
      })
    nItems <- Gen.chooseNum(0, 60)
    itemRows <- Gen.listOfN(nItems, for {
      oid <- Gen.chooseNum(1L, nOrders.toLong + 2) // +2 → dangling order FK
      pid <- Gen.chooseNum(1L, 6L) // product 6 has no catalog row
      cents <- Gen.chooseNum(1L, 99999L)
      day <- Gen.chooseNum(1, 3)
      ret <- Gen.prob(0.2)
    } yield (oid, pid, cents / 100.0, if (ret) ts(day, 12) else null, ts(day, 6)))
  } yield {
    val products = (1L to 5L)
      .map(id => (id, s"sku$id", 1.0, if (id % 2 == 0) "CAT_A" else "CAT_B", 2.0))
      .toDF("id", "sku", "cost", "category", "retail_price")
    val orders = orderRows
      .map { case (o, u, t, r) => (o, u, t, if (r) t else null) }
      .toDF("order_id", "user_id", "created_at", "returned_at")
    val items = itemRows
      .toDF("order_id", "product_id", "sale_price", "returned_at", "created_at")
    Instance(products, orders, items, nOrders)
  }

  private lazy val instances = samples(instanceGen, 8)

  test("mass conservation: category KPIs partition the item revenue exactly") {
    instances.foreach { inst =>
      val kpis = Kpi.categoryKpis(
        Kpi.consolidated(inst.products, inst.orders, inst.items)).collect()
      val got = kpis.map(r => BigDecimal(r.getAs[Double]("daily_revenue"))).sum
      val want = inst.items.agg(
        sum(col("sale_price").cast("decimal(18,4)")).cast("double")).head() match {
        case r if r.isNullAt(0) => BigDecimal(0)
        case r => BigDecimal(r.getDouble(0))
      }
      assert((got - want).abs < BigDecimal("0.000001"),
        s"revenue mass $got != item mass $want")
    }
  }

  test("rate bounds: every return-rate mean lies in [0, 1]") {
    instances.foreach { inst =>
      val cat = Kpi.categoryKpis(
        Kpi.consolidated(inst.products, inst.orders, inst.items)).collect()
      cat.foreach { r =>
        val x = r.getAs[Double]("avg_return_rate")
        assert(x >= 0.0 && x <= 1.0, s"avg_return_rate $x out of range")
      }
      val daily = Kpi.orderKpis(inst.orders, inst.items).collect()
      daily.foreach { r =>
        val x = r.getAs[Double]("return_rate")
        assert(x >= 0.0 && x <= 1.0, s"return_rate $x out of range")
      }
    }
  }

  test("union-all invariance: KPIs over file parts equal KPIs over the whole") {
    instances.foreach { inst =>
      val partA = inst.items.filter(col("order_id") % 2 === 0)
      val partB = inst.items.filter(col("order_id") % 2 =!= 0)
      val whole = Kpi.categoryKpis(
        Kpi.consolidated(inst.products, inst.orders, inst.items)).collect()
        .map(_.toString).sorted.toSeq
      val parts = Kpi.categoryKpis(
        Kpi.consolidated(inst.products, inst.orders, partA.unionByName(partB)))
        .collect().map(_.toString).sorted.toSeq
      assert(parts == whole, "splitting items into parts changed the KPIs")
    }
  }

  test("recompute idempotence: two evaluations produce identical rows") {
    instances.take(4).foreach { inst =>
      def run() = Kpi.orderKpis(inst.orders, inst.items).collect()
        .map(_.toString).sorted.toSeq
      assert(run() == run(), "recompute must be deterministic")
    }
  }

  test("order conservation: itemless orders still count in total_orders") {
    instances.foreach { inst =>
      val daily = Kpi.orderKpis(inst.orders, inst.items).collect()
      val counted = daily.map(_.getAs[Long]("total_orders")).sum
      assert(counted == inst.nOrders.toLong,
        s"counted $counted orders, generated ${inst.nOrders}")
    }
  }
}
