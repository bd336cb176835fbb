package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Quality, Relational}

/** Validation-operator semantics (reference: validate_task.py:153-217,
  * re-expressed distributed — SURVEY.md §2.1 V1/A5/J5, §5.2 failure paths).
  */
class QualitySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val orders = Seq((1L, 10L), (2L, 20L)).toDF("order_id", "user_id")
  private val items = Seq(
    (1L, 100L, Some(5.0)), (2L, 200L, None), (3L, 100L, Some(7.0)), (4L, 300L, Some(1.0))
  ).toDF("order_id", "product_id", "sale_price")

  test("V1: missing required columns detected") {
    assert(Quality.missingColumns(orders, Seq("order_id", "user_id", "created_at")) ==
      Seq("created_at"))
    assert(Quality.missingColumns(orders, Seq("order_id")).isEmpty)
  }

  test("A5: null counts per column in one pass") {
    val r = Quality.nullCounts(items, Seq("order_id", "sale_price")).head()
    assert(r.getAs[Long]("order_id_nulls") == 0L)
    assert(r.getAs[Long]("sale_price_nulls") == 1L)
  }

  test("J5: FK violations are the distinct unmatched child keys") {
    val v = Quality.fkViolations(items, "order_id", orders, "order_id")
      .collect().map(_.getLong(0)).sorted
    assert(v.toSeq == Seq(3L, 4L))
    val report = Quality.fkViolationReport(items, "order_id", orders, "order_id", 1)
      .collect().map(_.getLong(0))
    assert(report.toSeq == Seq(3L))
  }

  test("U1: union of disjoint parts equals the whole") {
    val whole = items
    val parts = Relational.unionParts(Seq(
      items.filter($"order_id" % 2 === 0), items.filter($"order_id" % 2 === 1)))
    assert(parts.exceptAll(whole).isEmpty && whole.exceptAll(parts).isEmpty)
  }

  test("salted join equals plain join on skewed data") {
    val skewed = (1 to 500).map(i => (if (i <= 450) 1L else i.toLong, i))
      .toDF("k", "v") // 90% of rows share key 1
    val dim = Seq((1L, "hot"), (460L, "cold")).toDF("k", "name")
    val salted = Relational.saltedLeftJoin(skewed, dim, "k", 8)
    val plain = skewed.join(dim, Seq("k"), "left")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.count() == 500)
  }

  test("top-N is deterministic under ties (revenue desc, category asc)") {
    val c = Seq(("a", 1.0), ("b", 1.0), ("c", 2.0)).toDF("category", "sale_price")
    val top = Relational.topCategoriesByRevenue(c, 2).collect().map(_.getString(0))
    assert(top.toSeq == Seq("c", "a"))
  }
}
