package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Warehouse
import graft.sources.Tables

class WarehouseSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("scd2: runs collapse, intervals tile the timeline, exactly one current row per key") {
    // key 1: A A B A → 3 versions; key 2: single run; equal-ts tie broken by id
    val log = Seq(
      (1L, "A", ts("2020-01-01"), 10L),
      (1L, "A", ts("2020-02-01"), 11L),
      (1L, "B", ts("2020-03-01"), 12L),
      (1L, "A", ts("2020-04-01"), 13L),
      (2L, "X", ts("2020-01-15"), 20L)
    ).toDF("user_id", "priority", "t", "oid")
    val out = Warehouse.scd2(log, "user_id", "priority", "t", "oid")
      .orderBy("user_id", "version").collect()

    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getAs[String]("priority")).toSeq == Seq("A", "B", "A"))
    assert(k1.map(_.getAs[Int]("version")).toSeq == Seq(1, 2, 3))
    assert(k1.map(_.getAs[Long]("n_obs")).toSeq == Seq(2L, 1L, 1L))
    // each valid_to equals the next version's valid_from; only the last is open
    assert(k1(0).getAs[Timestamp]("valid_to") == k1(1).getAs[Timestamp]("valid_from"))
    assert(k1(1).getAs[Timestamp]("valid_to") == k1(2).getAs[Timestamp]("valid_from"))
    assert(k1(2).getAs[Timestamp]("valid_to") == null)
    assert(out.count(_.getAs[Int]("is_current") == 1) == 2) // one per key
  }

  test("scd2: equal timestamps order by the tie-break column") {
    val log = Seq(
      (1L, "A", ts("2020-01-01"), 2L),
      (1L, "B", ts("2020-01-01"), 1L) // same ts, lower id → B comes first
    ).toDF("user_id", "priority", "t", "oid")
    val out = Warehouse.scd2(log, "user_id", "priority", "t", "oid")
      .orderBy("version").collect()
    assert(out.map(_.getAs[String]("priority")).toSeq == Seq("B", "A"))
  }

  test("cdc: diff emits only changes, apply(diff) reproduces the target snapshot") {
    val orders = Tables.orders(spark, TestSession.sf)
    val a = Warehouse.activitySnapshot(orders, Warehouse.cdcAsOfA, Warehouse.cdcWindowDays)
    val b = Warehouse.activitySnapshot(orders, Warehouse.cdcAsOfB, Warehouse.cdcWindowDays)
    val diff = Warehouse.snapshotDiff(a, b, "user_id").cache()

    // all three change types occur in the fixture
    val types = diff.select("change_type").distinct().as[String].collect().toSet
    assert(types == Set("insert", "update", "delete"))
    // no row is a no-op: every update differs in at least one payload column
    val noop = diff.filter(col("change_type") === "update"
      && col("old_n_orders") <=> col("new_n_orders")
      && col("old_spend") <=> col("new_spend")
      && col("old_last_order") <=> col("new_last_order"))
    assert(noop.isEmpty)
    // inserts carry no old payload, deletes no new payload
    assert(diff.filter(col("change_type") === "insert" && col("old_n_orders").isNotNull).isEmpty)
    assert(diff.filter(col("change_type") === "delete" && col("new_n_orders").isNotNull).isEmpty)

    // MERGE roundtrip: a + diff == b exactly
    val merged = Warehouse.applyChanges(a, diff, "user_id")
    assert(merged.exceptAll(b).isEmpty && b.exceptAll(merged).isEmpty)
  }

  test("cdc: empty diff on identical snapshots; apply is a no-op") {
    val orders = Tables.orders(spark, TestSession.sf)
    val a = Warehouse.activitySnapshot(orders, Warehouse.cdcAsOfA, Warehouse.cdcWindowDays)
    val diff = Warehouse.snapshotDiff(a, a, "user_id")
    assert(diff.isEmpty)
    val merged = Warehouse.applyChanges(a, diff, "user_id")
    assert(merged.exceptAll(a).isEmpty && a.exceptAll(merged).isEmpty)
  }

  test("scd2 plan: no partition-less window (no global sort)") {
    val log = Tables.orders(spark, TestSession.sf).select(
      col("o_custkey").as("user_id"), col("o_orderpriority").as("priority"),
      col("o_orderdate").as("t"), col("o_orderkey").as("oid"))
    val plan = Warehouse.scd2(log, "user_id", "priority", "t", "oid")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("windowspecdefinition(t"), "window must partition by key")
    assert(plan.contains("windowspecdefinition(user_id"), plan)
  }

  test("scd2 merge equals full rebuild across all branch shapes") {
    // key 1: batch CONTINUES the current value (run merge, counts add);
    // key 2: batch CHANGES it (close + append); key 3: stored-only;
    // key 4: batch-only (fresh key)
    val stored = Seq(
      (1L, "A", ts("2024-01-01"), 1L), (1L, "A", ts("2024-01-02"), 2L),
      (2L, "X", ts("2024-01-01"), 3L),
      (3L, "Z", ts("2024-01-01"), 4L)
    ).toDF("user_id", "priority", "t", "oid")
    val batch = Seq(
      (1L, "A", ts("2024-02-01"), 11L), (1L, "B", ts("2024-02-02"), 12L),
      (2L, "Y", ts("2024-02-01"), 13L),
      (4L, "Q", ts("2024-02-01"), 14L)
    ).toDF("user_id", "priority", "t", "oid")
    def hist(df: org.apache.spark.sql.DataFrame) =
      Warehouse.scd2(df, "user_id", "priority", "t", "oid")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("user_id"), r.getAs[Int]("version"),
        r.getAs[String]("priority"), r.getAs[Timestamp]("valid_from"),
        r.getAs[Long]("n_obs"), Option(r.getAs[Timestamp]("valid_to")),
        r.getAs[Int]("is_current"))).toSet
    val merged = rows(Warehouse.scd2Merge(hist(stored), hist(batch),
      "user_id", "priority"))
    val full = rows(hist(stored.unionByName(batch)))
    assert(merged == full, s"merged\n$merged\nfull\n$full")
    // the continued run really merged: key 1 version 1 holds 3 observations
    assert(merged.exists(r => r._1 == 1L && r._2 == 1 && r._5 == 3L))
  }

  test("dim as-of join: the fact table partitions exactly across versions") {
    // every order must land on EXACTLY one dimension version (the one
    // valid at its order date) — n_orders across priorities is a
    // partition of the fact table, and revenue mass is conserved
    val out = graft.SparkEntry.queries("warehouse_dim_asof_join")(
      spark, TestSession.sf).collect()
    val orders = Tables.orders(spark, TestSession.sf)
    assert(out.map(_.getAs[Long]("n_orders")).sum == orders.count())
    val total = orders.agg(
      sum(col("o_totalprice").cast("decimal(18,4)")).cast("double"))
      .collect().head.getDouble(0)
    assert(math.abs(out.map(_.getAs[Double]("revenue")).sum - total) < 1e-6)
  }
}
