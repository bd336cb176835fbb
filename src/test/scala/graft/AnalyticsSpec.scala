package graft

import org.apache.spark.sql.functions.{col, date_trunc, to_date}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Analytics, Kpi}
import graft.sources.Tables

class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("rollup: grand total equals sum of leaf rows") {
    val r = Analytics.categoryRollup(Kpi.consolidatedOf(spark, TestSession.sf)).cache()
    val leaves = r.filter($"category".isNotNull && $"order_date".isNotNull)
    val grand = r.filter($"category".isNull && $"order_date".isNull).head()
    val leafSum = leaves.agg(org.apache.spark.sql.functions.sum($"n_items")).head().getLong(0)
    assert(grand.getAs[Long]("n_items") == leafSum)
  }

  test("trends: rank 1 is the max-revenue category of each date") {
    val t = Analytics.categoryTrends(Kpi.consolidatedOf(spark, TestSession.sf)).cache()
    val top = t.filter($"rank_in_date" === 1).select("order_date", "revenue")
    val max = t.groupBy("order_date")
      .agg(org.apache.spark.sql.functions.max($"revenue").as("revenue"))
    assert(top.exceptAll(max).isEmpty)
  }

  test("quantiles: rank selection picks true order statistics; approx tracks exact") {
    import spark.implicits._
    // hand-checkable: 10 items, one category → p50 = 5th value, p90 = 9th, p99 = 10th
    val tiny = (1 to 10).map(i => ("CAT", i.toDouble))
      .toDF("category", "sale_price")
    val t = Analytics.priceQuantiles(tiny).head()
    assert(t.getAs[Long]("n_items") == 10L)
    assert(t.getAs[Double]("p50") == 5.0)
    assert(t.getAs[Double]("p90") == 9.0)
    assert(t.getAs[Double]("p99") == 10.0)
    // fixture-wide: the histogram sketch's one-sided error bound holds
    // exactly — the estimate is the target bucket's LOWER bound, so
    // 0 ≤ exact − estimate < grid/100 dollars on every quantile
    val exact = Analytics.priceQuantiles(Kpi.consolidatedOf(spark, TestSession.sf))
      .collect().map(r => r.getAs[String]("category") ->
        (r.getAs[Double]("p50"), r.getAs[Double]("p90"))).toMap
    val approx = Analytics.priceQuantilesApprox(Kpi.consolidatedOf(spark, TestSession.sf))
      .collect().map(r => r.getAs[String]("category") ->
        (r.getAs[Double]("p50"), r.getAs[Double]("p90"))).toMap
    assert(exact.keySet == approx.keySet)
    val bound = Analytics.quantileGridCents / 100.0
    exact.foreach { case (c, (e50, e90)) =>
      val (a50, a90) = approx(c)
      assert(a50 <= e50 && e50 - a50 < bound, s"p50 off for $c: $a50 vs $e50")
      assert(a90 <= e90 && e90 - a90 < bound, s"p90 off for $c: $a90 vs $e90")
    }
  }

  test("rfm: quintile scores partition users evenly and code composes digits") {
    val rfm = Analytics.rfmSegments(
      Tables.ordersDomain(spark, TestSession.sf),
      Tables.orderItems(spark, TestSession.sf)).cache()
    val n = rfm.count()
    // every score in 1..5; each m-quintile holds n/5 ± 1 users
    val byScore = rfm.groupBy("m_score").count().collect()
      .map(r => r.getAs[Long]("m_score") -> r.getAs[Long]("count")).toMap
    assert(byScore.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(byScore.values.forall(c => math.abs(c - n / 5.0) <= 1))
    // the top monetary user scores m=5; code composes the three digits
    val top = rfm.orderBy(org.apache.spark.sql.functions.col("monetary").desc).head()
    assert(top.getAs[Long]("m_score") == 5L)
    val r0 = rfm.head()
    assert(r0.getAs[Long]("rfm_code") ==
      r0.getAs[Long]("r_score") * 100 + r0.getAs[Long]("f_score") * 10 + r0.getAs[Long]("m_score"))
    rfm.unpersist()
  }

  test("approx rfm: boundary scoring agrees with exact ranks (95% near-unique dims, tie-span containment)") {
    val orders = Tables.ordersDomain(spark, TestSession.sf)
    val items = Tables.orderItems(spark, TestSession.sf)
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("r_score"), r.getAs[Long]("f_score"), r.getAs[Long]("m_score")))
      .toMap
    val exact = keyed(Analytics.rfmSegments(orders, items))
    val approx = keyed(Analytics.rfmSegmentsApprox(orders, items))
    assert(exact.keySet == approx.keySet)
    val n = exact.size.toDouble
    def agreement(pick: ((Long, Long, Long)) => Long): Double =
      exact.count { case (u, e) => pick(e) == pick(approx(u)) } / n
    // recency and monetary are near-unique per user → scores agree outright
    val (ar, am) = (agreement(_._1), agreement(_._3))
    assert(ar >= 0.95, s"r_score agreement $ar")
    assert(am >= 0.95, s"m_score agreement $am")
    // frequency is a small-integer metric: exact ranks SPLIT tie groups
    // across buckets by user_id, which no value-based scorer can reproduce.
    // The correctness statement for ties is containment: every approx score
    // must land within the span of exact scores given to the SAME n_orders
    // value — i.e. the sketch boundary never misplaces a value outside its
    // legitimate rank range.
    val freqOf = Analytics.rfmSegmentsApprox(orders, items).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_orders")).toMap
    val exactSpan = exact.toSeq.groupBy { case (u, _) => freqOf(u) }
      .map { case (f, us) => f -> (us.map(_._2._2).min, us.map(_._2._2).max) }
    approx.foreach { case (u, (_, fScore, _)) =>
      val (lo, hi) = exactSpan(freqOf(u))
      assert(fScore >= lo && fScore <= hi,
        s"user $u: approx f_score $fScore outside exact tie-group span [$lo,$hi]")
    }
    // scores stay in 1..5 — the boundary scorer can't fall off the scale
    approx.values.foreach { case (r, f, m) =>
      assert(Seq(r, f, m).forall(s => s >= 1 && s <= 5)) }
  }

  test("market basket: pair counts, lift arithmetic, min-support and basket cap") {
    import spark.implicits._
    // orders: 1:{10,20,30} 2:{10,20} 3:{20,30} 4:{10,20} (+ dup row, dedup'd)
    val base = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L), (2L, 20L),
      (3L, 20L), (3L, 30L),
      (4L, 10L), (4L, 20L))
    // a degenerate mega-basket above the cap must drop out entirely
    val mega = (1L to (Analytics.basketMaxItems + 1).toLong).map(p => (99L, 1000L + p))
    val oi = (base ++ mega).toDF("order_id", "product_id")
    val out = Analytics.marketBasket(oi).collect()
      .map(r => (r.getAs[Long]("p1"), r.getAs[Long]("p2")) ->
        ((r.getAs[Long]("c12"), r.getAs[Long]("c1"), r.getAs[Long]("c2"),
          r.getAs[Double]("lift"))))
      .toMap
    // (10,30) co-occurs once → below min support; mega-basket pairs absent
    assert(out.keySet == Set((10L, 20L), (20L, 30L)))
    // n_orders = 4 (mega-basket excluded from the denominator too)
    assert(out((10L, 20L)) == ((3L, 3L, 4L, 3.0 * 4 / (3 * 4))))
    assert(out((20L, 30L)) == ((2L, 4L, 2L, 2.0 * 4 / (4 * 2))))
  }

  test("repeat purchase: first month is new, later active months are repeat") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    // u10: Jan + Feb (repeat in Feb); u20: Feb only (new); two Jan orders
    // for u10 collapse to one active month
    val orders = Seq(
      (1L, 10L, t("2024-01-05 00:00:00")), (2L, 10L, t("2024-01-20 00:00:00")),
      (3L, 10L, t("2024-02-10 00:00:00")), (4L, 20L, t("2024-02-20 00:00:00"))
    ).toDF("order_id", "user_id", "created_at")
    val out = Analytics.repeatPurchaseRate(orders).collect()
      .map(r => r.getDate(0).toString ->
        ((r.getAs[Long]("active_users"), r.getAs[Long]("repeat_users"),
          r.getAs[Long]("repeat_ppm")))).toMap
    assert(out == Map(
      "2024-01-01" -> ((1L, 0L, 0L)),
      "2024-02-01" -> ((2L, 1L, 500000L))), s"got $out")
  }

  test("price outliers: Tukey fences from exact quartile ranks catch the spike") {
    import spark.implicits._
    // cat A: 1..8 plus a 100.0 spike → n=9, q1 = rank 2 → 2.0, q3 = rank 7
    // → 7.0, IQR 5 → fences [−5.5, 14.5], one outlier
    val rows = ((1 to 8).map(_.toDouble) :+ 100.0).map(p => ("A", p))
    val out = Analytics.priceOutliers(rows.toDF("category", "sale_price")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_items") == 9L)
    assert(r.getAs[Double]("q1") == 2.0 && r.getAs[Double]("q3") == 7.0)
    assert(r.getAs[Double]("lo") == -5.5 && r.getAs[Double]("hi") == 14.5)
    assert(r.getAs[Long]("n_outliers") == 1L)
  }

  test("basket rules: directional ppm confidence from the same counts") {
    import spark.implicits._
    // same fixture as the market-basket test: 10∈{1,2,4}, 20∈{1,2,3,4},
    // 30∈{1,3}; supported pairs (10,20) c=3 and (20,30) c=2
    val base = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L), (2L, 20L),
      (3L, 20L), (3L, 30L),
      (4L, 10L), (4L, 20L))
    val out = Analytics.basketRules(base.toDF("order_id", "product_id")).collect()
      .map(r => (r.getAs[Long]("antecedent"), r.getAs[Long]("consequent")) ->
        ((r.getAs[Long]("c_both"), r.getAs[Long]("c_ant"), r.getAs[Long]("conf_ppm"))))
      .toMap
    assert(out.keySet == Set((10L, 20L), (20L, 10L), (20L, 30L), (30L, 20L)))
    // confidence is DIRECTIONAL: 10→20 fires always (3/3), 20→10 only 3/4
    assert(out((10L, 20L)) == ((3L, 3L, 1000000L)))
    assert(out((20L, 10L)) == ((3L, 4L, 750000L)))
    assert(out((30L, 20L)) == ((2L, 2L, 1000000L)))
    assert(out((20L, 30L)) == ((2L, 4L, 500000L)))
  }

  test("cohort ltv: first-order month anchors each user's revenue rows") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val orders = Seq(
      (1L, 10L, t("2024-01-05 00:00:00")), (2L, 10L, t("2024-02-10 00:00:00")),
      (3L, 20L, t("2024-02-20 00:00:00"))
    ).toDF("order_id", "user_id", "created_at")
    val items = Seq((1L, 10.0), (2L, 5.0), (3L, 7.0)).toDF("order_id", "sale_price")
    val out = Analytics.cohortLtv(orders, items).collect()
      .map(r => (r.getDate(0).toString, r.getDate(1).toString,
        r.getAs[Long]("n_buyers"), r.getAs[Double]("revenue"))).toSet
    assert(out == Set(
      ("2024-01-01", "2024-01-01", 1L, 10.0),
      ("2024-01-01", "2024-02-01", 1L, 5.0),
      ("2024-02-01", "2024-02-01", 1L, 7.0)))
  }

  test("revenue pareto: shares sum to 1, deciles monotone non-increasing in revenue") {
    val out = Analytics.revenuePareto(Tables.orderItems(spark, TestSession.sf))
      .collect().sortBy(_.getAs[Long]("decile"))
    assert(out.map(_.getAs[Long]("decile")).toSeq == (1L to 10L))
    val shares = out.map(_.getAs[Double]("revenue_share"))
    assert(math.abs(shares.sum - 1.0) < 1e-9)
    // revenue-desc tiling ⇒ decile revenues never increase down the curve
    val revs = out.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    // the head decile carries more than its uniform share
    assert(shares.head > 0.1)
  }

  test("price drift: shares sum to 1 per period, contribution is the chi-square form") {
    val drift = Analytics.priceDrift(Tables.orders(spark, TestSession.sf)).collect()
    assert(drift.nonEmpty)
    val (ps, qs) = (drift.map(_.getAs[Double]("p")).sum, drift.map(_.getAs[Double]("q")).sum)
    assert(math.abs(ps - 1.0) < 1e-9 && math.abs(qs - 1.0) < 1e-9)
    drift.foreach { r =>
      val (p, q, c) = (r.getAs[Double]("p"), r.getAs[Double]("q"), r.getAs[Double]("contrib"))
      assert(c == ((p - q) * (p - q)) / (p + q))
      assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") > 0)
    }
    // an identical-to-itself distribution has zero drift in every bucket
    val early = Tables.orders(spark, TestSession.sf)
      .filter(col("o_orderdate") < Analytics.driftSplitDate)
    val self = Analytics.priceDrift(
      early.union(early.withColumn("o_orderdate",
        col("o_orderdate") + org.apache.spark.sql.functions.expr("INTERVAL 10 YEARS"))))
      .collect()
    assert(self.forall(_.getAs[Double]("contrib") == 0.0))
  }

  test("popularity histogram: exact log2 buckets, including the power-of-two boundary") {
    import spark.implicits._
    // product 10 in 1 order (bucket 0), 20 in 2 (bucket 1), 30 in 4 (bucket 2 —
    // the boundary a float log2 could misplace), 40 in 3 (bucket 1)
    val oi = (Seq((1L, 10L)) ++ (1 to 2).map(i => (100L + i, 20L)) ++
      (1 to 4).map(i => (200L + i, 30L)) ++ (1 to 3).map(i => (300L + i, 40L)))
      .toDF("order_id", "product_id")
    val h = Analytics.popularityHistogram(oi).collect()
      .map(r => r.getAs[Int]("bucket") ->
        ((r.getAs[Long]("n_products"), r.getAs[Long]("orders_mass"),
          r.getAs[Long]("min_orders"), r.getAs[Long]("max_orders")))).toMap
    assert(h == Map(
      0 -> ((1L, 1L, 1L, 1L)),
      1 -> ((2L, 5L, 2L, 3L)),
      2 -> ((1L, 4L, 4L, 4L))))
  }

  test("weekly overlap sketch estimates within 15% of exact intersections") {
    val events = Tables.events(spark, TestSession.sf)
    val approx = Analytics.weeklyOverlapApprox(events).collect()
      .map(r => r.getDate(0) ->
        ((r.getAs[Long]("users_approx"), r.getAs[Long]("overlap_approx")))).toMap
    assert(approx.nonEmpty)
    import spark.implicits._
    // week_start is a DATE since r11 (pinned on both engines)
    val weekly = events
      .select(to_date(date_trunc("week", col("ts"))).as("week_start"), col("user_id"))
      .distinct().collect().groupBy(_.getDate(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    approx.foreach { case (w, (ua, ov)) =>
      val cur = weekly(w)
      val next = weekly(java.sql.Date.valueOf(w.toLocalDate.plusDays(7)))
      assert(math.abs(ua - cur.size).toDouble <= 0.15 * cur.size, s"$w users $ua vs ${cur.size}")
      val exact = (cur & next).size
      assert(math.abs(ov - exact).toDouble <= math.max(0.15 * exact, 3.0), s"$w overlap $ov vs $exact")
    }
  }

  test("approx uniques within 15% of exact counts per date") {
    val approx = Analytics.dailyUniquesApprox(Tables.ordersDomain(spark, TestSession.sf))
      .collect().map(r => r.getDate(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.ordersDomain(spark, TestSession.sf)
      .withColumn("order_date", org.apache.spark.sql.functions.to_date($"created_at"))
      .groupBy("order_date")
      .agg(org.apache.spark.sql.functions.countDistinct($"order_id").as("o"),
        org.apache.spark.sql.functions.countDistinct($"user_id").as("u"))
      .collect().map(r => r.getDate(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (d, (o, u)) =>
      val (ao, au) = approx(d)
      assert(math.abs(ao - o).toDouble / o <= 0.15, s"orders off at $d: $ao vs $o")
      assert(math.abs(au - u).toDouble / u <= 0.15, s"users off at $d: $au vs $u")
    }
  }

  test("revenue gini: uniform is 0, winner-takes-all is (n-1)/n") {
    import spark.implicits._
    def items(rev: Seq[Double]) = rev.zipWithIndex
      .map { case (r, i) => ((i + 1).toLong, r) }
      .toDF("product_id", "sale_price")
    val uni = Analytics.revenueGini(items(Seq(10.0, 10.0, 10.0, 10.0)))
      .collect().head
    assert(uni.getAs[Double]("gini") == 0.0, s"uniform: $uni")
    // three floor-to-zero products + one taking everything → G = 3/4
    val take = Analytics.revenueGini(items(Seq(0.4, 0.4, 0.4, 100.0)))
      .collect().head
    assert(take.getAs[Double]("gini") == 0.75, s"winner-takes-all: $take")
  }

  test("sale gaps: exact run lengths, singleton days excluded") {
    import spark.implicits._
    // product 1 sells on days 1, 2, 5, 10 → gaps 0, 2, 4 (n=3, max=4,
    // total=6, mean 2000 milli); product 2 has one day → no gap rows
    val items = Seq((1L, "1992-01-01"), (1L, "1992-01-02"), (1L, "1992-01-05"),
      (1L, "1992-01-10"), (2L, "1992-01-01"))
      .toDF("product_id", "created_at")
      .withColumn("created_at", col("created_at").cast("date"))
    val r = Analytics.saleGaps(items).collect()
      .map(x => x.getAs[Long]("product_id") ->
        (x.getAs[Long]("n_gaps"), x.getAs[Long]("max_gap_days"),
          x.getAs[Long]("total_gap_days"), x.getAs[Long]("mean_gap_milli"))).toMap
    assert(r == Map(1L -> ((3L, 4L, 6L, 2000L))), s"got $r")
  }

  test("trend slope: exact least squares, constant flat, singletons excluded") {
    import spark.implicits._
    // product 1: 2/4/6 units on consecutive days → slope exactly 2/day;
    // product 2: 3 units on each of two days → slope 0; product 3: one day
    val rows =
      Seq.fill(2)((1L, "1992-01-01")) ++ Seq.fill(4)((1L, "1992-01-02")) ++
        Seq.fill(6)((1L, "1992-01-03")) ++
        Seq.fill(3)((2L, "1992-01-01")) ++ Seq.fill(3)((2L, "1992-01-05")) ++
        Seq((3L, "1992-02-01"))
    val items = rows.toDF("product_id", "created_at")
      .withColumn("created_at", col("created_at").cast("date"))
    val r = Analytics.trendSlope(items).collect()
      .map(x => x.getAs[Long]("product_id") ->
        (x.getAs[Long]("n_days"), x.getAs[Long]("slope_milli"))).toMap
    assert(r == Map(1L -> ((3L, 2000L)), 2L -> ((2L, 0L))), s"got $r")
  }

  test("segment transitions: retained, churned, and activated users all land") {
    import spark.implicits._
    // u1: 1 order Jan → 4 orders Feb (one→many); u2: 2 orders Jan, absent
    // Feb (few→none); u3: absent Jan, 1 order Feb (none→one). Bounds clip
    // the matrix to the Jan→Feb pair only.
    val orders = (Seq((1L, 1L, "1995-01-05")) ++
      (1 to 4).map(i => ((10 + i).toLong, 1L, s"1995-02-0$i")) ++
      Seq((20L, 2L, "1995-01-10"), (21L, 2L, "1995-01-20"),
        (30L, 3L, "1995-02-15")))
      .toDF("order_id", "user_id", "created_at")
      .withColumn("created_at", col("created_at").cast("date"))
    val m = Analytics.segmentTransitions(orders).collect()
      .map(r => (r.getAs[java.sql.Date]("month_from").toString,
        r.getAs[String]("from_tier"), r.getAs[String]("to_tier")) ->
        r.getAs[Long]("n_users")).toMap
    assert(m == Map(
      ("1995-01-01", "one", "many") -> 1L,
      ("1995-01-01", "few", "none") -> 1L,
      ("1995-01-01", "none", "one") -> 1L), s"got $m")
  }
}
