package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Quality, Relational}

/** Validation-operator semantics (reference: validate_task.py:153-217,
  * re-expressed distributed — SURVEY.md §2.1 V1/A5/J5, §5.2 failure paths).
  */
class QualitySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("benford: an exactly-Benford sample scores zero drift; uniform digits flag digit 1") {
    import org.apache.spark.sql.functions._
    // benfordPpm sums to exactly 1e6, so n_d = ppm_d gives obs_ppm == ppm_d
    val perfect = graft.operators.Quality.benfordPpm.toDF("d", "n")
      .select(explode(expr("sequence(1, n)")).as("i"), col("d").as("v"))
    val zero = graft.operators.Quality.benfordDrift(perfect, "v").collect()
    assert(zero.length == 9 && zero.forall(_.getAs[Long]("chi2_ppm") == 0L),
      "a perfectly Benford sample must have zero chi2 on every digit")
    val uniform = (1 to 9).flatMap(d => Seq.fill(100)(d)).toDF("v")
    val drift = graft.operators.Quality.benfordDrift(uniform, "v").collect()
      .map(r => r.getAs[Int]("digit") -> r.getAs[Long]("chi2_ppm")).toMap
    assert(drift(1) > 100000L, s"uniform digits must flag digit 1 hard, got ${drift(1)}")
    assert(drift(9) > drift(5), "over-represented tail digits drift more than mid ones")
  }

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

  test("skew-split join equals plain join; sampled hot keys find the hot key and stay bounded") {
    val skewed = (1 to 500).map(i => (if (i <= 450) 1L else i.toLong, i))
      .toDF("k", "v") // 90% of rows share key 1
    val dim = Seq((1L, "hot"), (460L, "cold")).toDF("k", "name")
    val plain = skewed.join(dim, Seq("k"), "left")
    // row identity must hold for ANY hot classification: the estimated set,
    // an empty set (degenerates to the plain join), and a false positive
    val hot = Relational.hotKeys(skewed, "k", fraction = 0.5, minShare = 0.1)
    assert(hot == Seq(1L), s"expected only the 90% key, got $hot")
    for (h <- Seq(hot, Seq.empty[Long], Seq(460L, 7L))) {
      val split = Relational.skewSplitLeftJoin(skewed, dim, "k", h, 8)
      assert(split.exceptAll(plain).isEmpty && plain.exceptAll(split).isEmpty,
        s"hot=$h")
      assert(split.count() == 500)
    }
  }

  test("write-with-metrics: observed counts equal a standalone scan; data lands intact") {
    val out = java.nio.file.Files.createTempDirectory("graft-obs").toString + "/items"
    val metrics = Quality.writeWithMetrics(items, Seq("sale_price"), out)
    assert(metrics("n_rows") == 4L)
    assert(metrics("sale_price_nulls") == 1L) // matches nullCounts' answer
    val written = spark.read.parquet(out)
    assert(written.count() == 4L)
    assert(Quality.nullCounts(written, Seq("sale_price")).head().getLong(0) == 1L)
  }

  test("null-rate drift: per-column early/late rates and delta, exact divisions") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    // early (2 rows, 1 null) → 0.5; late (4 rows, 1 null) → 0.25; drift −0.25
    val rows = Seq(
      (1L, Option.empty[Timestamp], t("1997-05-01 00:00:00")),
      (2L, Some(t("1997-06-01 00:00:00")), t("1997-06-01 00:00:00")),
      (3L, Option.empty[Timestamp], t("1999-01-01 00:00:00")),
      (4L, Some(t("1999-02-01 00:00:00")), t("1999-02-01 00:00:00")),
      (5L, Some(t("1999-03-01 00:00:00")), t("1999-03-01 00:00:00")),
      (6L, Some(t("1999-04-01 00:00:00")), t("1999-04-01 00:00:00"))
    ).toDF("order_id", "returned_at", "created_at")
    val r = Quality.nullRateDrift(rows, Seq("returned_at")).collect()(0)
    assert(r.getAs[Long]("n_early") == 2L && r.getAs[Long]("n_late") == 4L)
    assert(r.getAs[Double]("returned_at_null_early") == 0.5)
    assert(r.getAs[Double]("returned_at_null_late") == 0.25)
    assert(r.getAs[Double]("returned_at_null_drift") == -0.25)
  }

  test("fuzzy name pairs: blocked join finds exactly the brute-force pairs at tau") {
    val part = graft.sources.Tables.part(spark, TestSession.sf)
    val got = Quality.fuzzyNamePairs(part).collect()
      .map(r => (r.getAs[String]("name_a"), r.getAs[String]("name_b"),
        r.getAs[Int]("lev"))).toSet
    assert(got.nonEmpty)
    assert(got.forall { case (a, b, l) => a < b && l <= Quality.fuzzyTau })
    // honesty check on the fixture: blocking on the last token must lose
    // NOTHING vs all-pairs at this tau (a cross-block near-pair would fail here)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = part.select("p_name").distinct().collect().map(_.getString(0))
    val brute = (for {
      a <- names; b <- names if a < b && lev(a, b) <= Quality.fuzzyTau
    } yield (a, b)).toSet
    assert(got.map(p => (p._1, p._2)) == brute,
      s"blocked pairs ${got.size} vs brute-force ${brute.size}")
  }

  test("top-N is deterministic under ties (revenue desc, category asc)") {
    val c = Seq(("a", 1.0), ("b", 1.0), ("c", 2.0)).toDF("category", "sale_price")
    val top = Relational.topCategoriesByRevenue(c, 2).collect().map(_.getString(0))
    assert(top.toSeq == Seq("c", "a"))
  }

  test("profile: counts skip nulls; quartiles interpolate linearly") {
    val li = Seq(
      (1L, 1L, 1L, 1, Some(1.0), 1.0, 0.0, 0.0, "N", "O", new java.sql.Timestamp(0)),
      (2L, 1L, 1L, 1, Some(2.0), 1.0, 0.0, 0.0, "N", "O", new java.sql.Timestamp(0)),
      (3L, 1L, 1L, 1, Some(3.0), 1.0, 0.0, 0.0, "R", "O", new java.sql.Timestamp(0)),
      (4L, 1L, 1L, 1, Some(4.0), 1.0, 0.0, 0.0, "R", "O", new java.sql.Timestamp(0)),
      (5L, 1L, 1L, 1, None, 1.0, 0.0, 0.0, "A", "O", new java.sql.Timestamp(0)))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
    val p = graft.operators.Quality.profileLineitem(li).head()
    assert(p.getAs[Long]("n_rows") == 5 && p.getAs[Long]("n_qty") == 4
      && p.getAs[Long]("n_qty_null") == 1 && p.getAs[Long]("n_flags") == 3)
    assert(p.getAs[Double]("qty_p25") == 1.75 && p.getAs[Double]("qty_p50") == 2.5
      && p.getAs[Double]("qty_p75") == 3.25)
  }

  test("stratified sample: per-stratum rates approximately hold, membership is stable") {
    val orders = (1L to 4000L).map(i =>
      (i, i % 97, if (i % 2 == 0) "F" else "O", 1.0, new java.sql.Timestamp(0), "p"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
    val s1 = Relational.stratifiedSample(orders).collect()
    val byStatus = s1.groupBy(_.getAs[String]("status")).view.mapValues(_.length).toMap
    // 2000 F rows at 5% and 2000 O rows at 20%; md5 buckets are near-uniform
    assert(byStatus("F") > 50 && byStatus("F") < 150)
    assert(byStatus("O") > 300 && byStatus("O") < 500)
    assert(s1.forall(r => r.getAs[Double]("weight") ==
      1000.0 / r.getAs[Int]("rate")))
    // determinism: same membership on a rerun with different partitioning
    val s2 = Relational.stratifiedSample(orders.repartition(7)).collect()
    assert(s1.map(_.getAs[Long]("order_id")).sorted.sameElements(
      s2.map(_.getAs[Long]("order_id")).sorted))
  }

  test("rows checksum: order/partitioning-invariant, any changed row flips it") {
    import java.sql.Timestamp
    def row(k: Long, c: Long, st: String, pr: String, d: String) =
      (k, c, st, pr, Timestamp.valueOf(d + " 00:00:00"))
    val rows = Seq(
      row(1, 10, "O", "1-URGENT", "1995-01-01"),
      row(2, 20, "F", "3-MEDIUM", "1995-06-01"),
      row(3, 30, "O", "5-LOW", "1996-01-01"))
    def frame(rs: Seq[(Long, Long, String, String, Timestamp)], parts: Int) =
      rs.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
        "o_orderdate").repartition(parts)
    def sig(df: org.apache.spark.sql.DataFrame) = {
      val r = Quality.rowsChecksum(df).collect().head
      (r.getAs[Long]("n_rows"), r.getAs[Long]("xor_sig"))
    }
    val base = sig(frame(rows, 1))
    assert(sig(frame(rows.reverse, 7)) == base,
      "signature must not depend on row order or partitioning")
    val changed = sig(frame(rows.updated(1,
      row(2, 20, "F", "2-HIGH", "1995-06-01")), 3))
    assert(changed._1 == base._1 && changed._2 != base._2,
      "a one-column change must flip the xor signature")
  }

  test("rule battery: every rule fires on its violation, clean rows don't") {
    import org.apache.spark.sql.functions.col
    val li = Seq(
      (60.0, 0.09, "R", "O"), // violates all three item rules
      (10.0, 0.00, "N", "F")  // clean
    ).toDF("l_quantity", "l_discount", "l_returnflag", "l_linestatus")
    val ord = Seq(
      (-5.0, "X", "1990-01-01"), // violates all three order rules
      (10.0, "F", "1995-01-01")  // clean
    ).toDF("o_totalprice", "o_orderstatus", "o_orderdate")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
    val r = Quality.ruleViolations(li, ord).collect()
      .map(x => x.getAs[String]("rule") ->
        (x.getAs[Long]("n_violations"), x.getAs[Long]("n_rows"),
          x.getAs[Long]("violation_ppm"))).toMap
    assert(r.size == 6, "all six rules must report, including clean ones")
    assert(r.values.forall(_ == ((1L, 2L, 500000L))), s"got $r")
  }

  test("k-anonymity: classes below k flagged, banding floors negatives correctly") {
    import spark.implicits._
    // 5 rows in one QI class (safe at k=5), 2 in another (at risk), and one
    // negative-balance row whose band must floor DOWN (-0.5 -> band -1)
    val rows =
      (1 to 5).map(i => (i.toLong, "x", 7, 1500.0, "BUILDING")) ++
      Seq((6L, "x", 7, 2500.0, "BUILDING"), (7L, "x", 7, 2999.0, "BUILDING"),
        (8L, "x", 3, -500.0, "MACHINERY"))
    val df = rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val out = Quality.kAnonymity(df).collect()
      .map(r => (r.getAs[Int]("c_nationkey"), r.getAs[Long]("bal_band")) ->
        (r.getAs[Long]("group_size"), r.getAs[Int]("at_risk"))).toMap
    assert(out((7, 1L)) == ((5L, 0)))   // exactly k: safe
    assert(out((7, 2L)) == ((2L, 1)))   // below k: flagged
    assert(out((3, -1L)) == ((1L, 1)))  // negative balance floors to band -1
    assert(out.size == 3)
  }

  test("l-diversity: homogeneous classes flagged even when k-anonymous") {
    import spark.implicits._
    // class (7, band 1): 5 members but ONE segment -> k-safe, l-homogeneous;
    // class (7, band 2): 2 members, two segments -> l-diverse
    val rows =
      (1 to 5).map(i => (i.toLong, "x", 7, 1500.0, "BUILDING")) ++
      Seq((6L, "x", 7, 2500.0, "BUILDING"), (7L, "x", 7, 2999.0, "MACHINERY"))
    val df = rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val out = Quality.lDiversity(df).collect()
      .map(r => (r.getAs[Int]("c_nationkey"), r.getAs[Long]("bal_band")) ->
        (r.getAs[Long]("group_size"), r.getAs[Long]("l_distinct"),
          r.getAs[Int]("homogeneous"))).toMap
    assert(out((7, 1L)) == ((5L, 1L, 1)), "size-5 single-segment class must flag")
    assert(out((7, 2L)) == ((2L, 2L, 0)), "two-segment class is l-diverse")
  }

  test("join skew: hottest keys ranked, shares and skew-vs-mean exact") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c", "d")).toDF("k")
    val out = Quality.joinSkew(df, "k").collect()
      .map(r => r.getAs[String]("key") ->
        (r.getAs[Long]("cnt"), r.getAs[Long]("rank"), r.getAs[Long]("n_keys"),
          r.getAs[Long]("total"), r.getAs[Long]("share_ppm"),
          r.getAs[Long]("skew_x1000"))).toMap
    assert(out("a") == ((5L, 1L, 4L, 10L, 500000L, 2000L)),
      "key a holds half the rows: 2x the uniform mean")
    assert(out("b") == ((3L, 2L, 4L, 10L, 300000L, 1200L)))
    assert(out("c") == ((1L, 3L, 4L, 10L, 100000L, 400L)))
    assert(out("d")._2 == 4L, "ties broken by key order")
  }
}
