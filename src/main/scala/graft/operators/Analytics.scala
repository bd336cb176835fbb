package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Op
import graft.functions.{Kmv, Portable}
import graft.sources.Tables

/** Analytics operators beyond the reference's inventory (it has no sorts,
  * windows, or grouping sets — SURVEY.md §2.1 coverage notes): multi-level
  * aggregation, windowed trends, and the approximate-distinct variant that
  * replaces exact countDistinct at 100 TB.
  */
object Analytics {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 4))).cast(DoubleType)
  private def dsumSql(x: String) = s"CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE)"

  /** Category revenue with ROLLUP subtotals: (category, date), per-category,
    * and grand total. Two-level: the fact table first reduces to (category,
    * date) leaves, and the grouping-set EXPAND runs over those few thousand
    * leaf rows — not ×3 over every item row. Bit-exact versus a direct
    * rollup: leaf revenues carry ≤ 4 decimal places (exactly representable
    * doubles), so re-summing them as DECIMAL(18,4) is lossless and
    * order-independent.
    */
  def categoryRollup(consolidated: DataFrame): DataFrame =
    consolidated
      .groupBy(col("category"), col("order_date"))
      .agg(dsum(col("sale_price")).as("leaf_rev"), count(lit(1)).as("leaf_n"))
      .rollup(col("category"), col("order_date"))
      .agg(dsum(col("leaf_rev")).as("revenue"),
        sum(col("leaf_n")).as("n_items"))

  /** Full CUBE over (category, order_date): all four grouping sets, unlike
    * [[categoryRollup]]'s hierarchy — per-date-across-categories subtotals
    * are what a dashboard slices on. Same two-level shape: reduce the fact
    * table to leaf grain first, EXPAND runs over the few thousand leaves.
    */
  def categoryCube(consolidated: DataFrame): DataFrame =
    consolidated
      .groupBy(col("category"), col("order_date"))
      .agg(dsum(col("sale_price")).as("leaf_rev"), count(lit(1)).as("leaf_n"))
      .cube(col("category"), col("order_date"))
      .agg(dsum(col("leaf_rev")).as("revenue"),
        sum(col("leaf_n")).as("n_items"))

  /** Inter-order gaps: days since each user's previous order (lead/lag
    * window — the recency signal RFM's last-order date summarizes away).
    * Partitioned by user, so every window sort is user-local — no global
    * sort at any scale. Deterministic tie-break on order_id for same-instant
    * orders.
    */
  def orderGaps(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("created_at"), col("order_id"))
    orders
      .select(col("order_id"), col("user_id"), col("created_at"))
      .withColumn("prev_created_at", lag(col("created_at"), 1).over(w))
      .withColumn("gap_days",
        datediff(to_date(col("created_at")), to_date(col("prev_created_at"))))
  }

  /** Per-category daily revenue trends: rank within each date and a 7-row
    * moving average along each category's time series — one shuffle, then
    * in-partition sorted window evaluation.
    */
  def categoryTrends(consolidated: DataFrame): DataFrame = {
    val daily = consolidated.groupBy(col("category"), col("order_date"))
      .agg(dsum(col("sale_price")).as("revenue"))
    val byDate = Window.partitionBy("order_date")
      .orderBy(col("revenue").desc, col("category"))
    val trail = Window.partitionBy("category").orderBy("order_date")
      .rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("rank_in_date", rank().over(byDate))
      .withColumn("trailing7_avg",
        (sum(col("revenue").cast(DecimalType(18, 4))).over(trail).cast(DoubleType)
          / count(lit(1)).over(trail)))
  }

  /** The 100 TB variant of A4's exact countDistinct: KMV synopses
    * ([[graft.functions.Kmv]]) merge associatively, so both uniques come
    * from the same single shuffle as any other aggregate instead of a
    * distinct-expand, with ≤ [[Kmv.K]] longs of state per (day, metric).
    * r10: converted from `approx_count_distinct` (HLL++, engine-private
    * registers) to KMV over [[Portable.hash60]] — same sketch properties,
    * but the estimates are exact integer arithmetic the DuckDB oracle
    * reproduces bit-for-bit, so the op graduated from rows-only to the
    * full hash gate. Accuracy vs the exact op stays spec-tested.
    */
  def dailyUniquesApprox(orders: DataFrame, k: Int = Kmv.K): DataFrame =
    orders
      .select(to_date(col("created_at")).as("order_date"),
        Portable.hash60(col("order_id").cast(StringType)).as("ho"),
        Portable.hash60(col("user_id").cast(StringType)).as("hu"))
      // NULL ids hash to NULL, and the UDAF's Long input encoder is
      // non-nullable — pin "nulls don't count as a distinct value" on both
      // engines instead of leaving the behavior encoder-defined.
      .filter(col("ho").isNotNull && col("hu").isNotNull)
      .groupBy(col("order_date"))
      .agg(
        Kmv.kminDistinct(k)(col("ho")).as("sko"),
        Kmv.kminDistinct(k)(col("hu")).as("sku"))
      .select(col("order_date"),
        Kmv.estimate("sko", k).as("total_orders_approx"),
        Kmv.estimate("sku", k).as("unique_customers_approx"))

  /** Exact per-category price quantiles by explicit rank selection
    * (`value at row ceil(p·n)` — the percentile_disc definition, spelled out
    * so both engines run the IDENTICAL formulation). Ranks are computed as
    * `floor((a·n + a) / b)` ≡ `ceil(a·n / b)` in integer-exact arithmetic:
    * multiplying n by a double literal like 0.9 would put the comparison one
    * ULP off an integer boundary and silently select the wrong row.
    * One shuffle + in-partition sort; the interpolating variant is
    * deliberately avoided (interpolation order differs across engines).
    */
  def priceQuantiles(consolidated: DataFrame): DataFrame = {
    val byCat = Window.partitionBy(col("category"))
    val w = byCat.orderBy(col("sale_price"))
    def rankOf(a: Int, b: Int) = floor((col("n") * a + a) / lit(b.toDouble))
    def pick(a: Int, b: Int) = max(when(col("rn") === rankOf(a, b), col("sale_price")))
    consolidated
      .filter(col("sale_price").isNotNull)
      .select(col("category"), col("sale_price"))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .withColumn("n", count(lit(1)).over(byCat))
      .groupBy(col("category"))
      .agg(max(col("n")).as("n_items"),
        pick(1, 2).as("p50"), pick(9, 10).as("p90"), pick(99, 100).as("p99"))
  }

  /** Monthly repeat-purchase rate: per month, the users active that month
    * split into new (their first-order month) vs returning, with the ppm
    * repeat share — the retention KPI beside [[cohortLtv]]'s revenue
    * triangle. Two aggregates at (user, month) grain and one user-keyed
    * join; the fact table is touched once.
    */
  def repeatPurchaseRate(orders: DataFrame): DataFrame = {
    val um = orders
      .select(col("user_id"),
        to_date(date_trunc("month", col("created_at"))).as("m"))
      .distinct()
    val first = um.groupBy(col("user_id")).agg(min(col("m")).as("fm"))
    um.join(first, "user_id")
      .groupBy(col("m").as("month"))
      .agg(count(lit(1)).as("active_users"),
        sum(when(col("m") > col("fm"), 1L).otherwise(0L)).as("repeat_users"))
      .select(col("month"), col("active_users"), col("repeat_users"),
        expr("(repeat_users * 1000000) div active_users").as("repeat_ppm"))
  }

  /** Month-over-month activity-tier migration matrix: per month, users are
    * tiered by order count (`one` = 1, `few` = 2-3, `many` ≥ 4) and every
    * consecutive month pair contributes one (from_tier → to_tier) cell per
    * user — with `none` as the explicit absent state, so churn (tier →
    * none) and activation (none → tier) land in the same matrix as the
    * retained diagonal. This is the segment-migration readout a lifecycle
    * team tracks release-over-release; the monthly RFM op scores ONE
    * month, this scores the FLOW between months.
    *
    * Plan: the order stream collapses to (user, month) grain immediately;
    * the transition join is a self full-outer-join of that tiny frame on
    * (user, month) with one side shifted a month back, so the absent
    * states fall out of the join nulls — no dense user×month spine is
    * ever materialized. Boundary months (before the first / after the
    * last) are excluded via the broadcast 1-row month-bounds frame.
    * Everything after the first aggregate is at user-month grain, ≪ the
    * fact table at any scale.
    */
  def segmentTransitions(orders: DataFrame): DataFrame = {
    val um = orders
      .groupBy(col("user_id"),
        to_date(date_trunc("month", col("created_at"))).as("m"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("m"),
        when(col("n") === 1, "one").when(col("n") <= 3, "few")
          .otherwise("many").as("tier"))
    val bounds = um.agg(min(col("m")).as("mn"), max(col("m")).as("mx"))
    val a = um.select(col("user_id"), col("m"), col("tier").as("from_tier"))
    val b = um.select(col("user_id"), add_months(col("m"), -1).as("m"),
      col("tier").as("to_tier"))
    a.join(b, Seq("user_id", "m"), "full_outer")
      .crossJoin(broadcast(bounds))
      .filter(col("m") >= col("mn") && col("m") <= add_months(col("mx"), -1))
      .groupBy(col("m").as("month_from"),
        coalesce(col("from_tier"), lit("none")).as("from_tier"),
        coalesce(col("to_tier"), lit("none")).as("to_tier"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Per-product availability audit: gap statistics over the product's
    * sale-day sequence — the longest and mean run of consecutive days with
    * ZERO sales between two observed sale days (the stockout/delisting
    * proxy a demand pipeline screens before trusting a trend: a product
    * with a 40-day hole isn't "low demand", it was unavailable). Gap =
    * `day − lag(day) − 1`, exact integers; products with < 2 sale days
    * have no gap and are excluded.
    *
    * Scale shape: the fact stream collapses to (product, day) grain
    * map-side; the lag is a product-partitioned window over that tiny
    * frame (bounded by the calendar, not the data volume); one
    * product-grain aggregate finishes. Mean is reported in milli-days.
    */
  def saleGaps(items: DataFrame): DataFrame = {
    val daily = items
      .select(col("product_id"), to_date(col("created_at")).as("day"))
      .distinct()
    val w = Window.partitionBy(col("product_id")).orderBy(col("day"))
    daily
      .withColumn("gap",
        datediff(col("day"), lag(col("day"), 1).over(w)).cast(LongType) - 1L)
      .filter(col("gap").isNotNull)
      .groupBy(col("product_id"))
      .agg(count(lit(1)).as("n_gaps"), max(col("gap")).as("max_gap_days"),
        sum(col("gap")).as("total_gap_days"))
      .withColumn("mean_gap_milli",
        expr("(total_gap_days * 1000) div n_gaps"))
  }

  /** Per-product demand trend: the exact least-squares slope of daily
    * units over the day index, in milli-units/day —
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    * with x = days since the fixed 1992-01-01 epoch and y = units sold
    * that day. Every S-term is an exact BIGINT, so the single flooring
    * division is the only rounding and the ranking of "trending up vs
    * bleeding out" products is partitioning-invariant. Products observed
    * on < 2 distinct days have no slope and are excluded (den = 0).
    *
    * Scale shape: the fact stream collapses to (product, day) grain
    * map-side, then ONE product-grain aggregate computes all five S-terms
    * — no window, no self-join, nothing proportional to days×products.
    * The x-range is the calendar, which does NOT grow with data volume,
    * so the BIGINT headroom (n·Σxy ≲ 1e12 per product at a 30-year span)
    * holds at any corpus size.
    */
  def trendSlope(items: DataFrame): DataFrame = {
    val daily = items
      .groupBy(col("product_id"),
        datediff(to_date(col("created_at")), lit("1992-01-01").cast(DateType))
          .cast(LongType).as("x"))
      .agg(count(lit(1)).as("y"))
    daily.groupBy(col("product_id"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .filter(expr("n * sxx - sx * sx") =!= 0)
      .select(col("product_id"), col("n").as("n_days"),
        expr("(1000 * (n * sxy - sx * sy)) div (n * sxx - sx * sx)")
          .as("slope_milli"))
  }

  /** Tukey-fence outlier detection per category: exact Q1/Q3 via the same
    * integer-rank order statistics as [[priceQuantiles]], fences at
    * `q1 − 1.5·IQR / q3 + 1.5·IQR`, and the per-category count of items
    * outside them — the pricing-error / fabricated-data screen a catalog
    * pipeline runs on ingest. The fence arithmetic is a fixed IEEE
    * expression evaluated identically by both engines (1.5 is exact in
    * binary), so the op is fully hash-checked despite double prices.
    *
    * Scale shape: one category-partitioned rank window (the
    * [[priceQuantiles]] sort), then the 6-row fence frame broadcasts back
    * onto the item scan for the outlier count — the fact table streams
    * once, no second sort.
    */
  def priceOutliers(consolidated: DataFrame): DataFrame = {
    val byCat = Window.partitionBy(col("category"))
    val w = byCat.orderBy(col("sale_price"))
    def rankOf(a: Int, b: Int) = floor((col("n") * a + a) / lit(b.toDouble))
    def pick(a: Int, b: Int) = max(when(col("rn") === rankOf(a, b), col("sale_price")))
    val prices = consolidated.filter(col("sale_price").isNotNull)
      .select(col("category"), col("sale_price"))
    val fences = prices
      .withColumn("rn", row_number().over(w).cast(LongType))
      .withColumn("n", count(lit(1)).over(byCat))
      .groupBy(col("category"))
      .agg(max(col("n")).as("n_items"), pick(1, 4).as("q1"), pick(3, 4).as("q3"))
      .select(col("category"), col("n_items"), col("q1"), col("q3"),
        (col("q1") - (col("q3") - col("q1")) * 1.5).as("lo"),
        (col("q3") + (col("q3") - col("q1")) * 1.5).as("hi"))
    prices.join(broadcast(fences), "category")
      .groupBy(col("category"))
      .agg(max(col("n_items")).as("n_items"),
        max(col("q1")).as("q1"), max(col("q3")).as("q3"),
        max(col("lo")).as("lo"), max(col("hi")).as("hi"),
        sum(when(col("sale_price") < col("lo") || col("sale_price") > col("hi"),
          1L).otherwise(0L)).as("n_outliers"))
  }

  /** Histogram-sketch bucket width in cents; the absolute error bound of
    * [[priceQuantilesApprox]] is `gridCents / 100` dollars (spec-pinned).
    */
  val quantileGridCents = 25L

  /** The 100 TB variant: approximate quantiles from a DETERMINISTIC
    * fixed-grid histogram sketch — bucket every price onto the
    * [[quantileGridCents]]-cent grid, ONE hash-aggregate of bounded state
    * per category (≤ price-range/grid buckets: fixed memory like a
    * GK/t-digest sketch, map-side partials absorb the corpus), then read
    * each target rank off the cumulative histogram. The estimate is the
    * target bucket's lower bound, so `0 ≤ exact − estimate < grid/100`
    * dollars. Deliberately NOT Spark's `percentile_approx`: Greenwald-
    * Khanna survivors are a merge-order artifact with no cross-engine twin
    * (the r7 rows-only blocker), while integer bucket counts sum exactly on
    * ANY partitioning — so this sketch is partitioning-invariant by
    * construction and bit-reproduced by the DuckDB oracle (VERDICT r8 #7).
    * Rank targets match [[priceQuantiles]]'s `floor((n+1)·p)` convention.
    */
  def priceQuantilesApprox(consolidated: DataFrame,
      gridCents: Long = quantileGridCents): DataFrame = {
    val hb = consolidated
      .filter(col("sale_price").isNotNull)
      .groupBy(col("category"),
        floor(col("sale_price") * lit(100.0) / lit(gridCents.toDouble))
          .cast(LongType).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val byCat = Window.partitionBy(col("category"))
    val cum = hb
      .withColumn("cum", sum(col("cnt")).over(byCat.orderBy(col("bucket"))))
      .withColumn("n", sum(col("cnt")).over(byCat))
    def pick(a: Int, b: Int) =
      (min(when(col("cum") >= expr(s"(n * $a + $a) div $b"), col("bucket")))
        * gridCents).cast(DoubleType) / lit(100.0)
    cum.groupBy(col("category"))
      .agg(max(col("n")).as("n_items"),
        pick(1, 2).as("p50"), pick(9, 10).as("p90"), pick(99, 100).as("p99"))
  }

  /** Exact DISTRIBUTED global row_number over `sort` (which must be a total
    * order — include a unique tie-break column): range-repartition on the
    * sort key, rank WITHIN each range partition (a partitioned window — no
    * single-task sort anywhere), then add each partition's cumulative start
    * offset. The per-partition sizes are a ≤`Scale.maxRangePartitions`-row driver
    * artifact (the bounded-collect category: date lists, k-means codebooks),
    * folded back in as a literal map, so the plan carries NO unpartitioned
    * window and no extra join. The input is localCheckpoint-ed once so the
    * size count and the output pass share one materialization instead of
    * re-running the upstream aggregate twice.
    *
    * RangePartitioner boundaries are sampled, but assignment is a
    * deterministic binary search per key and the sort key is total, so the
    * resulting global numbering is exactly the single-sort row_number.
    */
  /** The distributed ranking stage of [[withGlobalRowNumber]], pre-
    * checkpoint — exposed for plan tests: every Window in here is
    * PARTITIONED (by the range-partition id); nothing sorts globally.
    */
  private[graft] def rankedByRange(df: DataFrame,
      sort: Seq[org.apache.spark.sql.Column]): DataFrame = {
    // size-based fan-out, capped at maxRangePartitions: the per-partition
    // counts round-trip through a driver collect before folding back as one
    // dense Scale.offsetArray constant, so the partition count must stay a
    // bounded driver artifact while still growing with the data
    val parts = graft.Scale.partitionsFor(df, graft.Scale.maxRangePartitions)
    df.repartitionByRange(parts, sort: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_lrn",
        row_number().over(Window.partitionBy(col("_pid")).orderBy(sort: _*)).cast(LongType))
  }

  private[graft] def withGlobalRowNumber(df: DataFrame, out: String,
      sort: Seq[org.apache.spark.sql.Column]): (DataFrame, Long) = {
    val local = rankedByRange(df, sort).localCheckpoint()
    val sizes = local.groupBy(col("_pid")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val n = sizes.map(_._2).sum
    if (sizes.isEmpty) return (df.withColumn(out, lit(null).cast(LongType)), 0L)
    val offArr = graft.Scale.offsetArray(sizes.toMap)
    (local.withColumn(out, element_at(offArr, col("_pid") + 1) + col("_lrn"))
      .drop("_pid", "_lrn"), n)
  }

  /** RFM segmentation: per-user recency (last order date), frequency (order
    * count), monetary (decimal-exact revenue sum), each scored into exact
    * rank-based quintiles `1 + floor(5·(rank−1)/n)` — integer-exact on both
    * engines (a double literal like 0.2 would sit one ULP off the bucket
    * boundary). Ties break on user_id, so every score is deterministic.
    *
    * Scale shape: each metric ranks via [[withGlobalRowNumber]] — three range
    * shuffles of the user-grain frame, every sort partitioned, NO single-task
    * global window at any user count (the r3 verdict's one flagged
    * scale-killer). [[rfmSegmentsApprox]] remains the one-pass sketch variant
    * when three exact rank shuffles are still too many.
    */
  def rfmSegments(orders: DataFrame, items: DataFrame): DataFrame = {
    val users = rfmUsers(orders, items)
    // ranks are Long from the start (a 32-bit row_number ×5 would overflow
    // past ~429M users — exactly the scale this op is for; the oracle's
    // BIGINT math would keep going while Spark threw)
    val (rankedR, n) = withGlobalRowNumber(users, "rn_r",
      Seq(col("last_order_date"), col("user_id")))
    val (rankedF, _) = withGlobalRowNumber(rankedR, "rn_f",
      Seq(col("n_orders"), col("user_id")))
    val (rankedM, _) = withGlobalRowNumber(rankedF, "rn_m",
      Seq(col("monetary"), col("user_id")))
    def quintile(rn: org.apache.spark.sql.Column) =
      lit(1) + floor((lit(5) * (rn - 1)) / lit(n))
    val scored = rankedM
      .withColumn("r_score", quintile(col("rn_r")))
      .withColumn("f_score", quintile(col("rn_f")))
      .withColumn("m_score", quintile(col("rn_m")))
    scored.select(col("user_id"), col("last_order_date"), col("n_orders"),
      col("monetary"), col("r_score"), col("f_score"), col("m_score"),
      (col("r_score") * 100 + col("f_score") * 10 + col("m_score")).as("rfm_code"))
  }

  /** User-grain R/F/M inputs shared by the exact and approximate scorers. */
  private def rfmUsers(orders: DataFrame, items: DataFrame): DataFrame = {
    val rev = items.groupBy(col("order_id"))
      .agg(dsum(col("sale_price")).as("order_revenue"))
    orders
      .select(col("order_id"), col("user_id"), to_date(col("created_at")).as("order_date"))
      .join(rev, Seq("order_id"), "left")
      .groupBy(col("user_id"))
      .agg(max(col("order_date")).as("last_order_date"),
        count(lit(1)).as("n_orders"),
        dsum(coalesce(col("order_revenue"), lit(0.0))).as("monetary"))
  }

  /** The 100 TB variant of [[rfmSegments]]: quintile BOUNDARIES from
    * deterministic fixed-grid histogram sketches — integer grids for
    * recency (days since epoch: the value IS the bucket) and frequency
    * (order counts), the [[quantileGridCents]]-cent grid for monetary —
    * then each user scores against the broadcast 4-boundary arrays. No
    * global row_number sort anywhere: per metric, one bounded hash
    * aggregate (≤ value-range/grid buckets, map-side partials absorb the
    * corpus) and a cumulative pass over the bucket rows (the bounded-
    * driver-artifact size class). Approximate by design at BUCKET grain:
    * boundaries are bucket lower bounds and scores compare bucketized
    * values, so equal-bucket values always share a score where exact
    * ranks split ties (agreement vs the exact scorer is spec-tested).
    * Replaces the `percentile_approx` (Greenwald-Khanna) formulation:
    * integer bucket counts sum exactly on ANY partitioning, so this
    * scorer is partitioning-invariant and bit-reproduced by the DuckDB
    * oracle (the [[priceQuantilesApprox]] conversion applied to
    * segmentation; boundary rank convention `(k·(n+1)) div 5`).
    *
    * EAGER: the boundary collect runs the histogram job at CALL time (not
    * at the returned frame's first action), and the scoring pass re-reads
    * the input from source — callers timing the op should time the call,
    * and callers with non-deterministic inputs must checkpoint upstream
    * (the registered fixtures are deterministic parquet, where a second
    * scan is cheaper than holding a user-grain cache).
    */
  def rfmSegmentsApprox(orders: DataFrame, items: DataFrame,
      gridCents: Long = quantileGridCents): DataFrame = {
    val withB = rfmUsers(orders, items)
      .select(col("user_id"), col("last_order_date"), col("n_orders"),
        col("monetary"),
        datediff(col("last_order_date"), lit("1970-01-01").cast(DateType))
          .cast(LongType).as("r_b"),
        col("n_orders").as("f_b"),
        floor(col("monetary") * lit(100.0) / lit(gridCents.toDouble))
          .cast(LongType).as("m_b"))
    // All three histograms in ONE fused pass (explode to (metric, bucket)
    // rows, one hash aggregate — bucket counts are exact integers on any
    // partitioning), then the four boundary buckets per metric collect as a
    // BOUNDED driver artifact (3 metrics × 4 longs — the codebook size
    // class) and re-enter the scoring pass as literals. No user-grain
    // persist: the previous MEMORY_AND_DISK cache of withB had no matching
    // unpersist and leaked per invocation for direct library callers
    // (ADVICE r9); now withB is streamed twice (histogram, scoring) and the
    // op leaves no resident state behind.
    val hist = withB
      .select(explode(map(
        lit("r"), col("r_b"), lit("f"), col("f_b"), lit("m"), col("m_b")))
        .as(Seq("metric", "bucket")))
      .groupBy(col("metric"), col("bucket")).agg(count(lit(1)).as("cnt"))
    val byMetric = Window.partitionBy(col("metric"))
    val bq: Map[String, Seq[Option[Long]]] = hist
      .withColumn("cum", sum(col("cnt")).over(byMetric.orderBy(col("bucket"))))
      .withColumn("n", sum(col("cnt")).over(byMetric))
      .groupBy(col("metric"))
      .agg(array((1 to 4).map(k =>
        min(when(col("cum") >= expr(s"(n * $k + $k) div 5"), col("bucket")))): _*)
        .as("bq"))
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[Any](1).map(v => Option(v).map(_.asInstanceOf[Long])))
      .toMap
    // score = 1 + #boundary buckets strictly below the value's bucket
    // (a null boundary — n < 4 users — compares null and is filtered out,
    // the same semantics the crossJoin formulation had)
    def bounds(m: String) =
      typedLit(bq.getOrElse(m, Seq.fill[Option[Long]](4)(None)))
    def score(v: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      (lit(1) + size(filter(b, x => v > x))).cast(LongType)
    withB
      .select(col("user_id"), col("last_order_date"), col("n_orders"), col("monetary"),
        score(col("r_b"), bounds("r")).as("r_score"),
        score(col("f_b"), bounds("f")).as("f_score"),
        score(col("m_b"), bounds("m")).as("m_score"))
      .withColumn("rfm_code",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
  }

  /** Market-basket co-occurrence: product pairs bought together, with lift.
    *
    * Scale shape: ONE shuffle reduces order_items to per-order sorted
    * distinct product arrays; a second, single shuffle aggregates EVERYTHING
    * the lift formula needs at once — each basket emits a tagged union of
    * its (i < j) pairs, its single items, and one order-marker row, so pair
    * counts, per-product counts, and the order total come out of one hash
    * aggregate with no persist of the basket frame (at corpus scale a cached
    * basket frame re-read three times is recompute or spill; here it is
    * consumed exactly once). Pair replication is C(basket,2), bounded by
    * [[basketMaxItems]] (a degenerate mega-basket — a crawler account, a
    * data bug — would otherwise explode quadratically; dropping it is the
    * documented contract, same philosophy as the dedup family's blocking
    * caps). The self-join formulation the oracle uses would shuffle the item
    * table twice and hit the same skew wall un-capped. The count split and
    * the lift join touch only the count aggregate (vocabulary-sized), never
    * the fact table, and the final ranking sorts only the min-support
    * survivors. Lift = c12·N / (c1·c2) computed in exact integers with a
    * single IEEE division, so the DuckDB oracle matches bit-for-bit.
    */
  val basketMinSupport = 2
  val basketMaxItems = 100
  val basketK = 50

  /** Cohort-LTV triangle: users grouped by the month of their FIRST order;
    * per (cohort month, order month), the buyer count and exact revenue —
    * the lifetime-value matrix finance reads ([[graft.operators.EventOps
    * .retentionCohorts]] with revenue instead of activity). Two hash
    * aggregates and one equi-join on user_id; output is O(months²/2).
    */
  def cohortLtv(orders: DataFrame, orderItems: DataFrame): DataFrame = {
    val month = (c: org.apache.spark.sql.Column) => to_date(date_trunc("month", c))
    val cohorts = orders.groupBy(col("user_id"))
      .agg(min(month(col("created_at"))).as("cohort_month"))
    val orderRev = orderItems.groupBy(col("order_id"))
      .agg(dsum(col("sale_price")).as("rev"))
    orders.join(orderRev, Seq("order_id"))
      .select(col("user_id"), month(col("created_at")).as("order_month"), col("rev"))
      .join(cohorts, "user_id")
      .groupBy(col("cohort_month"), col("order_month"))
      .agg(countDistinct(col("user_id")).as("n_buyers"),
        dsum(col("rev")).as("revenue"))
  }

  /** Revenue concentration (Pareto/80-20) curve: products bucketed into
    * revenue-ranked deciles, each with its product count, exact revenue and
    * share — how head-heavy the catalog is. The fact table reduces to one
    * row per product first; the decile is NTILE(10) semantics (first n%10
    * buckets one row larger) derived arithmetically from the DISTRIBUTED
    * rank of [[withGlobalRowNumber]] — catalog-grain work with no
    * unpartitioned window even if the catalog grows to billions of SKUs.
    * Integer DIV keeps the bucket boundary exact where a double division's
    * floor could sit one ULP off; revenue sums are exact DECIMAL
    * re-aggregations of 4-decimal leaves, so decile totals are
    * order-independent.
    */
  /** Revenue Gini coefficient — the single-number concentration summary
    * beside [[revenuePareto]]'s decile curve:
    *   G = (2·Σ rank·y − (n+1)·Σy) / (n·Σy)
    * over per-product revenue truncated to whole currency units (BIGINT;
    * the truncation is the same IEEE double→long cast on both engines).
    * Ranks are ascending exact globals from [[withGlobalRowNumber]]; the
    * numerator and denominator are exact BIGINTs (< 2^53, so the one
    * final IEEE division is bit-identical cross-engine — the price-fence
    * precedent). G = 0 ⟺ uniform; → 1 as one product takes everything.
    */
  def revenueGini(orderItems: DataFrame): DataFrame = {
    val perProduct = orderItems.groupBy(col("product_id"))
      .agg(dsum(col("sale_price")).as("rev"))
      .select(col("product_id"), expr("CAST(FLOOR(rev) AS BIGINT)").as("y"))
    val (ranked, n) = withGlobalRowNumber(perProduct, "rn",
      Seq(col("y"), col("product_id")))
    ranked
      .agg(sum(expr("rn * y")).as("sry"), sum(col("y")).as("sy"))
      .select(lit(n).as("n_products"), col("sy").as("total_units"),
        (expr(s"CAST(2*sry - (${n}L + 1) * sy AS DOUBLE)") /
          expr(s"CAST(${n}L * sy AS DOUBLE)")).as("gini"))
  }

  def revenuePareto(orderItems: DataFrame): DataFrame = {
    val perProduct = orderItems.groupBy(col("product_id"))
      .agg(dsum(col("sale_price")).as("rev"))
    val (ranked, n) = withGlobalRowNumber(perProduct, "rn",
      Seq(col("rev").desc, col("product_id")))
    // NTILE(k): with q = n DIV k and r = n % k, buckets 1..r hold q+1 rows,
    // the rest q; rank rn ⇒ bucket by exact integer arithmetic
    val (q, r) = (n / 10, n % 10)
    val cut = r * (q + 1)
    val decile = expr(
      s"CAST(CASE WHEN rn <= $cut THEN (rn - 1) DIV ${q + 1} " +
        s"ELSE $r + (rn - 1 - $cut) DIV ${math.max(q, 1L)} END + 1 AS BIGINT)")
    val tiled = ranked.withColumn("decile", decile).drop("rn")
    val total = tiled.agg(dsum(col("rev")).as("total"))
    tiled.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_products"), dsum(col("rev")).as("revenue"))
      .crossJoin(broadcast(total))
      .select(col("decile"), col("n_products"), col("revenue"),
        (col("revenue") / col("total")).as("revenue_share"))
  }

  /** Price-bucket width and the period split for [[priceDrift]]. */
  val driftBucketWidth = 10000.0
  val driftSplitDate = "1998-01-01"

  /** Distribution drift between two order periods (the ML-ops population-
    * stability check run before retraining on a new data window): order
    * totals bucketed by [[driftBucketWidth]], per-bucket early/late shares,
    * and the χ²-style contribution ((p−q)²/(p+q)) per bucket — a log-free
    * PSI surrogate whose arithmetic is integer counts under a fixed chain of
    * IEEE operations, hence bit-identical across engines (ln(p/q) would
    * drift in the last ULP between libm implementations).
    *
    * Scale shape: one narrow bucket projection, one bucket-grain aggregate,
    * and a broadcast 1-row totals frame (the [[TextOps.collocations]]
    * pattern) — the fact table is scanned once and never joined to itself.
    */
  def priceDrift(orders: DataFrame): DataFrame = {
    val bucketed = orders.select(
      floor(col("o_totalprice") / lit(driftBucketWidth)).cast(LongType).as("bucket"),
      (col("o_orderdate") < lit(driftSplitDate).cast(TimestampType)).as("early"))
    val counts = bucketed.groupBy(col("bucket"))
      .agg(sum(when(col("early"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("early"), 1L).otherwise(0L)).as("n_b"))
    val totals = bucketed.agg(
      sum(when(col("early"), 1L).otherwise(0L)).as("t_a"),
      sum(when(!col("early"), 1L).otherwise(0L)).as("t_b"))
    counts.crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_a"), col("n_b"),
        (col("n_a").cast(DoubleType) / col("t_a")).as("p"),
        (col("n_b").cast(DoubleType) / col("t_b")).as("q"))
      .withColumn("contrib",
        ((col("p") - col("q")) * (col("p") - col("q"))) / (col("p") + col("q")))
  }

  /** Product-popularity histogram: products bucketed by floor(log2(order
    * count)) — the standard power-law profile of a catalog (how heavy is the
    * head, how long is the tail). Bucket = binary-digit-count − 1, exact
    * integer arithmetic on both engines (a float log2 would disagree at the
    * exact powers of two).
    *
    * Scale shape: one product-grain aggregate, then a histogram-sized one;
    * skew lands in `count(distinct)` partial aggregation, never a sort.
    */
  def popularityHistogram(orderItems: DataFrame): DataFrame =
    orderItems
      .groupBy(col("product_id"))
      .agg(countDistinct(col("order_id")).as("n_orders"))
      .withColumn("bucket", (length(conv(col("n_orders"), 10, 2)) - 1).cast(IntegerType))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_products"),
        sum(col("n_orders")).as("orders_mass"),
        min(col("n_orders")).as("min_orders"),
        max(col("n_orders")).as("max_orders"))

  /** KMV-sketch week-over-week audience overlap: per ISO week, the
    * approximate count of active users, and — via sketch ALGEBRA
    * (|A∩B| = |A| + |B| − |A∪B|, the union estimated from merged k-min
    * arrays, never from rows) — the approximate overlap with the FOLLOWING
    * week (each week a pairs with week a+7d; the `next_users_approx`
    * column carries that forward-looking semantics).
    *
    * This is what survives 100 TB where an exact self-join of week×users
    * would shuffle the user universe twice: sketches are ~1 KB per week,
    * mergeable map-side, and the join carries sketches, not users. r10:
    * HLL → KMV over [[Portable.hash60]] ([[graft.functions.Kmv]]) — union
    * is `k smallest of the concatenated arrays`, pure integer array
    * expressions both engines evaluate identically, so the whole overlap
    * algebra is hash-gated; the error bound vs the exact intersection
    * stays spec-tested.
    */
  def weeklyOverlapApprox(events: DataFrame, k: Int = Kmv.K): DataFrame = {
    val weekly = events
      // DATE, not the raw date_trunc TIMESTAMP: DuckDB's date_trunc('week')
      // return type changed across versions (TIMESTAMP→DATE), so both sides
      // pin DATE explicitly — the cohort-week convention in EventOps.
      .select(to_date(date_trunc("week", col("ts"))).as("week_start"),
        Portable.hash60(col("user_id").cast(StringType)).as("h"))
      .filter(col("h").isNotNull) // non-nullable UDAF input; see dailyUniquesApprox
      .groupBy(col("week_start"))
      .agg(Kmv.kminDistinct(k)(col("h")).as("sk"))
    weekly.alias("a")
      .join(weekly.alias("b"),
        col("b.week_start") === col("a.week_start") + expr("INTERVAL 7 DAYS"))
      .select(
        col("a.week_start").as("week_start"),
        col("a.sk").as("ska"), col("b.sk").as("skb"))
      .withColumn("sku", Kmv.mergeArrays(col("ska"), col("skb"), k))
      .select(
        col("week_start"),
        Kmv.estimate("ska", k).as("users_approx"),
        Kmv.estimate("skb", k).as("next_users_approx"),
        (Kmv.estimate("ska", k) + Kmv.estimate("skb", k) -
          Kmv.estimate("sku", k)).as("overlap_approx"))
  }

  def marketBasket(orderItems: DataFrame): DataFrame = {
    val pidType = orderItems.schema("product_id").dataType
    val pnull = lit(null).cast(pidType)
    val baskets = orderItems
      .groupBy(col("order_id"))
      .agg(array_sort(collect_set(col("product_id"))).as("items"))
      .filter(size(col("items")) <= basketMaxItems)
    // tagged union per basket: (null,null) marks the order, (x,null) each
    // item, (x,y) each sorted pair — one explode, one aggregate, all grains
    val counts = baskets
      .select(explode(concat(
        array(struct(pnull.as("p1"), pnull.as("p2"))),
        transform(col("items"), x => struct(x.as("p1"), pnull.as("p2"))),
        flatten(transform(col("items"), (x, i) =>
          transform(slice(col("items"), i + lit(2), size(col("items"))),
            y => struct(x.as("p1"), y.as("p2"))))))).as("t"))
      .groupBy(col("t.p1").as("p1"), col("t.p2").as("p2"))
      .agg(count(lit(1)).as("c"))
      .persist() // aggregate-sized (vocab + pruned pairs), read three ways
    val nOrders = counts.filter(col("p1").isNull && col("p2").isNull)
      .select(col("c").as("n_orders"))
    val prodCounts = counts.filter(col("p1").isNotNull && col("p2").isNull)
      .select(col("p1").as("product_id"), col("c"))
    val pairs = counts.filter(col("p2").isNotNull && col("c") >= basketMinSupport)
      .select(col("p1"), col("p2"), col("c").as("c12"))
    val out = pairs
      .join(prodCounts.withColumnRenamed("product_id", "p1").withColumnRenamed("c", "c1"), "p1")
      .join(prodCounts.withColumnRenamed("product_id", "p2").withColumnRenamed("c", "c2"), "p2")
      .crossJoin(broadcast(nOrders))
      .select(col("p1"), col("p2"), col("c12"), col("c1"), col("c2"),
        ((col("c12") * col("n_orders")).cast(DoubleType) / (col("c1") * col("c2")))
          .as("lift"))
      .orderBy(col("lift").desc, col("p1"), col("p2"))
      .limit(basketK)
    out
  }

  /** Directional association RULES from the same basket counts: for each
    * supported unordered pair, both `a→b` and `b→a` with
    * `conf_ppm = (c_both · 10^6) div c_antecedent` — the actual
    * recommendation artifact ("buyers of a also bought b, 62% of the
    * time"), where [[marketBasket]]'s symmetric lift only says the pair
    * co-occurs more than chance. Exact integers on the ppm grid; same
    * basket-cap / min-support bounds, same single tagged-union aggregate —
    * the rule emission is pair-grain work on the already-pruned pair set.
    */
  def basketRules(orderItems: DataFrame): DataFrame = {
    val pidType = orderItems.schema("product_id").dataType
    val pnull = lit(null).cast(pidType)
    val baskets = orderItems
      .groupBy(col("order_id"))
      .agg(array_sort(collect_set(col("product_id"))).as("items"))
      .filter(size(col("items")) <= basketMaxItems)
    val counts = baskets
      .select(explode(concat(
        transform(col("items"), x => struct(x.as("p1"), pnull.as("p2"))),
        flatten(transform(col("items"), (x, i) =>
          transform(slice(col("items"), i + lit(2), size(col("items"))),
            y => struct(x.as("p1"), y.as("p2"))))))).as("t"))
      .groupBy(col("t.p1").as("p1"), col("t.p2").as("p2"))
      .agg(count(lit(1)).as("c"))
      .persist()
    val prodCounts = counts.filter(col("p2").isNull)
      .select(col("p1").as("antecedent"), col("c").as("c_ant"))
    val pairs = counts.filter(col("p2").isNotNull && col("c") >= basketMinSupport)
    val directed = pairs
      .select(col("p1").as("antecedent"), col("p2").as("consequent"), col("c").as("c_both"))
      .unionByName(pairs
        .select(col("p2").as("antecedent"), col("p1").as("consequent"), col("c").as("c_both")))
    directed.join(prodCounts, "antecedent")
      .select(col("antecedent"), col("consequent"), col("c_both"), col("c_ant"),
        expr("(c_both * 1000000) div c_ant").as("conf_ppm"))
      .orderBy(col("conf_ppm").desc, col("antecedent"), col("consequent"))
      .limit(basketK)
  }

  // --------------------------------------------------------------------------
  // Registered ops + DuckDB oracles
  // --------------------------------------------------------------------------

  def ops: Seq[Op] = Seq(
    Op.sql("analytics_category_rollup",
      s"""${Tables.domainCtes},
         |c AS (
         |  SELECT p.category, CAST(o.created_at AS DATE) AS order_date, i.sale_price
         |  FROM order_items i
         |  LEFT JOIN products p ON i.product_id = p.id
         |  LEFT JOIN orders_v o ON i.order_id = o.order_id)
         |SELECT category, order_date, ${dsumSql("sale_price")} AS revenue,
         |       COUNT(*) AS n_items
         |FROM c GROUP BY ROLLUP (category, order_date)""".stripMargin) { (s, d) =>
      categoryRollup(Kpi.consolidatedOf(s, d))
    },

    Op.sql("analytics_category_cube",
      s"""${Tables.domainCtes},
         |c AS (
         |  SELECT p.category, CAST(o.created_at AS DATE) AS order_date, i.sale_price
         |  FROM order_items i
         |  LEFT JOIN products p ON i.product_id = p.id
         |  LEFT JOIN orders_v o ON i.order_id = o.order_id)
         |SELECT category, order_date, ${dsumSql("sale_price")} AS revenue,
         |       COUNT(*) AS n_items
         |FROM c GROUP BY CUBE (category, order_date)""".stripMargin) { (s, d) =>
      categoryCube(Kpi.consolidatedOf(s, d))
    },

    Op.sql("analytics_order_gaps",
      s"""${Tables.domainCtes}
         |SELECT order_id, user_id, created_at, prev_created_at,
         |       date_diff('day', CAST(prev_created_at AS DATE),
         |                 CAST(created_at AS DATE)) AS gap_days
         |FROM (SELECT o.order_id, o.user_id, o.created_at,
         |        LAG(o.created_at) OVER (PARTITION BY o.user_id
         |          ORDER BY o.created_at, o.order_id) AS prev_created_at
         |      FROM orders_v o)""".stripMargin) { (s, d) =>
      orderGaps(Tables.ordersDomain(s, d))
    },

    Op.sql("analytics_category_trends",
      s"""${Tables.domainCtes},
         |c AS (
         |  SELECT p.category, CAST(o.created_at AS DATE) AS order_date, i.sale_price
         |  FROM order_items i
         |  LEFT JOIN products p ON i.product_id = p.id
         |  LEFT JOIN orders_v o ON i.order_id = o.order_id),
         |daily AS (
         |  SELECT category, order_date, ${dsumSql("sale_price")} AS revenue
         |  FROM c GROUP BY category, order_date)
         |SELECT category, order_date, revenue,
         |  RANK() OVER (PARTITION BY order_date ORDER BY revenue DESC, category) AS rank_in_date,
         |  CAST(SUM(CAST(revenue AS DECIMAL(18,4))) OVER w7 AS DOUBLE) / COUNT(*) OVER w7 AS trailing7_avg
         |FROM daily
         |WINDOW w7 AS (PARTITION BY category ORDER BY order_date
         |              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin) { (s, d) =>
      categoryTrends(Kpi.consolidatedOf(s, d))
    },

    // Pivot to wide format: per-user event counts, one column per known
    // event type (the oracle's conditional-count formulation is exactly what
    // Catalyst rewrites pivot into).
    Op.sql("analytics_user_event_pivot", {
      val cols = eventTypes.map(t => s"COUNT(CASE WHEN event_type = '$t' THEN 1 END) AS $t")
      s"""SELECT user_id, ${cols.mkString(", ")}
         |FROM events GROUP BY user_id""".stripMargin
    }) { (s, d) => userEventPivot(Tables.events(s, d)) },

    // Hash-gated since r10 (previously rows-only over approx_count_distinct
    // = HLL++, whose estimates no other engine reproduces): the KMV
    // formulation is deterministic integer arithmetic, so the oracle
    // replays the IDENTICAL sketch and estimate. Estimator branch exercised
    // at gate scale (fixture days hold > K distinct customers).
    Op.sql("analytics_daily_uniques_approx",
      s"""${Tables.domainCtes},
         |b AS (SELECT CAST(created_at AS DATE) AS order_date,
         |             ${graft.functions.Portable.hash60Sql("CAST(order_id AS VARCHAR)")} AS ho,
         |             ${graft.functions.Portable.hash60Sql("CAST(user_id AS VARCHAR)")} AS hu
         |      FROM orders_v
         |      WHERE order_id IS NOT NULL AND user_id IS NOT NULL),
         |ro AS (SELECT order_date, ho,
         |              ROW_NUMBER() OVER (PARTITION BY order_date ORDER BY ho) AS rn
         |       FROM (SELECT DISTINCT order_date, ho FROM b)),
         |eo AS (SELECT order_date, COUNT(*) AS dk, MAX(ho) AS vk
         |       FROM ro WHERE rn <= ${Kmv.K} GROUP BY order_date),
         |ru AS (SELECT order_date, hu,
         |              ROW_NUMBER() OVER (PARTITION BY order_date ORDER BY hu) AS rn
         |       FROM (SELECT DISTINCT order_date, hu FROM b)),
         |eu AS (SELECT order_date, COUNT(*) AS dk, MAX(hu) AS vk
         |       FROM ru WHERE rn <= ${Kmv.K} GROUP BY order_date)
         |SELECT eo.order_date,
         |       ${Kmv.estimateSql("eo.dk", "eo.vk")} AS total_orders_approx,
         |       ${Kmv.estimateSql("eu.dk", "eu.vk")} AS unique_customers_approx
         |FROM eo JOIN eu USING (order_date)""".stripMargin) { (s, d) =>
      dailyUniquesApprox(Tables.ordersDomain(s, d))
    },

    Op.sql("analytics_price_quantiles",
      s"""${Tables.domainCtes},
         |c AS (
         |  SELECT p.category, i.sale_price
         |  FROM order_items i LEFT JOIN products p ON i.product_id = p.id),
         |r AS (
         |  SELECT category, sale_price,
         |         ROW_NUMBER() OVER (PARTITION BY category ORDER BY sale_price) AS rn,
         |         COUNT(*) OVER (PARTITION BY category) AS n
         |  FROM c WHERE sale_price IS NOT NULL)
         |SELECT category, MAX(n) AS n_items,
         |  MAX(CASE WHEN rn = FLOOR((n + 1) / 2) THEN sale_price END) AS p50,
         |  MAX(CASE WHEN rn = FLOOR((9*n + 9) / 10) THEN sale_price END) AS p90,
         |  MAX(CASE WHEN rn = FLOOR((99*n + 99) / 100) THEN sale_price END) AS p99
         |FROM r GROUP BY category""".stripMargin) { (s, d) =>
      priceQuantiles(Kpi.consolidatedOf(s, d))
    },

    // Long-form (metric, value) export of the daily KPI table via Spark's
    // native UNPIVOT — the shape metric stores and plotting layers ingest.
    // All metrics cast to double (counts are exact in double range).
    Op.sql("analytics_kpi_unpivot",
      s"""WITH k AS (${Kpi.orderKpiSql("")})
         |SELECT date_key, metric, value FROM (
         |  SELECT date_key, 'total_orders' AS metric, CAST(total_orders AS DOUBLE) AS value FROM k
         |  UNION ALL SELECT date_key, 'total_revenue', CAST(total_revenue AS DOUBLE) FROM k
         |  UNION ALL SELECT date_key, 'return_rate', CAST(return_rate AS DOUBLE) FROM k
         |  UNION ALL SELECT date_key, 'unique_customers', CAST(unique_customers AS DOUBLE) FROM k
         |  UNION ALL SELECT date_key, 'total_items_sold', CAST(total_items_sold AS DOUBLE) FROM k)""".stripMargin) { (s, d) =>
      val daily = Kpi.orderKpis(Tables.ordersDomain(s, d), Tables.orderItems(s, d))
      val metrics = Seq("total_orders", "total_revenue", "return_rate",
        "unique_customers", "total_items_sold")
      daily.select(col("date_key") +: metrics.map(m => col(m).cast("double").as(m)): _*)
        .unpivot(Array(col("date_key")), metrics.map(col).toArray, "metric", "value")
    },

    // Monthly new-vs-returning split with ppm repeat share.
    Op.sql("analytics_repeat_purchase",
      s"""${Tables.domainCtes},
         |um AS (SELECT DISTINCT user_id,
         |              CAST(date_trunc('month', created_at) AS DATE) AS m
         |       FROM orders_v),
         |f AS (SELECT user_id, MIN(m) AS fm FROM um GROUP BY user_id)
         |SELECT um.m AS month, CAST(COUNT(*) AS BIGINT) AS active_users,
         |       CAST(SUM(CASE WHEN um.m > f.fm THEN 1 ELSE 0 END) AS BIGINT) AS repeat_users,
         |       CAST((CAST(SUM(CASE WHEN um.m > f.fm THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
         |            // COUNT(*) AS BIGINT) AS repeat_ppm
         |FROM um JOIN f USING (user_id)
         |GROUP BY um.m""".stripMargin) { (s, d) =>
      repeatPurchaseRate(Tables.ordersDomain(s, d))
    },

    // Month-over-month tier migration matrix with explicit churn/activation.
    Op.sql("analytics_segment_transitions",
      s"""${Tables.domainCtes},
         |om AS (SELECT user_id, CAST(date_trunc('month', created_at) AS DATE) AS m,
         |              CAST(COUNT(*) AS BIGINT) AS n
         |       FROM orders_v GROUP BY 1, 2),
         |um AS (SELECT user_id, m,
         |              CASE WHEN n = 1 THEN 'one'
         |                   WHEN n <= 3 THEN 'few' ELSE 'many' END AS tier
         |       FROM om),
         |bounds AS (SELECT MIN(m) AS mn, MAX(m) AS mx FROM um),
         |a AS (SELECT user_id, m, tier AS from_tier FROM um),
         |b AS (SELECT user_id, CAST(m - INTERVAL 1 MONTH AS DATE) AS m,
         |             tier AS to_tier FROM um),
         |t AS (SELECT COALESCE(a.user_id, b.user_id) AS user_id,
         |             COALESCE(a.m, b.m) AS m, a.from_tier, b.to_tier
         |      FROM a FULL OUTER JOIN b ON b.user_id = a.user_id AND b.m = a.m)
         |SELECT t.m AS month_from,
         |       COALESCE(from_tier, 'none') AS from_tier,
         |       COALESCE(to_tier, 'none') AS to_tier,
         |       CAST(COUNT(*) AS BIGINT) AS n_users
         |FROM t CROSS JOIN bounds
         |WHERE t.m >= bounds.mn AND t.m <= CAST(bounds.mx - INTERVAL 1 MONTH AS DATE)
         |GROUP BY 1, 2, 3""".stripMargin) { (s, d) =>
      segmentTransitions(Tables.ordersDomain(s, d))
    },

    // Revenue Gini: single-number concentration beside the Pareto curve.
    Op.sql("analytics_revenue_gini",
      s"""${Tables.domainCtes},
         |pp AS (SELECT product_id, CAST(FLOOR(${dsumSql("sale_price")}) AS BIGINT) AS y
         |       FROM order_items GROUP BY product_id),
         |r AS (SELECT y, ROW_NUMBER() OVER (ORDER BY y, product_id) AS rn FROM pp),
         |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |             CAST(SUM(rn * y) AS BIGINT) AS sry,
         |             CAST(SUM(y) AS BIGINT) AS sy
         |      FROM r)
         |SELECT n AS n_products, sy AS total_units,
         |       CAST(2*sry - (n + 1)*sy AS DOUBLE) / CAST(n*sy AS DOUBLE) AS gini
         |FROM s""".stripMargin) { (s, d) =>
      revenueGini(Tables.orderItems(s, d))
    },

    // Basket-size histogram: orders per item count — the carrier of every
    // per-order cost model (and the distribution the co-purchase cap
    // truncates; its tail justifies basketMaxItems).
    Op.sql("analytics_order_size_hist",
      s"""${Tables.domainCtes},
         |os AS (SELECT order_id, CAST(COUNT(*) AS BIGINT) AS n_items
         |       FROM order_items GROUP BY 1)
         |SELECT n_items, CAST(COUNT(*) AS BIGINT) AS n_orders
         |FROM os GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.orderItems(s, d)
        .groupBy(col("order_id")).agg(count(lit(1)).as("n_items"))
        .groupBy(col("n_items")).agg(count(lit(1)).as("n_orders"))
    },

    // Sale-gap audit per product: longest/mean zero-sale run in days.
    Op.sql("analytics_sale_gaps",
      s"""${Tables.domainCtes},
         |daily AS (SELECT DISTINCT product_id, CAST(created_at AS DATE) AS day
         |          FROM order_items),
         |g AS (
         |  SELECT product_id,
         |         CAST(DATE_DIFF('day', LAG(day) OVER (PARTITION BY product_id
         |                                              ORDER BY day), day)
         |              AS BIGINT) - 1 AS gap
         |  FROM daily)
         |SELECT product_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
         |       CAST(MAX(gap) AS BIGINT) AS max_gap_days,
         |       CAST(SUM(gap) AS BIGINT) AS total_gap_days,
         |       CAST(SUM(gap) * 1000 AS BIGINT) // CAST(COUNT(*) AS BIGINT)
         |         AS mean_gap_milli
         |FROM g WHERE gap IS NOT NULL GROUP BY product_id""".stripMargin) { (s, d) =>
      saleGaps(Tables.orderItems(s, d))
    },

    // Exact least-squares demand slope per product (milli-units/day).
    Op.sql("analytics_trend_slope",
      s"""${Tables.domainCtes},
         |daily AS (
         |  SELECT product_id,
         |         CAST(DATE_DIFF('day', DATE '1992-01-01',
         |                        CAST(created_at AS DATE)) AS BIGINT) AS x,
         |         CAST(COUNT(*) AS BIGINT) AS y
         |  FROM order_items GROUP BY 1, 2),
         |s AS (
         |  SELECT product_id, CAST(COUNT(*) AS BIGINT) AS n,
         |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |         CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*x) AS BIGINT) AS sxx
         |  FROM daily GROUP BY 1)
         |SELECT product_id, n AS n_days,
         |       (1000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx) AS slope_milli
         |FROM s WHERE n * sxx - sx * sx <> 0""".stripMargin) { (s, d) =>
      trendSlope(Tables.orderItems(s, d))
    },

    // Tukey-fence price outliers per category (exact ranks + IEEE fences).
    Op.sql("analytics_price_outliers",
      s"""${Tables.domainCtes},
         |c AS (
         |  SELECT p.category, i.sale_price
         |  FROM order_items i LEFT JOIN products p ON i.product_id = p.id
         |  WHERE i.sale_price IS NOT NULL),
         |r AS (
         |  SELECT category, sale_price,
         |         ROW_NUMBER() OVER (PARTITION BY category ORDER BY sale_price) AS rn,
         |         COUNT(*) OVER (PARTITION BY category) AS n
         |  FROM c),
         |f0 AS (
         |  SELECT category, CAST(MAX(n) AS BIGINT) AS n_items,
         |    MAX(CASE WHEN rn = FLOOR((n + 1) / 4) THEN sale_price END) AS q1,
         |    MAX(CASE WHEN rn = FLOOR((3*n + 3) / 4) THEN sale_price END) AS q3
         |  FROM r GROUP BY category),
         |f AS (
         |  SELECT *, q1 - (q3 - q1) * 1.5 AS lo, q3 + (q3 - q1) * 1.5 AS hi
         |  FROM f0)
         |SELECT c.category, MAX(f.n_items) AS n_items,
         |       MAX(f.q1) AS q1, MAX(f.q3) AS q3, MAX(f.lo) AS lo, MAX(f.hi) AS hi,
         |       CAST(SUM(CASE WHEN c.sale_price < f.lo OR c.sale_price > f.hi
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         |FROM c JOIN f USING (category)
         |GROUP BY c.category""".stripMargin) { (s, d) =>
      priceOutliers(Kpi.consolidatedOf(s, d))
    },

    // The approximate path is a deterministic fixed-grid histogram sketch
    // (not Greenwald-Khanna), so unlike the HLL/GK ops it IS bit-matched:
    // the grid arithmetic reproduces exactly in DuckDB, and the <grid/100
    // absolute error vs the exact twin is additionally spec-pinned.
    Op.sql("analytics_price_quantiles_approx",
      s"""${Tables.domainCtes},
         |c AS (
         |  SELECT p.category, i.sale_price
         |  FROM order_items i LEFT JOIN products p ON i.product_id = p.id),
         |hb AS (
         |  SELECT category,
         |         CAST(FLOOR(sale_price * 100.0 / $quantileGridCents.0) AS BIGINT) AS bucket,
         |         CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM c WHERE sale_price IS NOT NULL GROUP BY 1, 2),
         |cum AS (
         |  SELECT category, bucket,
         |         SUM(cnt) OVER (PARTITION BY category ORDER BY bucket) AS cum,
         |         SUM(cnt) OVER (PARTITION BY category) AS n
         |  FROM hb)
         |SELECT category, CAST(MAX(n) AS BIGINT) AS n_items,
         |  CAST(MIN(CASE WHEN cum >= (n * 1 + 1) // 2 THEN bucket END) * $quantileGridCents AS DOUBLE) / 100.0 AS p50,
         |  CAST(MIN(CASE WHEN cum >= (n * 9 + 9) // 10 THEN bucket END) * $quantileGridCents AS DOUBLE) / 100.0 AS p90,
         |  CAST(MIN(CASE WHEN cum >= (n * 99 + 99) // 100 THEN bucket END) * $quantileGridCents AS DOUBLE) / 100.0 AS p99
         |FROM cum GROUP BY category""".stripMargin) { (s, d) =>
      priceQuantilesApprox(Kpi.consolidatedOf(s, d))
    },

    // Bit-matched since the histogram-sketch conversion: boundaries come
    // from deterministic fixed-grid histograms (day / order-count /
    // 25-cent grids) both engines reproduce exactly; agreement with the
    // exact rank-based scorer remains spec-tested (≥95% on near-unique
    // dimensions; tie-group span containment on frequency).
    Op.sql("analytics_rfm_segments_approx",
      s"""${Tables.domainCtes},
         |rev AS (SELECT order_id, ${dsumSql("sale_price")} AS order_revenue
         |        FROM order_items GROUP BY order_id),
         |u AS (
         |  SELECT o.user_id, MAX(CAST(o.created_at AS DATE)) AS last_order_date,
         |         COUNT(*) AS n_orders,
         |         ${dsumSql("COALESCE(rev.order_revenue, 0)")} AS monetary
         |  FROM orders_v o LEFT JOIN rev USING (order_id)
         |  GROUP BY o.user_id),
         |ub AS (
         |  SELECT user_id, last_order_date, CAST(n_orders AS BIGINT) AS n_orders,
         |         monetary,
         |         CAST(DATEDIFF('day', DATE '1970-01-01', last_order_date) AS BIGINT) AS r_b,
         |         CAST(n_orders AS BIGINT) AS f_b,
         |         CAST(FLOOR(monetary * 100.0 / $quantileGridCents.0) AS BIGINT) AS m_b
         |  FROM u),
         |rc AS (SELECT bucket, SUM(cnt) OVER (ORDER BY bucket) AS cum, SUM(cnt) OVER () AS n
         |       FROM (SELECT r_b AS bucket, COUNT(*) AS cnt FROM ub GROUP BY 1)),
         |rq AS (SELECT [MIN(CASE WHEN cum >= (n*1+1)//5 THEN bucket END),
         |               MIN(CASE WHEN cum >= (n*2+2)//5 THEN bucket END),
         |               MIN(CASE WHEN cum >= (n*3+3)//5 THEN bucket END),
         |               MIN(CASE WHEN cum >= (n*4+4)//5 THEN bucket END)] AS q FROM rc),
         |fc AS (SELECT bucket, SUM(cnt) OVER (ORDER BY bucket) AS cum, SUM(cnt) OVER () AS n
         |       FROM (SELECT f_b AS bucket, COUNT(*) AS cnt FROM ub GROUP BY 1)),
         |fq AS (SELECT [MIN(CASE WHEN cum >= (n*1+1)//5 THEN bucket END),
         |               MIN(CASE WHEN cum >= (n*2+2)//5 THEN bucket END),
         |               MIN(CASE WHEN cum >= (n*3+3)//5 THEN bucket END),
         |               MIN(CASE WHEN cum >= (n*4+4)//5 THEN bucket END)] AS q FROM fc),
         |mc AS (SELECT bucket, SUM(cnt) OVER (ORDER BY bucket) AS cum, SUM(cnt) OVER () AS n
         |       FROM (SELECT m_b AS bucket, COUNT(*) AS cnt FROM ub GROUP BY 1)),
         |mq AS (SELECT [MIN(CASE WHEN cum >= (n*1+1)//5 THEN bucket END),
         |               MIN(CASE WHEN cum >= (n*2+2)//5 THEN bucket END),
         |               MIN(CASE WHEN cum >= (n*3+3)//5 THEN bucket END),
         |               MIN(CASE WHEN cum >= (n*4+4)//5 THEN bucket END)] AS q FROM mc),
         |s AS (
         |  SELECT ub.user_id, ub.last_order_date, ub.n_orders, ub.monetary,
         |    CAST(1 + len(list_filter(rq.q, x -> ub.r_b > x)) AS BIGINT) AS r_score,
         |    CAST(1 + len(list_filter(fq.q, x -> ub.f_b > x)) AS BIGINT) AS f_score,
         |    CAST(1 + len(list_filter(mq.q, x -> ub.m_b > x)) AS BIGINT) AS m_score
         |  FROM ub CROSS JOIN rq CROSS JOIN fq CROSS JOIN mq)
         |SELECT *, r_score * 100 + f_score * 10 + m_score AS rfm_code
         |FROM s""".stripMargin) { (s, d) =>
      rfmSegmentsApprox(Tables.ordersDomain(s, d), Tables.orderItems(s, d))
    },

    Op.sql("analytics_cohort_ltv",
      s"""${Tables.domainCtes},
         |c AS (SELECT user_id, CAST(date_trunc('month', MIN(created_at)) AS DATE) AS cohort_month
         |      FROM orders_v GROUP BY 1),
         |r AS (SELECT order_id, ${dsumSql("sale_price")} AS rev
         |      FROM order_items GROUP BY 1)
         |SELECT c.cohort_month, CAST(date_trunc('month', o.created_at) AS DATE) AS order_month,
         |       COUNT(DISTINCT o.user_id) AS n_buyers, ${dsumSql("rev")} AS revenue
         |FROM orders_v o JOIN r USING (order_id) JOIN c ON c.user_id = o.user_id
         |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      cohortLtv(Tables.ordersDomain(s, d), Tables.orderItems(s, d))
    },

    Op.sql("analytics_revenue_pareto",
      s"""${Tables.domainCtes},
         |pp AS (SELECT product_id, ${dsumSql("sale_price")} AS rev
         |       FROM order_items GROUP BY 1),
         |tl AS (SELECT *, CAST(NTILE(10) OVER (ORDER BY rev DESC, product_id) AS BIGINT) AS decile
         |       FROM pp),
         |t AS (SELECT ${dsumSql("rev")} AS total FROM tl),
         |d AS (SELECT decile, COUNT(*) AS n_products, ${dsumSql("rev")} AS revenue
         |      FROM tl GROUP BY 1)
         |SELECT decile, n_products, revenue, revenue / total AS revenue_share
         |FROM d CROSS JOIN t""".stripMargin) { (s, d) =>
      revenuePareto(Tables.orderItems(s, d))
    },

    Op.sql("analytics_price_drift",
      s"""WITH b AS (
         |  SELECT CAST(FLOOR(o_totalprice / $driftBucketWidth) AS BIGINT) AS bucket,
         |         o_orderdate < TIMESTAMP '$driftSplitDate' AS early
         |  FROM orders),
         |c AS (SELECT bucket,
         |        CAST(SUM(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |        CAST(SUM(CASE WHEN NOT early THEN 1 ELSE 0 END) AS BIGINT) AS n_b
         |      FROM b GROUP BY bucket),
         |t AS (SELECT CAST(SUM(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT) AS t_a,
         |             CAST(SUM(CASE WHEN NOT early THEN 1 ELSE 0 END) AS BIGINT) AS t_b
         |      FROM b),
         |pq AS (
         |  SELECT bucket, n_a, n_b,
         |         CAST(n_a AS DOUBLE) / t_a AS p, CAST(n_b AS DOUBLE) / t_b AS q
         |  FROM c CROSS JOIN t)
         |SELECT bucket, n_a, n_b, p, q, ((p - q) * (p - q)) / (p + q) AS contrib
         |FROM pq""".stripMargin) { (s, d) =>
      priceDrift(Tables.orders(s, d))
    },

    Op.sql("analytics_popularity_histogram",
      s"""${Tables.domainCtes},
         |pc AS (SELECT product_id, COUNT(DISTINCT order_id) AS n_orders
         |       FROM order_items GROUP BY 1)
         |SELECT CAST(length(bin(n_orders)) - 1 AS INTEGER) AS bucket,
         |       COUNT(*) AS n_products, CAST(SUM(n_orders) AS BIGINT) AS orders_mass,
         |       MIN(n_orders) AS min_orders, MAX(n_orders) AS max_orders
         |FROM pc GROUP BY 1""".stripMargin) { (s, d) =>
      popularityHistogram(Tables.orderItems(s, d))
    },

    // Hash-gated since r10 (previously rows-only over HLL union algebra):
    // the whole KMV overlap algebra — per-week k-min, array union, the
    // |A|+|B|−|A∪B| estimate — is integer arithmetic both engines evaluate
    // identically. Error bound vs exact intersections stays spec-tested.
    Op.sql("analytics_weekly_overlap_approx",
      s"""WITH b AS (SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
         |                  ${graft.functions.Portable.hash60Sql("CAST(user_id AS VARCHAR)")} AS h
         |           FROM events WHERE user_id IS NOT NULL),
         |r AS (SELECT week_start, h,
         |             ROW_NUMBER() OVER (PARTITION BY week_start ORDER BY h) AS rn
         |      FROM (SELECT DISTINCT week_start, h FROM b)),
         |sk AS (SELECT week_start, list(h ORDER BY h) AS sk
         |       FROM r WHERE rn <= ${Kmv.K} GROUP BY week_start),
         |j AS (SELECT a.week_start, a.sk AS ska, b.sk AS skb,
         |             ${Kmv.mergeArraysSql("a.sk", "b.sk")} AS sku
         |      FROM sk a JOIN sk b ON b.week_start = a.week_start + INTERVAL 7 DAY)
         |SELECT week_start,
         |       ${Kmv.estimateListSql("ska")} AS users_approx,
         |       ${Kmv.estimateListSql("skb")} AS next_users_approx,
         |       ${Kmv.estimateListSql("ska")} + ${Kmv.estimateListSql("skb")}
         |         - ${Kmv.estimateListSql("sku")} AS overlap_approx
         |FROM j""".stripMargin) { (s, d) =>
      weeklyOverlapApprox(Tables.events(s, d))
    },

    Op.sql("analytics_market_basket",
      s"""${Tables.domainCtes},
         |oi AS (SELECT DISTINCT order_id, product_id FROM order_items),
         |baskets AS (SELECT order_id FROM oi GROUP BY order_id
         |            HAVING COUNT(*) <= $basketMaxItems),
         |oik AS (SELECT oi.* FROM oi JOIN baskets USING (order_id)),
         |n AS (SELECT COUNT(DISTINCT order_id) AS n_orders FROM oik),
         |c AS (SELECT product_id, COUNT(*) AS c FROM oik GROUP BY product_id),
         |p AS (
         |  SELECT a.product_id AS p1, b.product_id AS p2, COUNT(*) AS c12
         |  FROM oik a JOIN oik b
         |    ON a.order_id = b.order_id AND a.product_id < b.product_id
         |  GROUP BY 1, 2 HAVING COUNT(*) >= $basketMinSupport)
         |SELECT p1, p2, c12, c1.c AS c1, c2.c AS c2,
         |       CAST(c12 * n_orders AS DOUBLE) / (c1.c * c2.c) AS lift
         |FROM p JOIN c c1 ON p1 = c1.product_id
         |       JOIN c c2 ON p2 = c2.product_id
         |       CROSS JOIN n
         |ORDER BY lift DESC, p1, p2 LIMIT $basketK""".stripMargin) { (s, d) =>
      marketBasket(Tables.orderItems(s, d))
    },

    // Directional association rules from the same basket counts: a→b and
    // b→a with exact ppm confidence (the recommendation artifact).
    Op.sql("analytics_basket_rules",
      s"""${Tables.domainCtes},
         |oi AS (SELECT DISTINCT order_id, product_id FROM order_items),
         |baskets AS (SELECT order_id FROM oi GROUP BY order_id
         |            HAVING COUNT(*) <= $basketMaxItems),
         |oik AS (SELECT oi.* FROM oi JOIN baskets USING (order_id)),
         |c AS (SELECT product_id, COUNT(*) AS c FROM oik GROUP BY product_id),
         |p AS (
         |  SELECT a.product_id AS p1, b.product_id AS p2, COUNT(*) AS c12
         |  FROM oik a JOIN oik b
         |    ON a.order_id = b.order_id AND a.product_id < b.product_id
         |  GROUP BY 1, 2 HAVING COUNT(*) >= $basketMinSupport),
         |r AS (SELECT p1 AS antecedent, p2 AS consequent, c12 FROM p
         |      UNION ALL
         |      SELECT p2, p1, c12 FROM p)
         |SELECT r.antecedent, r.consequent, CAST(r.c12 AS BIGINT) AS c_both,
         |       CAST(c.c AS BIGINT) AS c_ant,
         |       CAST((r.c12 * 1000000) // c.c AS BIGINT) AS conf_ppm
         |FROM r JOIN c ON r.antecedent = c.product_id
         |ORDER BY conf_ppm DESC, antecedent, consequent
         |LIMIT $basketK""".stripMargin) { (s, d) =>
      basketRules(Tables.orderItems(s, d))
    },

    Op.sql("analytics_rfm_segments",
      s"""${Tables.domainCtes},
         |rev AS (SELECT order_id, ${dsumSql("sale_price")} AS order_revenue
         |        FROM order_items GROUP BY order_id),
         |u AS (
         |  SELECT o.user_id, MAX(CAST(o.created_at AS DATE)) AS last_order_date,
         |         COUNT(*) AS n_orders,
         |         ${dsumSql("COALESCE(rev.order_revenue, 0)")} AS monetary
         |  FROM orders_v o LEFT JOIN rev USING (order_id)
         |  GROUP BY o.user_id),
         |r AS (
         |  SELECT *,
         |    ROW_NUMBER() OVER (ORDER BY last_order_date, user_id) AS rn_r,
         |    ROW_NUMBER() OVER (ORDER BY n_orders, user_id) AS rn_f,
         |    ROW_NUMBER() OVER (ORDER BY monetary, user_id) AS rn_m,
         |    COUNT(*) OVER () AS n
         |  FROM u),
         |s AS (
         |  SELECT user_id, last_order_date, n_orders, monetary,
         |    1 + CAST(FLOOR((5 * (rn_r - 1)) / n) AS BIGINT) AS r_score,
         |    1 + CAST(FLOOR((5 * (rn_f - 1)) / n) AS BIGINT) AS f_score,
         |    1 + CAST(FLOOR((5 * (rn_m - 1)) / n) AS BIGINT) AS m_score
         |  FROM r)
         |SELECT user_id, last_order_date, n_orders, monetary,
         |       r_score, f_score, m_score,
         |       r_score * 100 + f_score * 10 + m_score AS rfm_code
         |FROM s""".stripMargin) { (s, d) =>
      rfmSegments(Tables.ordersDomain(s, d), Tables.orderItems(s, d))
    },
  )

  val eventTypes: Seq[String] = Seq("click", "view", "purchase", "signup", "error")

  /** Wide per-user activity matrix via pivot (explicit value list keeps the
    * schema static — no extra distinct-values job, mandatory at scale).
    */
  def userEventPivot(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .pivot("event_type", eventTypes)
      .count()
      .na.fill(0, eventTypes)
}
