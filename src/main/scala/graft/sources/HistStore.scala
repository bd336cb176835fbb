package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted daily value-HISTOGRAM store: one bounded integer histogram of
  * the day's event values per calendar day, written as `day=`-partitioned
  * parquet — the quantile twin of [[SketchStore]] (uniques). Together they
  * make "p50/p99 of any date range" and "uniques of any date range" both
  * O(days × sketch), never O(events).
  *
  * Representation: fixed grid of [[HistStore.histBuckets]] buckets of width
  * 1/[[HistStore.histScale]], `bucket = clamp(floor(value · scale))`. The
  * scale is a POWER OF TWO, so `value · 2.0` and `bucket / 2.0` are exact
  * IEEE-754 operations — the same double in any engine lands in the same
  * bucket, which is what lets the DuckDB oracle replay range quantiles
  * bit-for-bit (the portability recipe of the KMV/Bloom conversions,
  * PERF.md r10-r11). A histogram merge is a counter sum — commutative,
  * associative, partitioning-invariant — and a day's histogram is ≤
  * `histBuckets` rows regardless of event volume, so every range read is
  * bounded work.
  *
  * Accuracy contract: a quantile answer is the LOWER EDGE of the first
  * bucket whose cumulative count reaches the target rank — error ≤ one
  * bucket width (0.5 value units), deterministic, never probabilistic.
  * Values ≥ buckets/scale clamp into the top bucket (the fixture's domain
  * sits well inside the grid; a production deployment sizes the grid from
  * the value contract the way K sizes the KMV sketch).
  *
  * Ingest contract = [[FactStore]]/[[SketchStore]]: a day's events arrive
  * complete; [[HistStore.upsertDaily]] recomputes arriving days via dynamic
  * partition overwrite — re-delivery replaces, never double-counts.
  */
object HistStore {

  /** Baked into the fixture dir name; bump on schema/logic change. */
  val Version = "v1"

  /** Buckets per histogram (hard bound on any day row-count and any read). */
  val histBuckets = 1024L

  /** Buckets per value unit — a power of two so the grid is IEEE-exact. */
  val histScale = 2.0

  /** Requested range quantiles, in ppm of the value count. */
  val quantilesPpm: Seq[Long] = Seq(250000L, 500000L, 900000L, 990000L)

  /** The portable bucket id of a value column (null-safe: callers filter). */
  private def bucketOf(value: org.apache.spark.sql.Column) =
    least(greatest(floor(value * lit(histScale)), lit(0L)),
      lit(histBuckets - 1L)).cast("int")

  /** (day, bucket, cnt) histogram rows for every day present in `events`. */
  def dailyHists(events: DataFrame): DataFrame =
    events
      .filter(col("value").isNotNull)
      .select(to_date(col("ts")).as("day"), bucketOf(col("value")).as("bucket"))
      .groupBy(col("day"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Full build: histogram every day in `events` and (re)write the store. */
  def buildDaily(events: DataFrame, dir: String): Unit =
    dailyHists(events).write
      .mode("overwrite")
      .partitionBy("day")
      .parquet(dir)

  /** Incremental ingest: recompute and overwrite ONLY the days present in
    * the arriving events — other days' histograms are untouched, so ingest
    * cost is O(arrivals), not O(history).
    */
  def upsertDaily(events: DataFrame, dir: String): Unit =
    dailyHists(events).write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day")
      .parquet(dir)

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Range quantiles over [from, to] (inclusive) straight from the stored
    * day histograms: partition-pruned day scan, counter-sum merge, then the
    * rank pick off the cumulative histogram. One output row per entry of
    * [[quantilesPpm]]; `value_edge` is the answer (lower bucket edge),
    * `target_rank` the 1-based rank it covers.
    *
    * Scale notes: the merged histogram is ≤ [[histBuckets]] rows whatever
    * the range, so the unpartitioned cumulative window and the collected
    * pick array are BOUNDED driver/executor artifacts (same class as the
    * k-means codebooks), not data-sized state. The target rank
    * `ceil(q·n/10^6)` is computed by splitting n at 10^6 so the product
    * never exceeds ~n — no overflow for any corpus that fits in a long.
    */
  def valueQuantilesBetween(spark: SparkSession, dir: String,
      from: String, to: String): DataFrame = {
    val days = read(spark, dir)
      .filter(col("day") >= lit(from) && col("day") <= lit(to))
    val meta = days.agg(
      min(col("day")).as("day_from"),
      max(col("day")).as("day_to"),
      countDistinct(col("day")).as("n_days"),
      sum(col("cnt")).as("n_values"))
    val merged = days.groupBy(col("bucket")).agg(sum(col("cnt")).as("cnt"))
    val cum = merged
      .withColumn("cum", sum(col("cnt")).over(
        Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .agg(sort_array(collect_list(struct(col("bucket"), col("cum")))).as("h"))
    meta.crossJoin(cum)
      .select(col("day_from"), col("day_to"), col("n_days"), col("n_values"),
        col("h"), explode(array(quantilesPpm.map(lit(_)): _*)).as("q_ppm"))
      .withColumn("target_rank",
        expr("q_ppm * (n_values div 1000000) " +
          "+ (q_ppm * (n_values % 1000000) + 999999) div 1000000"))
      .withColumn("bucket", expr("filter(h, x -> x.cum >= target_rank)[0].bucket"))
      .select(col("day_from"), col("day_to"), col("n_days"), col("n_values"),
        col("q_ppm"), col("target_rank"), col("bucket"),
        (col("bucket") / lit(histScale)).as("value_edge"))
  }

  /** Per-day value-distribution drift vs the whole store's blend: TVD in
    * ppm between each day's histogram and the all-days histogram — the
    * day-grain ingest-anomaly monitor (a transcoding bug, a price-unit
    * change, a bot flood all move the value distribution before they move
    * the volume), computed ENTIRELY from the stored day histograms: the
    * raw events are never rescanned, which is the store's point. Same
    * integer-ppm TVD as [[graft.operators.TextOps.sourceDrift]]; both
    * comparison frames (bucket blend ≤ [[histBuckets]] rows, day totals)
    * are bounded broadcast artifacts.
    */
  def dailyHistDrift(spark: SparkSession, dir: String): DataFrame = {
    val sc = read(spark, dir)
    val st = sc.groupBy(col("day")).agg(sum(col("cnt")).as("s_tot"))
    val cc = sc.groupBy(col("bucket")).agg(sum(col("cnt")).as("cc_c"))
    val ct = cc.agg(sum(col("cc_c")).as("c_tot"))
    sc.select(col("day")).distinct()
      .crossJoin(broadcast(cc))
      .join(sc.withColumnRenamed("cnt", "c"), Seq("day", "bucket"), "left")
      .join(broadcast(st), Seq("day"))
      .crossJoin(broadcast(ct))
      .select(col("day"),
        abs(expr("coalesce(c, 0L) * 1000000 div s_tot - cc_c * 1000000 div c_tot"))
          .as("term"))
      .groupBy(col("day"))
      .agg(expr("CAST(sum(term) div 2 AS BIGINT)").as("tvd_ppm"),
        count(lit(1)).as("n_buckets"))
  }

  /** Build-once daily histogram store for the `events` fixture under
    * `srcDir` (content-stamped [[ArtifactStore]] dir).
    */
  def ensureFixture(spark: SparkSession, srcDir: String): String =
    ArtifactStore.ensure(srcDir, "histstore", Version) { dir =>
      buildDaily(Tables.events(spark, srcDir), dir)
    }
}
