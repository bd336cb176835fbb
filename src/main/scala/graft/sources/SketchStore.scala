package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted daily HLL sketch store: one mergeable sketch of the day's
  * active users per calendar day, written as `day=`-partitioned parquet.
  *
  * The point at 100 TB: "unique users between any two dates" becomes a scan
  * of a FEW-KB-per-day sketch table plus a sketch-union aggregate — the raw
  * event history is read once per day, ever (when that day's sketch is
  * built), and never again for any range query. The same shape answers
  * per-day, weekly, or arbitrary-window uniques from one store, and sketch
  * union is commutative/associative, so days can be built or re-built in
  * any order and on any partitioning.
  *
  * Contract: a day's events are sketched together — [[upsertDaily]]
  * recomputes COMPLETE arriving days via dynamic partition overwrite (the
  * FactStore batch-arrival model; re-delivering a day replaces, never
  * double-counts).
  */
object SketchStore {

  /** Baked into the fixture dir name (like [[FactStore.Version]]): bump on
    * any sketch-schema or build-logic change so a stale cached fixture from
    * a previous build is never silently reused.
    */
  val Version = "v1"

  /** (day, sk, n_events) daily sketch rows for every day present in `events`. */
  def dailySketches(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        count(lit(1)).as("n_events"))

  /** Full build: sketch every day in `events` and (re)write the store. */
  def buildDaily(events: DataFrame, dir: String): Unit =
    dailySketches(events).write
      .mode("overwrite")
      .partitionBy("day")
      .parquet(dir)

  /** Incremental ingest: recompute and overwrite ONLY the days present in
    * the arriving events (dynamic partition overwrite) — other days'
    * sketches are untouched, so ingest cost is O(arrivals), not O(history).
    */
  def upsertDaily(events: DataFrame, dir: String): Unit =
    dailySketches(events).write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day")
      .parquet(dir)

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Per-day approximate uniques straight from the stored sketches. */
  def dailyEstimates(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir)
      .select(col("day"), hll_sketch_estimate(col("sk")).as("users_approx"),
        col("n_events"))

  /** Approximate distinct users over [from, to] (inclusive): union the
    * stored day sketches — the day filter prunes at the partition level,
    * and the aggregate carries sketches, never user rows.
    */
  def uniquesBetween(spark: SparkSession, dir: String,
      from: String, to: String): DataFrame =
    read(spark, dir)
      .filter(col("day") >= lit(from) && col("day") <= lit(to))
      .agg(
        min(col("day")).as("day_from"),
        max(col("day")).as("day_to"),
        count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("users_approx"),
        sum(col("n_events")).as("n_events"))

  // --------------------------------------------------------------------------
  // Fixture store (registered-op support, mirrors FactStore.ensureFixture)
  // --------------------------------------------------------------------------

  /** Build-once daily sketch store for the `events` fixture under `srcDir`
    * (content-stamped [[ArtifactStore]] dir, same convention as the
    * FactStore fixture).
    */
  def ensureFixture(spark: SparkSession, srcDir: String): String =
    ArtifactStore.ensure(srcDir, "sketchstore", Version) { dir =>
      buildDaily(Tables.events(spark, srcDir), dir)
    }
}
