package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Op
import graft.sources.Tables

/** Temporal join operators (as-of and range joins) — operators the reference
  * lacks entirely and Spark has no single built-in for, composed from
  * existing primitives per the preference order (compose > custom plan):
  * a banded range equi-join generates candidates, a window picks winners.
  *
  * Scale shape: the join key is (partition key, coarse time band), so
  * candidates are bounded by band population — no cross product, single
  * shuffle, AQE-splittable. Tolerance bounds the band count per row at a
  * small constant.
  */
object Temporal {

  /** As-of join: for each left row, the LATEST right row with the same key
    * and `rightTime <= leftTime` within `toleranceUs`. Ties on time break by
    * highest right id. Left rows with no match are dropped (inner as-of).
    *
    * The equi-join key is (key, time band of width `toleranceUs`): a right
    * row can only serve left rows in its own or the next band, so it is
    * replicated to exactly those two band keys — candidates per reducer are
    * bounded by band population, not by the key's full history.
    *
    * `leftId` must uniquely identify left rows (winner selection partitions
    * on it).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftId: String, leftTime: String, rightTime: String, rightId: String,
      toleranceUs: Long): DataFrame = {
    val lt = unix_micros(col(s"l.$leftTime"))
    val rt = unix_micros(col(s"r.$rightTime"))
    val banded = right.withColumn("_band",
      explode(array(bandOf(col(rightTime), toleranceUs),
        bandOf(col(rightTime), toleranceUs) + 1)))
    val cand = left.as("l").join(banded.as("r"),
      col(s"l.$key") === col(s"r.$key")
        && bandOf(col(s"l.$leftTime"), toleranceUs) === col(s"r._band")
        && rt <= lt && lt - rt <= toleranceUs)
    val w = Window.partitionBy(col(s"l.$leftId"))
      .orderBy(col(s"r.$rightTime").desc, col(s"r.$rightId").desc)
    cand.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_band")
  }

  private def bandOf(time: Column, widthUs: Long): Column =
    floor(unix_micros(time) / lit(widthUs))

  /** Forward as-of join: for each left row, the EARLIEST right row with the
    * same key and `leftTime <= rightTime <= leftTime + toleranceUs` — the
    * "next event after" lookup ([[asofJoin]] mirrored in time; ties on time
    * break by lowest right id). A right row at band b can only serve left
    * rows in bands b and b−1, so it is replicated to exactly those two —
    * the same bounded-candidates argument as the backward join.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
      leftId: String, leftTime: String, rightTime: String, rightId: String,
      toleranceUs: Long): DataFrame = {
    val lt = unix_micros(col(s"l.$leftTime"))
    val rt = unix_micros(col(s"r.$rightTime"))
    val banded = right.withColumn("_band",
      explode(array(bandOf(col(rightTime), toleranceUs),
        bandOf(col(rightTime), toleranceUs) - 1)))
    val cand = left.as("l").join(banded.as("r"),
      col(s"l.$key") === col(s"r.$key")
        && bandOf(col(s"l.$leftTime"), toleranceUs) === col(s"r._band")
        && rt >= lt && rt - lt <= toleranceUs)
    val w = Window.partitionBy(col(s"l.$leftId"))
      .orderBy(col(s"r.$rightTime").asc, col(s"r.$rightId").asc)
    cand.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_band")
  }

  /** Range-join aggregation: per left row, counts right rows with the same
    * key within ±`windowUs`. Banded like [[asofJoin]] (a ± window spans at
    * most the band and both neighbors → 3 replicas), left rows surviving
    * with count 0.
    */
  def rangeJoinCount(left: DataFrame, right: DataFrame, key: String,
      leftId: String, leftTime: String, rightTime: String,
      windowUs: Long): DataFrame = {
    val lt = unix_micros(col(s"l.$leftTime"))
    val rt = unix_micros(col(s"r.$rightTime"))
    val banded = right.withColumn("_band",
      explode(array(bandOf(col(rightTime), windowUs) - 1,
        bandOf(col(rightTime), windowUs),
        bandOf(col(rightTime), windowUs) + 1)))
    left.as("l").join(banded.as("r"),
        col(s"l.$key") === col(s"r.$key")
          && bandOf(col(s"l.$leftTime"), windowUs) === col(s"r._band")
          && abs(rt - lt) <= windowUs, "left")
      .groupBy(col(s"l.$leftId").as(leftId), col(s"l.$key").as(key))
      .agg(count(col(s"r.$rightTime")).as("n_in_window"))
  }

  // --------------------------------------------------------------------------
  // Registered ops + DuckDB oracles
  // --------------------------------------------------------------------------

  private val eventsCte =
    "ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events)"

  val attributionToleranceUs: Long = 30L * 60 * 1000 * 1000 // 30 min
  val rangeWindowUs: Long = 15L * 60 * 1000 * 1000 // 15 min

  def ops: Seq[Op] = Seq(
    // As-of: each click attributed to the latest view ≤ 30 min before it.
    Op.sql("events_asof_attribution",
      s"""WITH $eventsCte,
         |clicks AS (SELECT * FROM ev WHERE event_type = 'click'),
         |views AS (SELECT * FROM ev WHERE event_type = 'view'),
         |cand AS (
         |  SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
         |         v.event_id AS view_id, v.ts AS view_ts,
         |         ROW_NUMBER() OVER (PARTITION BY c.event_id
         |                            ORDER BY v.ts DESC, v.event_id DESC) AS rn
         |  FROM clicks c JOIN views v ON c.user_id = v.user_id
         |    AND epoch_us(v.ts) <= epoch_us(c.ts)
         |    AND epoch_us(c.ts) - epoch_us(v.ts) <= $attributionToleranceUs)
         |SELECT click_id, user_id, click_ts, view_id, view_ts,
         |       epoch_us(click_ts) - epoch_us(view_ts) AS gap_us
         |FROM cand WHERE rn = 1""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
      val views = ev.filter(col("event_type") === "view")
      asofJoin(clicks, views, "user_id", "event_id", "ts", "ts", "event_id",
        attributionToleranceUs)
        .select(col("l.event_id").as("click_id"), col("l.user_id").as("user_id"),
          col("l.ts").as("click_ts"), col("r.event_id").as("view_id"),
          col("r.ts").as("view_ts"),
          (unix_micros(col("l.ts")) - unix_micros(col("r.ts"))).as("gap_us"))
    },

    // Forward as-of: the first error within 30 min AFTER each purchase —
    // the checkout-flow reliability signal (did the purchase's session
    // subsequently fail).
    Op.sql("events_asof_next_error",
      s"""WITH $eventsCte,
         |buys AS (SELECT * FROM ev WHERE event_type = 'purchase'),
         |errs AS (SELECT * FROM ev WHERE event_type = 'error'),
         |cand AS (
         |  SELECT b.event_id AS purchase_id, b.user_id, b.ts AS purchase_ts,
         |         e.event_id AS error_id, e.ts AS error_ts,
         |         ROW_NUMBER() OVER (PARTITION BY b.event_id
         |                            ORDER BY e.ts ASC, e.event_id ASC) AS rn
         |  FROM buys b JOIN errs e ON b.user_id = e.user_id
         |    AND epoch_us(e.ts) >= epoch_us(b.ts)
         |    AND epoch_us(e.ts) - epoch_us(b.ts) <= $attributionToleranceUs)
         |SELECT purchase_id, user_id, purchase_ts, error_id, error_ts,
         |       epoch_us(error_ts) - epoch_us(purchase_ts) AS gap_us
         |FROM cand WHERE rn = 1""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val buys = ev.filter(col("event_type") === "purchase")
      val errs = ev.filter(col("event_type") === "error")
      asofJoinForward(buys, errs, "user_id", "event_id", "ts", "ts", "event_id",
        attributionToleranceUs)
        .select(col("l.event_id").as("purchase_id"), col("l.user_id").as("user_id"),
          col("l.ts").as("purchase_ts"), col("r.event_id").as("error_id"),
          col("r.ts").as("error_ts"),
          (unix_micros(col("r.ts")) - unix_micros(col("l.ts"))).as("gap_us"))
    },

    // Range join: views within ±15 min of each purchase, per user.
    Op.sql("events_range_view_counts",
      s"""WITH $eventsCte,
         |buys AS (SELECT * FROM ev WHERE event_type = 'purchase'),
         |views AS (SELECT * FROM ev WHERE event_type = 'view')
         |SELECT b.event_id AS event_id, b.user_id AS user_id,
         |       COUNT(v.ts) AS n_in_window
         |FROM buys b LEFT JOIN views v ON b.user_id = v.user_id
         |  AND abs(epoch_us(v.ts) - epoch_us(b.ts)) <= $rangeWindowUs
         |GROUP BY b.event_id, b.user_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val buys = ev.filter(col("event_type") === "purchase")
      val views = ev.filter(col("event_type") === "view")
      rangeJoinCount(buys, views, "user_id", "event_id", "ts", "ts", rangeWindowUs)
    },
  )
}
