package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SketchStore, Tables}

/** The persisted daily-HLL store: accuracy vs exact distinct counts,
  * incremental ingest ≡ full rebuild, redelivery idempotence, and the
  * partition-pruned range read.
  */
class SketchStoreSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private lazy val events = Tables.events(spark, TestSession.sf)

  test("per-day estimates within 15% of exact distinct users") {
    val dir = Files.createTempDirectory("graft-sketch").toString + "/daily"
    SketchStore.buildDaily(events, dir)
    val approx = SketchStore.dailyEstimates(spark, dir).collect()
      .map(r => r.getDate(0) -> r.getAs[Long]("users_approx")).toMap
    val exact = events.groupBy(to_date(col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getDate(0) -> r.getAs[Long]("n")).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (d, n) =>
      assert(math.abs(approx(d) - n).toDouble <= math.max(0.15 * n, 3.0),
        s"$d: approx ${approx(d)} vs exact $n")
    }
  }

  test("hist store: range quantile = exact serial pick; upsert ≡ full rebuild; reads prune by day") {
    import graft.sources.HistStore
    val dir = Files.createTempDirectory("graft-hist").toString + "/daily"
    HistStore.buildDaily(events, dir)
    val (from, to) = ("2024-01-05", "2024-01-25")
    val rows = HistStore.valueQuantilesBetween(spark, dir, from, to).collect()
    assert(rows.length == HistStore.quantilesPpm.size)
    // serial replay: bucket the range's values exactly as the store does,
    // then pick each quantile off the sorted bucket list
    val buckets = events
      .filter(to_date(col("ts")).between(from, to) && col("value").isNotNull)
      .select(col("value")).collect()
      .map(r => math.min(math.max(math.floor(r.getDouble(0) * HistStore.histScale)
        .toLong, 0L), HistStore.histBuckets - 1L))
      .sorted
    val n = buckets.length.toLong
    rows.foreach { r =>
      val q = r.getAs[Long]("q_ppm")
      val target = q * (n / 1000000) + (q * (n % 1000000) + 999999) / 1000000
      assert(r.getAs[Long]("n_values") == n)
      assert(r.getAs[Long]("target_rank") == target)
      assert(r.getAs[Int]("bucket").toLong == buckets((target - 1).toInt),
        s"q=$q: bucket pick must equal the serial rank-$target element")
      assert(r.getAs[Double]("value_edge") ==
        r.getAs[Int]("bucket") / HistStore.histScale)
    }
    // a monotone sanity: higher quantiles never pick lower buckets
    val picked = rows.sortBy(_.getAs[Long]("q_ppm")).map(_.getAs[Int]("bucket"))
    assert(picked.zip(picked.tail).forall { case (a, b) => a <= b })
    // upsert of one already-present day is a no-op on the store's answers
    val day = "2024-01-10"
    HistStore.upsertDaily(events.filter(to_date(col("ts")) === day), dir)
    val after = HistStore.valueQuantilesBetween(spark, dir, from, to).collect()
    assert(after.map(_.toString).sorted.sameElements(rows.map(_.toString).sorted),
      "re-delivering a complete day must not change any range answer")
    // partition pruning: the day range must reach the scan as a PartitionFilter
    val plan = HistStore.valueQuantilesBetween(spark, dir, from, to)
      .queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = plan.collect { case s: FileSourceScanExec => s }.head
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "day")),
      s"day range did not become a PartitionFilter: ${scan.partitionFilters}")
  }

  test("range uniques: merged sketches track the exact range distinct; reads prune by day") {
    val dir = Files.createTempDirectory("graft-sketch2").toString + "/daily"
    SketchStore.buildDaily(events, dir)
    val (from, to) = ("2024-01-08", "2024-01-21")
    val range = SketchStore.uniquesBetween(spark, dir, from, to)
    val row = range.collect()(0)
    val exact = events
      .filter(to_date(col("ts")).between(from, to))
      .agg(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(row.getAs[Long]("n_days") == 14)
    val approx = row.getAs[Long]("users_approx")
    assert(math.abs(approx - exact).toDouble <= math.max(0.15 * exact, 3.0),
      s"range approx $approx vs exact $exact")
    // the day range must prune the sketch scan at the partition level —
    // a range query opens 14 day files, never the whole store (checked on a
    // fresh plan: post-execution AQE wraps the scan in query stages)
    val plan = SketchStore.uniquesBetween(spark, dir, from, to)
      .queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = plan.collect { case s: FileSourceScanExec => s }.head
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "day")),
      s"day range did not become a PartitionFilter: ${scan.partitionFilters}")
  }

  test("streaming ingest loop converges to the batch-built store, even with days split across batches") {
    import graft.streaming.StreamingOps
    val inDir = Files.createTempDirectory("graft-sketch-in").toString
    val full = Files.createTempDirectory("graft-sketch5").toString + "/daily"
    val streamed = Files.createTempDirectory("graft-sketch6").toString + "/daily"
    SketchStore.buildDaily(events, full)
    // two arrival files split by event PARITY — every day straddles both
    // micro-batches, exercising the recompute-from-static correctness path
    events.filter(col("event_id") % 2 === 0).write.mode("append").parquet(inDir)
    events.filter(col("event_id") % 2 === 1).write.mode("append").parquet(inDir)
    val q = StreamingOps.incrementalSketchStore(spark, inDir, events, streamed,
      Files.createTempDirectory("graft-ckpt-sk").toString, maxFilesPerTrigger = Some(1))
    q.awaitTermination(180000)
    def estimates(dir: String) = SketchStore.dailyEstimates(spark, dir).collect()
      .map(r => (r.getDate(0), r.getAs[Long]("users_approx"), r.getAs[Long]("n_events")))
      .toSet
    assert(estimates(streamed) == estimates(full))
  }

  test("hist store: out-of-grid and negative values clamp to the edge buckets, deterministically") {
    import graft.sources.HistStore
    val spark2 = spark
    import spark2.implicits._
    import java.sql.Timestamp
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "view", -3.7, ""),
      (2L, Timestamp.valueOf("2024-01-01 01:00:00"), 1L, "view", 0.0, ""),
      (3L, Timestamp.valueOf("2024-01-01 02:00:00"), 1L, "view", 1e12, ""),
      (4L, Timestamp.valueOf("2024-01-01 03:00:00"), 1L, "view", 511.99, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val hist = HistStore.dailyHists(ev).collect()
      .map(r => r.getAs[Int]("bucket") -> r.getAs[Long]("cnt")).toMap
    // -3.7 and 0.0 clamp/land in bucket 0; 1e12 clamps into the top bucket;
    // 511.99*2 floors to 1023 (the top bucket's own edge)
    assert(hist == Map(0 -> 2L, (HistStore.histBuckets - 1).toInt -> 2L), s"got $hist")
  }

  test("hist drift: a blend-shaped day scores zero TVD, one-sided days score their exact gap") {
    import graft.sources.HistStore
    val spark2 = spark
    import spark2.implicits._
    import java.sql.Timestamp
    def ev(day: Int, n: Int, v: Double) = (0 until n).map(i =>
      (day * 1000L + i, Timestamp.valueOf(f"2024-01-0$day 0${i % 10}:00:00"),
        1L, "view", v, ""))
    // day 1: 10 values in bucket 0; day 2: 10 values in bucket 2;
    // day 3: one of each — exactly the blend's 50/50 shape
    val events = (ev(1, 10, 0.1) ++ ev(2, 10, 1.1) ++
      ev(3, 1, 0.1) ++ ev(3, 1, 1.1))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = Files.createTempDirectory("graft-hist-drift").toString + "/daily"
    HistStore.buildDaily(events, dir)
    val out = HistStore.dailyHistDrift(spark, dir).collect()
      .map(r => r.getDate(0).toString -> r.getAs[Long]("tvd_ppm")).toMap
    assert(out("2024-01-03") == 0L, s"blend-shaped day must score zero: $out")
    assert(out("2024-01-01") == 500000L && out("2024-01-02") == 500000L,
      s"one-sided days score the exact half-L1 gap: $out")
  }

  test("hist store streaming loop converges to the batch-built store under split-day arrivals") {
    import graft.sources.HistStore
    import graft.streaming.StreamingOps
    val inDir = Files.createTempDirectory("graft-hist-in").toString
    val full = Files.createTempDirectory("graft-hist-f").toString + "/daily"
    val streamed = Files.createTempDirectory("graft-hist-s").toString + "/daily"
    HistStore.buildDaily(events, full)
    events.filter(col("event_id") % 2 === 0).write.mode("append").parquet(inDir)
    events.filter(col("event_id") % 2 === 1).write.mode("append").parquet(inDir)
    val q = StreamingOps.incrementalHistStore(spark, inDir, events, streamed,
      Files.createTempDirectory("graft-ckpt-hi").toString, maxFilesPerTrigger = Some(1))
    q.awaitTermination(180000)
    def hists(dir: String) = HistStore.read(spark, dir).collect()
      .map(r => (r.getDate(r.fieldIndex("day")), r.getAs[Int]("bucket"),
        r.getAs[Long]("cnt"))).toSet
    assert(hists(streamed) == hists(full))
    // and the range answers agree bit-for-bit
    val a = HistStore.valueQuantilesBetween(spark, streamed, "2024-01-05", "2024-01-25")
      .collect().map(_.toString).sorted
    val b = HistStore.valueQuantilesBetween(spark, full, "2024-01-05", "2024-01-25")
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("mixed-k store: range merge equals the uniform-min-k store's answer") {
    // a store whose history was built at k=128 and whose recent days were
    // written at k=64 (a live k migration) must answer range queries with
    // EXACTLY the arithmetic a uniform k=64 store would use: merge to the
    // smallest k present, estimate at that k.
    val mixed = Files.createTempDirectory("graft-sketch-mk1").toString + "/daily"
    val uniform = Files.createTempDirectory("graft-sketch-mk2").toString + "/daily"
    val early = events.filter(dayofmonth(col("ts")) <= 15)
    val late = events.filter(dayofmonth(col("ts")) > 15)
    SketchStore.upsertDaily(early, mixed, k = 128)
    SketchStore.upsertDaily(late, mixed, k = 64)
    SketchStore.buildDaily(events, uniform, k = 64)
    val ks = SketchStore.read(spark, mixed).select(col("k")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(ks == Set(64, 128), s"store rows must carry their own k: $ks")
    def rangeRow(dir: String) = {
      val r = SketchStore.uniquesBetween(spark, dir, "2024-01-10", "2024-01-20").collect()(0)
      (r.getAs[Long]("n_days"), r.getAs[Long]("users_approx"), r.getAs[Long]("n_events"))
    }
    assert(rangeRow(mixed) == rangeRow(uniform))
    // per-day estimates use each row's OWN k: the k=128 days of the mixed
    // store match a k=128 build, the k=64 days match the k=64 build
    val mixedDaily = SketchStore.dailyEstimates(spark, mixed).collect()
      .map(r => r.getDate(0) -> r.getAs[Long]("users_approx")).toMap
    val u64 = SketchStore.dailyEstimates(spark, uniform).collect()
      .map(r => r.getDate(0) -> r.getAs[Long]("users_approx")).toMap
    val full128 = Files.createTempDirectory("graft-sketch-mk3").toString + "/daily"
    SketchStore.buildDaily(events, full128, k = 128)
    val u128 = SketchStore.dailyEstimates(spark, full128).collect()
      .map(r => r.getDate(0) -> r.getAs[Long]("users_approx")).toMap
    mixedDaily.foreach { case (d, est) =>
      val expected = if (d.toLocalDate.getDayOfMonth <= 15) u128(d) else u64(d)
      assert(est == expected, s"$d: mixed-store estimate $est != $expected")
    }
  }

  test("incremental day-wave ingest equals full rebuild; redelivery replaces, never double-counts") {
    val full = Files.createTempDirectory("graft-sketch3").toString + "/daily"
    val inc = Files.createTempDirectory("graft-sketch4").toString + "/daily"
    SketchStore.buildDaily(events, full)
    // two arrival waves split by day parity — complete days per wave
    SketchStore.upsertDaily(events.filter(dayofmonth(col("ts")) % 2 === 0), inc)
    SketchStore.upsertDaily(events.filter(dayofmonth(col("ts")) % 2 === 1), inc)
    // a full day redelivered: overwrites its partition, estimates unchanged
    SketchStore.upsertDaily(events.filter(dayofmonth(col("ts")) === 3), inc)
    def estimates(dir: String) = SketchStore.dailyEstimates(spark, dir).collect()
      .map(r => (r.getDate(0), r.getAs[Long]("users_approx"), r.getAs[Long]("n_events")))
      .toSet
    assert(estimates(inc) == estimates(full))
    def rangeRow(dir: String) = {
      val r = SketchStore.uniquesBetween(spark, dir, "2024-01-01", "2024-01-30").collect()(0)
      (r.getAs[Long]("n_days"), r.getAs[Long]("users_approx"), r.getAs[Long]("n_events"))
    }
    assert(rangeRow(inc) == rangeRow(full))
  }
}
