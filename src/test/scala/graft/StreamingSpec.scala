package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventOps
import graft.sources.Tables
import graft.streaming.StreamingOps

/** Streaming shapes must converge to the batch (DuckDB-verified) answers. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def stageEvents(): String = {
    val dir = Files.createTempDirectory("graft-stream-in").toString
    // stage fixture events as two "arriving" files
    val ev = Tables.events(spark, TestSession.sf)
    ev.filter(col("event_id") % 2 === 0).write.mode("append").parquet(dir)
    ev.filter(col("event_id") % 2 === 1).write.mode("append").parquet(dir)
    dir
  }

  test("streaming hourly rollup over file source equals the batch rollup") {
    val dir = stageEvents()
    val q = StreamingOps.runAvailableNow(
      StreamingOps.hourlyRollup(StreamingOps.eventStream(spark, dir)),
      "hourly_test", Files.createTempDirectory("graft-ckpt").toString)
    q.awaitTermination(120000)
    val streamed = spark.table("hourly_test")
    val batch = EventOps.hourlyRollup(Tables.events(spark, TestSession.sf))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("mapGroupsWithState running user stats equal batch per-user totals") {
    import spark.implicits._
    val dir = stageEvents()
    val typed = StreamingOps.eventStream(spark, dir).as[StreamingOps.Event]
    val q = StreamingOps.runAvailableNow(
      StreamingOps.userRunningStats(typed).toDF(),
      "user_state_test", Files.createTempDirectory("graft-ckpt2").toString,
      outputMode = "update")
    q.awaitTermination(120000)
    // "update" emits one row per user per micro-batch — keep the final state
    val streamed = spark.table("user_state_test")
      .groupBy("user_id").agg(max(struct(col("n_events"), col("total_value"), col("last_seen"))).as("s"))
      .select(col("user_id"), col("s.n_events"), col("s.total_value"), col("s.last_seen"))
    val batch = EventOps.userStats(Tables.events(spark, TestSession.sf))
      .select(col("user_id"), col("n_events"), col("total_value"), col("last_seen"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      s"streamed=${streamed.count()} batch=${batch.count()}")
  }
}
