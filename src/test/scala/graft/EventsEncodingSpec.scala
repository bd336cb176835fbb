package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Round-4 regression armor: the driver regenerated the fixtures with
  * `events.ts` re-encoded (TIMESTAMP(NANOS)-as-long → timestamp[us]) and 27
  * queries broke at the reader. [[Tables.events]] now adapts to the loaded
  * schema; this spec pins that contract against EVERY encoding a fixture
  * generation has shipped — µs timestamp (LTZ and NTZ flavors) and
  * nanos-as-long — by materializing variant fixture dirs and driving the
  * registered events-consuming ops against each.
  */
class EventsEncodingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  /** Variant fixture dirs: all tables symlinked from the smoke fixture,
    * events.parquet rewritten in the named encoding.
    */
  lazy val variants: Seq[(String, String)] = {
    val src = TestSession.sf
    def mkVariant(tag: String)(ts: org.apache.spark.sql.Column): String = {
      val dir = Files.createTempDirectory(s"graft-events-$tag").toString
      for (t <- Tables.fixtureNames if t != "events")
        Files.createSymbolicLink(Paths.get(dir, s"$t.parquet"),
          Paths.get(src, s"$t.parquet"))
      Tables.events(spark, src)
        .withColumn("ts", ts)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    Seq(
      "micros_ltz" -> mkVariant("ltz")(col("ts")),
      "micros_ntz" -> mkVariant("ntz")(col("ts").cast("timestamp_ntz")),
      "nanos_long" -> mkVariant("nanos")(expr("unix_micros(ts) * 1000L")))
  }

  /** The registered ops that read the events table (Temporal and the sketch
    * store included — their op names carry the events_ prefix).
    */
  private def eventsOps: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] =
    SparkEntry.queries.toSeq.sortBy(_._1).filter { case (name, _) =>
      name.startsWith("events_") ||
        Set("quality_fk_report_event_users", "analytics_user_event_pivot",
          "analytics_weekly_overlap_approx").contains(name)
    }

  test("the events-consuming op set is intact (guard against rename drift)") {
    assert(eventsOps.size >= 25, s"expected >= 25 events ops, got ${eventsOps.map(_._1)}")
  }

  test("Tables.events yields one ts type and identical values under every encoding") {
    val fps = variants.map { case (tag, dir) =>
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType,
        s"$tag: expected TimestampType, got ${ev.schema("ts").dataType}")
      val r = ev.agg(count(lit(1)), sum(unix_micros(col("ts"))),
        min(col("ts")).cast("string"), max(col("ts")).cast("string")).head()
      tag -> ((r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    }
    assert(fps.map(_._2).distinct.size == 1,
      s"encodings must read back identical event times: $fps")
  }

  test("every events op analyzes against every encoding") {
    val failures = variants.flatMap { case (tag, dir) =>
      eventsOps.flatMap { case (name, fn) =>
        try { fn(spark, dir).schema; None }
        catch { case e: Exception =>
          Some(s"$tag/$name: ${e.getMessage.linesIterator.next()}")
        }
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("a representative aggregate is row-identical across encodings") {
    val rows = variants.map { case (tag, dir) =>
      tag -> SparkEntry.queries("events_hourly")(spark, dir)
        .collect().map(_.toString).sorted.toSeq
    }
    assert(rows.map(_._2).distinct.size == 1,
      "events_hourly must produce identical rows under every ts encoding")
  }
}
