package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** The schema pre-flight's contract (VERDICT r4 #2 done-criterion): a clean
  * fixture produces an empty diff, and an intentionally-mutated fixture
  * produces the NAMED drift line — never an opaque failure cascade.
  */
class PreflightSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def variantDir(mutate: Option[String => Unit] = None): String = {
    val src = TestSession.sf
    val dir = Files.createTempDirectory("graft-preflight").toString
    for (t <- Tables.fixtureNames)
      Files.createSymbolicLink(Paths.get(dir, s"$t.parquet"),
        Paths.get(src, s"$t.parquet"))
    mutate.foreach(_(dir))
    dir
  }

  test("clean fixture: loaded schemas render, diff is empty") {
    val dir = variantDir()
    assert(Preflight.schemaDiff(spark, dir).isEmpty)
    val schemas = Preflight.loadedSchemas(spark, dir).toMap
    assert(schemas.keySet == Preflight.expected.map(_._1).toSet)
    assert(schemas("events").contains("ts:timestamp"),
      s"events schema should show a timestamp ts: ${schemas("events")}")
  }

  test("re-encoded events.ts (legacy nanos-long) yields the NAMED drift line") {
    val dir = variantDir(Some { d =>
      val p = Paths.get(d, "events.parquet")
      Files.delete(p) // drop the symlink, write the mutated table
      Tables.events(spark, TestSession.sf)
        .withColumn("ts", expr("unix_micros(ts) * 1000L"))
        .write.mode("overwrite").parquet(p.toString)
    })
    val diff = Preflight.schemaDiff(spark, dir)
    assert(diff == Seq("events.ts: expected timestamp, loaded bigint"),
      s"drift must be one named line, got $diff")
    // and the adaptive reader still handles the legacy encoding end to end
    assert(Tables.events(spark, dir).schema("ts").dataType
      == org.apache.spark.sql.types.TimestampType)
  }

  test("a dropped column and an extra column are both named") {
    val dir = variantDir(Some { d =>
      val p = Paths.get(d, "documents.parquet")
      Files.delete(p)
      Tables.documents(spark, TestSession.sf)
        .drop("lang").withColumn("extra_col", lit(1))
        .write.mode("overwrite").parquet(p.toString)
    })
    val diff = Preflight.schemaDiff(spark, dir).toSet
    assert(diff == Set(
      "documents.lang: expected string, column MISSING",
      "documents.extra_col: unexpected column (int)"), s"got $diff")
  }
}
