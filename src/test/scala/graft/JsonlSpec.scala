package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Jsonl

class JsonlSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("permissive read separates clean rows from corrupt raw lines") {
    val dir = Files.createTempDirectory("graft_jsonl").toString
    Files.write(Paths.get(dir, "part-0.jsonl"), java.util.Arrays.asList(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s0", "n_chars": 11}""",
      """{"doc_id": 2, "text": "zweite zeile", "lang": "de", "source": "s0", "n_chars": 12}""",
      """{"doc_id": 3, "text": "truncated before the clos"""))
    val df = Jsonl.read(spark, Jsonl.documentsSchema, Seq(dir))
    val (cleanDf, corruptDf) = Jsonl.split(df)
    val clean = cleanDf.collect()
    assert(clean.length == 2)
    assert(clean.map(_.getAs[Long]("doc_id")).sorted.sameElements(Array(1L, 2L)))
    val bad = corruptDf.collect().map(_.getString(0))
    assert(bad.length == 1 && bad.head.contains("truncated"))
    df.unpersist()
    // strict read drops the malformed line and stays legal under count()'s
    // aggressive column pruning (the PERMISSIVE chain would not)
    assert(Jsonl.readStrict(spark, Jsonl.documentsSchema, Seq(dir)).count() == 2)
  }

  test("write/read round trip preserves rows, types, and nulls") {
    val dir = Files.createTempDirectory("graft_jsonl_rt").toString + "/docs"
    val in = Seq(
      (1L, Some("a b"), "en", "s0", 3L),
      (2L, None, "de", "s1", 0L)) // null text must survive the trip
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    Jsonl.write(in, dir)
    val back = Jsonl.clean(Jsonl.read(spark, Jsonl.documentsSchema, Seq(dir)))
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      in.schema.map(f => (f.name, f.dataType)))
    assert(back.exceptAll(in).isEmpty && in.exceptAll(back).isEmpty)
  }
}
