package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def docs(texts: (Long, String)*) =
    texts.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("normalize: lowercase, strip punctuation, collapse whitespace") {
    val out = TextOps.normalize(docs(1L -> "  Hello,   WORLD!! x-1  "))
      .head().getString(1)
    assert(out == "hello world x 1")
  }

  test("edge inputs: empty and single-word docs do not break the stats ops") {
    val d = docs(1L -> "", 2L -> "word", 3L -> "a a a")
    val stats = TextOps.textStats(d).collect().map(r => r.getLong(0) -> r).toMap
    assert(stats(2L).getAs[Int]("n_tokens") == 1)
    assert(stats(3L).getAs[Int]("n_distinct_tokens") == 1)
    val lang = TextOps.langId(d).collect().map(r => r.getLong(0) -> r.getAs[String]("lang_pred")).toMap
    assert(lang(1L) == "unknown" && lang(2L) == "unknown" && lang(3L) == "en")
    val fp = TextOps.fingerprints(d).collect()
    assert(fp.length == 3)
    val cur = TextOps.curate(d).collect().map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    assert(cur.size == 3 && !cur(1L)) // empty doc never kept
  }

  test("quota per source: caps each source at the quota, keeps lowest ids") {
    val d = Seq((1L, "big"), (2L, "big"), (3L, "big"), (4L, "small"))
      .map { case (id, src) => (id, "t", "en", src, 1L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val q = TextOps.quotaPerSource(d, quota = 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Long]("src_rank")))
    assert(q.sortBy(_._1).toSeq == Seq((1L, "big", 1L), (2L, "big", 2L), (4L, "small", 1L)))
  }

  test("vocabulary: df counts docs not occurrences; top-k order is (df desc, token asc)") {
    val d = docs(1L -> "a a b c", 2L -> "a b b", 3L -> "a z")
    val v = TextOps.vocabulary(d, k = 3).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("df"), r.getAs[Long]("tf")))
    // a: df 3 / tf 4; b: df 2 / tf 3; c and z tie at df 1 → 'c' wins on token asc
    assert(v.toSeq == Seq(("a", 3L, 4L), ("b", 2L, 3L), ("c", 1L, 1L)))
  }

  test("top terms: rare-but-frequent tokens outrank common ones per doc") {
    val d = docs(1L -> "x x x the", 2L -> "the y", 3L -> "the z")
    val top = TextOps.topTerms(d, perDoc = 1).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("token")).toMap
    // 'the' appears in every doc (df 3) so the doc-unique token wins each time
    assert(top == Map(1L -> "x", 2L -> "y", 3L -> "z"))
    val ranks = TextOps.topTerms(d, perDoc = 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("term_rank")))
    assert(ranks.groupBy(_._1).values.forall(_.map(_._2).sorted.sameElements(Array(1L, 2L))))
  }

  test("curate keeps only canonical, on-language, quality-clearing docs") {
    val good = (1 to 60).map(i => if (i % 7 == 0) "the" else s"w$i").mkString(" ") // has stopwords, diverse
    val d = docs(1L -> good, 2L -> good, 3L -> "zz zz zz zz")
    val out = TextOps.curate(d, minQuality = 0.3).collect()
      .map(r => r.getLong(0) -> (r.getAs[Boolean]("is_canonical"), r.getAs[Boolean]("keep"))).toMap
    assert(out(1L)._1 && out(1L)._2)   // canonical copy of the good doc
    assert(!out(2L)._1 && !out(2L)._2) // duplicate dropped
    assert(!out(3L)._2)                // no stopwords → lang unknown → dropped
  }
}
