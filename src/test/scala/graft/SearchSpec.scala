package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Search

/** Mechanism tests for BM25 retrieval on a hand corpus with known ranking
  * structure, plus the scoring contract checked against a direct Scala
  * reimplementation of the integer formula.
  */
class SearchSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  // 4 docs: d0 heavy in "hash", d1 mentions it once, d2 about joins only,
  // d3 shares no query terms. All same length except d1 (longer).
  private val docs = Seq(
    (0L, "hash hash hash table scan"),
    (1L, "hash map lookup table entry probe structure design"),
    (2L, "join join merge sort"),
    (3L, "window stream batch")
  ).toDF("doc_id", "text")

  private def ranked(q: String) =
    Search.bm25TopK(docs, Seq((1L, q))).collect()
      .sortBy(_.getAs[Int]("rank"))
      .map(r => r.getAs[Long]("doc_id"))

  test("tf wins: the hash-heavy doc outranks the single mention") {
    val r = ranked("hash")
    assert(r.take(2).toSeq == Seq(0L, 1L), s"expected 0 then 1, got ${r.toSeq}")
    assert(!r.contains(3L), "doc without the term must not appear")
  }

  test("length normalization: same tf in a shorter doc scores higher") {
    val docs2 = Seq(
      (0L, "hash scan"),
      (1L, "hash scan filter project sort merge exchange broadcast")
    ).toDF("doc_id", "text")
    val r = Search.bm25TopK(docs2, Seq((1L, "hash"))).collect()
      .sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("doc_id"))
    assert(r.toSeq == Seq(0L, 1L))
  }

  test("idf: a rare term dominates a ubiquitous one at equal tf") {
    // "rare" in one doc, "common" in all four
    val docs3 = Seq(
      (0L, "rare common pad pad"),
      (1L, "common pad pad pad"),
      (2L, "common pad pad pad"),
      (3L, "common pad pad pad")
    ).toDF("doc_id", "text")
    val r = Search.bm25TopK(docs3, Seq((1L, "rare common")))
      .collect().sortBy(_.getAs[Int]("rank"))
    assert(r.head.getAs[Long]("doc_id") == 0L, "the rare-term doc must rank first")
  }

  test("score matches the direct integer formula on the fixture corpus") {
    val n = 4L
    val lens = Map(0L -> 5L, 1L -> 8L, 2L -> 4L, 3L -> 3L)
    val tl = lens.values.sum
    val adl = tl / n
    def score(tf: Long, df: Long, len: Long): Long = {
      val num = (2 * n - 2 * df + 1) * 20 * tf * adl
      val den = (2 * df + 1) * (8 * tf * adl + 3 * adl + 9 * len)
      (num / den) * Search.bm25Grid + ((num % den) * Search.bm25Grid) / den
    }
    val got = Search.bm25TopK(docs, Seq((1L, "hash table"))).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_q")).toMap
    // hash: df=2 (d0 tf=3, d1 tf=1); table: df=2 (d0 tf=1, d1 tf=1)
    assert(got(0L) == score(3, 2, 5) + score(1, 2, 5))
    assert(got(1L) == score(1, 2, 8) + score(1, 2, 8))
    assert(!got.contains(2L) && !got.contains(3L), "docs with no query term must be absent")
  }

  test("incremental index: stored ∪ new-batch bundle equals the full rebuild") {
    val fullIdx = Search.buildIndex(docs)
    val full = fullIdx.postings.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val stored = Search.buildIndex(docs.filter(col("doc_id") < 2))
    val arriving = Search.buildIndex(docs.filter(col("doc_id") >= 2))
    val mergedIdx = Search.mergeIndex(stored, arriving)
    val merged = mergedIdx.postings.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(merged == full, "doc-disjoint postings must merge to the full index exactly")
    // df merged by ADDITION must equal df rebuilt from the full corpus
    val mergedDf = mergedIdx.df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rebuiltDf = fullIdx.df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mergedDf == rebuiltDf, "merged df must equal rebuilt df exactly")
    // merged corpus stats (n, tl, adl) must equal the rebuilt stats row
    val mergedSt = mergedIdx.stats.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rebuiltSt = fullIdx.stats.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(mergedSt.toSeq == rebuiltSt.toSeq, "merged stats must equal rebuilt stats")
    // and the query over the merged bundle matches the full-corpus query
    val a = Search.bm25TopKFromIndex(mergedIdx, Seq((1L, "hash table")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("score_q"))).toSet
    val b = Search.bm25TopK(docs, Seq((1L, "hash table")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("score_q"))).toSet
    assert(a == b)
  }

  test("prebuilt-index query plan has no aggregate over the full postings") {
    // Stand-in for stored artifacts: localCheckpoint severs the build lineage
    // the way a parquet read does, so the analyzed query plan shows exactly
    // what query time executes.
    val built = Search.buildIndex(docs)
    val idx = Search.Bm25Index(
      built.postings.localCheckpoint(true),
      built.df.localCheckpoint(true),
      built.stats.localCheckpoint(true))
    val plan = Search.bm25TopKFromIndex(idx, Seq((1L, "hash table")))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Aggregate [doc_id"),
      s"query path must not re-aggregate postings to doc grain (corpus stats):\n$plan")
    assert(!plan.contains("Aggregate [token"),
      s"query path must not re-aggregate postings to term grain (df):\n$plan")
    assert(!plan.contains("split(text"),
      s"query path must not re-tokenize the corpus:\n$plan")
  }

  test("related docs: overlap-weighted ranking, df cap prunes ubiquitous terms") {
    // doc 0 queries; 1 shares two terms, 2 shares one, 3 only shares the
    // stopword "the" (df = 4 = every doc)
    val corpus = Seq(
      (0L, "the spark shuffle join"),
      (1L, "the spark shuffle sort"),
      (2L, "the spark filter scan"),
      (3L, "the python pandas numpy")
    ).toDF("doc_id", "text")
    val idx = Search.buildIndex(corpus)
    // default relative cap (4·N div 5 = 3): "the" (df 4) excluded; exact
    // integer scores (N=4)
    val capped = Search.relatedDocs(idx, Seq(0L), k = 10).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_q")).toMap
    val idf = (df: Long) => ((2 * 4 - 2 * df + 1) * Search.bm25Grid) / (2 * df + 1)
    assert(capped == Map(1L -> (idf(3) + idf(2)), 2L -> idf(3)),
      s"got $capped — doc 3 must be pruned with the stopword, doc 1 must lead")
    // explicit open cap: the stopword draws doc 3 in, but only at the bottom
    val open = Search.relatedDocs(idx, Seq(0L), k = 10, dfCap = Some(1000L)).collect()
      .sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("doc_id"))
    assert(open.toSeq == Seq(1L, 2L, 3L), s"got ${open.toSeq}")
  }

  test("hybrid rrf: fused ranking is exactly the integer-RRF of its two components") {
    import graft.operators.Similarity
    val sf = TestSession.sf
    val corpus = graft.sources.Tables.documents(spark, sf)
    val embs = graft.sources.Tables.embeddings(spark, sf)
    val idx = Search.buildIndex(corpus)
    val lex = Search.relatedDocs(idx).collect()
      .map(r => (r.getAs[Long]("query_doc"), r.getAs[Long]("doc_id")) ->
        r.getAs[Int]("rank")).toMap
    val dense = Similarity.ivfTopK(embs, col("vec_id").isin(Search.mltQueryDocs: _*))
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Int]("rank")).toMap
    def f(r: Option[Int]): Long = r.map(x => 1000000L / (Search.rrfK + x)).getOrElse(0L)
    val expected = (lex.keySet ++ dense.keySet).groupBy(_._1).flatMap { case (q, keys) =>
      keys.toSeq
        .map { k => (k._2, f(lex.get(k)) + f(dense.get(k))) }
        .sortBy { case (doc, s) => (-s, doc) }
        .take(Search.mltK)
        .zipWithIndex.map { case ((doc, s), i) => (q, doc) -> ((s, i + 1)) }
    }
    val got = Search.hybridRrf(idx, embs).collect()
      .map(r => (r.getAs[Long]("query_doc"), r.getAs[Long]("doc_id")) ->
        ((r.getAs[Long]("rrf_ppm"), r.getAs[Int]("rank")))).toMap
    assert(got == expected, s"got $got\nexpected $expected")
    // a doc surfaced by both rankers outranks equal-rank single-source docs
    assert(got.nonEmpty)
  }

  test("index append: stored-codebook encode equals full rebuild; retrain flags recompute") {
    import graft.operators.Similarity
    val embs = graft.sources.Tables.embeddings(spark, TestSession.sf)
    val corpus = embs.filter(col("vec_id") < Similarity.ivfCells ||
      pmod(col("vec_id"), lit(Similarity.appendMod)) =!= 0)
    val batch = embs.filter(col("vec_id") >= Similarity.ivfCells &&
      pmod(col("vec_id"), lit(Similarity.appendMod)) === 0)
    val rep = Similarity.ivfIndexAppend(corpus, batch).collect()
    // per-cell composition identical to a full rebuild: the stored codebook
    // is row-independent, so stored + appended = rebuilt, cell by cell
    val fullCells = Similarity.ivfAssign(embs)
      .groupBy(col("cell")).count().collect()
      .map(r => r.getAs[Long]("cell") -> r.getAs[Long]("count")).toMap
    assert(rep.map(r => r.getAs[Long]("cell")).toSet == fullCells.keySet)
    rep.foreach { r =>
      assert(r.getAs[Long]("n_stored") + r.getAs[Long]("n_new") ==
        fullCells(r.getAs[Long]("cell")), s"cell ${r.getAs[Long]("cell")}")
    }
    assert(rep.map(_.getAs[Long]("n_new")).sum == batch.count())
    // the retrain flag is exactly the documented threshold disjunction
    rep.foreach { r =>
      val expect = r.getAs[Long]("drift_x1000") > Similarity.appendDriftMaxX1000 ||
        r.getAs[Long]("new_share_ppm") > Similarity.appendShareMaxPpm
      assert(r.getAs[Boolean]("retrain") == expect)
    }
    // PQ tier: encoding only the corpus slice against its (identical) seed
    // codebook reproduces the full encode row for row — append-then-encode
    // is the rebuild, bit for bit
    val fullCodes = Similarity.pqCodesWide(embs).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Int](1)).toMap
    Similarity.pqCodesWide(corpus).collect().foreach { r =>
      assert(fullCodes(r.getAs[Long]("vec_id")) == r.getSeq[Int](1))
    }
  }

  test("inverted index: postings carry tf and doc length") {
    val idx = Search.invertedIndex(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("token")) ->
        (r.getAs[Long]("tf"), r.getAs[Long]("len"))).toMap
    assert(idx((0L, "hash")) == ((3L, 5L)))
    assert(idx((1L, "hash")) == ((1L, 8L)))
    assert(!idx.contains((2L, "hash")))
  }

  test("phrase match: consecutive-only occurrences, overlapping repeats counted") {
    val pdocs = Seq(
      (0L, "a b a b c"),  // "a b" at starts 0 and 2 → tf 2
      (1L, "a x b a"),    // terms present but never adjacent → no match
      (2L, "b a b a"),    // one occurrence (start 1)
      (3L, "a a a")       // "a a" overlaps: starts 0 and 1 → tf 2
    ).toDF("doc_id", "text")
    val pos = Search.positionalPostings(pdocs)
    val ab = Search.phraseMatch(pos, Seq((1L, "a b"))).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("phrase_tf")).toMap
    assert(ab == Map(0L -> 2L, 2L -> 1L), s"'a b' matches: $ab")
    // repeated-token phrase: each start needs BOTH term positions (distinct
    // term_idx), so "a a" in "a a a" counts the two overlapping starts
    val aa = Search.phraseMatch(pos, Seq((1L, "a a"))).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("phrase_tf")).toMap
    assert(aa == Map(3L -> 2L, 0L -> 0L).filter(_._2 > 0), s"'a a' matches: $aa")
    // ranking: higher phrase_tf first, doc_id tie-break
    val ranked = Search.phraseMatch(pos, Seq((1L, "a b"))).collect()
      .sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("doc_id")).toSeq
    assert(ranked == Seq(0L, 2L))
  }

  test("hard negatives: lexical candidates minus dense neighbors, hardest first") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.documents(spark, TestSession.sf)
    val embs = graft.sources.Tables.embeddings(spark, TestSession.sf)
    val hn = Search.hardNegatives(Search.buildIndex(docs), embs).collect()
    assert(hn.nonEmpty, "fixture corpus must yield negatives")
    val pairs = hn.map(r => (r.getAs[Long]("query_doc"), r.getAs[Long]("doc_id"))).toSet
    val dense = graft.operators.Similarity
      .bruteForceTopK(embs, col("vec_id").isin(Search.mltQueryDocs: _*), Search.hnDenseK)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(pairs.intersect(dense).isEmpty,
      "a dense (semantic) neighbor must never be served as a negative")
    // ranks are contiguous from 1 and ordered by descending lexical score
    hn.groupBy(_.getAs[Long]("query_doc")).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("neg_rank"))
      assert(sorted.map(_.getAs[Int]("neg_rank")).toSeq == (1 to rs.length),
        s"ranks must be contiguous for query $q")
      val scores = sorted.map(_.getAs[Long]("score_q")).toSeq
      assert(scores == scores.sortBy(-_), s"hardest (highest lexical) first for $q")
    }
  }

  test("MRR eval: agreement scores 1/rank, disagreement scores zero") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e"),
      (1L, "a b c d f"), // the only lexical neighbor of doc 0
      (2L, "z y x w v"), (3L, "z y x w u"), (4L, "z y x w t"))
      .toDF("doc_id", "text")
    def vec(x: Double) = (x +: Seq.fill(7)(0.0)).map(_.toFloat)
    val idx = Search.buildIndex(docs)
    // dense top-3 of 0 = {1, …} → first relevant at lexical rank 1
    val agree = Seq((0L, vec(1.0)), (1L, vec(0.9)), (2L, vec(-1.0)),
      (3L, vec(-0.9)), (4L, vec(-0.8))).toDF("vec_id", "embedding")
    val a = Search.mrrEval(idx, agree, Seq(0L)).collect().head
    assert((a.getAs[Int]("first_rel_rank"), a.getAs[Long]("rr_ppm"))
      == ((1, 1000000L)), s"got $a")
    // dense top-3 of 0 = {2, 3, 4}, none lexically reachable (no shared
    // token) → zero reciprocal rank, query still reported
    val disagree = Seq((0L, vec(1.0)), (1L, vec(-1.0)), (2L, vec(0.9)),
      (3L, vec(0.8)), (4L, vec(0.7))).toDF("vec_id", "embedding")
    val d = Search.mrrEval(idx, disagree, Seq(0L)).collect().head
    assert((d.getAs[Int]("first_rel_rank"), d.getAs[Long]("rr_ppm")) == ((0, 0L)),
      s"got $d")
  }

  test("PRF expansion: feedback vocabulary recalls docs plain BM25 cannot") {
    import spark.implicits._
    // q-docs 1-3 share the feedback term c (rare, heavy) and x (also in
    // doc 4); doc 4 has no query term, doc 5 nothing relevant. Plain BM25
    // can only surface 1-3; the expanded pass reaches 4 through x/c.
    val docs = Seq(
      (1L, "q x x x x c c pad1"),
      (2L, "q x x x x c c pad2"),
      (3L, "q x x x x c c pad3"),
      (4L, "x pad4 pad4 pad4 pad4"),
      (5L, "pad5 pad6 pad5 pad6 pad5")).toDF("doc_id", "text")
    val idx = Search.buildIndex(docs)
    val q = Seq((1L, "q"))
    val plain = Search.bm25TopKFromIndex(idx, q).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val prf = Search.prfTopK(idx, q).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(plain == Set(1L, 2L, 3L), s"plain BM25 reaches only q-docs: $plain")
    assert(prf.contains(4L), s"expansion must recall doc 4 via its x term: $prf")
    assert(!prf.contains(5L), "untouched vocabulary stays unreachable")
    assert(Set(1L, 2L, 3L).subsetOf(prf), "feedback docs stay in the result")
  }
}
