package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Tokenizer

/** BPE trainer tests: the distributed merge loop must reproduce the
  * sequential greedy reference algorithm exactly — including the
  * doubled-symbol overlap rule (merge even offsets of a match run).
  */
class TokenizerSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  /** Sequential reference BPE (Sennrich): count pairs weighted by word
    * freq, argmax with (count desc, left asc, right asc) tie-break, greedy
    * left-to-right merge.
    */
  private def refBpe(words: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
    var seqs: Vector[(Vector[String], Long)] =
      words.toVector.map { case (w, f) =>
        (w.map(_.toString).toVector :+ Tokenizer.wordEnd) -> f }
    val out = scala.collection.mutable.Buffer[(String, String, Long)]()
    for (_ <- 1 to n) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((s, f) <- seqs; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + f
      if (counts.isEmpty) return out.toSeq
      val ((a, b), c) = counts.toSeq.minBy { case ((l, r), cnt) => (-cnt, l, r) }
      out += ((a, b, c))
      seqs = seqs.map { case (s, f) =>
        val buf = Vector.newBuilder[String]
        var i = 0
        while (i < s.length) {
          if (i < s.length - 1 && s(i) == a && s(i + 1) == b) { buf += (a + b); i += 2 }
          else { buf += s(i); i += 1 }
        }
        (buf.result(), f)
      }
    }
    out.toSeq
  }

  test("doubled symbols merge at even run offsets, and training stops when no pairs remain") {
    val docs = Seq((0L, "aaaa aaaa")).toDF("doc_id", "text")
    val got = Tokenizer.bpeTrain(docs, merges = 8).collect()
      .sortBy(_.getAs[Int]("merge_rank"))
      .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym"),
        r.getAs[Long]("pair_freq")))
    // round 1: (a,a) ×3 positions ×freq2 = 6; greedy keeps offsets 0 and 2
    // round 2: (aa,aa)=2 ties (aa,</w>)=2 → '<' sorts first
    // round 3: (aa,aa</w>)=2; round 4: single symbol per word → early stop
    assert(got.toSeq == Seq(
      ("a", "a", 6L), ("aa", Tokenizer.wordEnd, 2L), ("aa", "aa" + Tokenizer.wordEnd, 2L)))
  }

  test("distributed trainer ≡ sequential reference on the fixture corpus") {
    val docs = graft.sources.Tables.documents(spark, TestSession.sf)
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ref = refBpe(words, Tokenizer.bpeMerges)
    val got = Tokenizer.bpeTrain(docs).collect()
      .sortBy(_.getAs[Int]("merge_rank"))
      .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym"),
        r.getAs[Long]("pair_freq"))).toSeq
    assert(got == ref, s"merge tables diverge:\n got=$got\n ref=$ref")
  }

  test("vocab after merges partitions the corpus: total symbol mass conserved") {
    val docs = Seq((0L, "low lower lowest low low")).toDF("doc_id", "text")
    val vocab = Tokenizer.bpeVocab(docs, merges = 3).collect()
      .map(r => r.getAs[String]("sym") -> r.getAs[Long]("total_freq")).toMap
    // every character of every word instance (plus one end marker per word)
    // is inside exactly one final symbol
    val charMass = "low lower lowest low low".split(" ")
      .map(w => w.length + Tokenizer.wordEnd.length).sum
    val gotMass = vocab.map { case (s, f) => s.length * f }.sum
    assert(gotMass == charMass, s"symbol mass $gotMass != corpus mass $charMass")
    assert(vocab.contains("low"), "3 merges on this corpus must produce the 'low' symbol")
  }

  test("encode: per-doc symbol counts follow the sequential reference tokenization") {
    // two docs sharing words, 2 merges: encode must equal tokenizing each
    // doc's words with the reference merges
    val docs = Seq((0L, "low low lower"), (1L, "lowest low")).toDF("doc_id", "text")
    val words = Map("low" -> 3L, "lower" -> 1L, "lowest" -> 1L)
    val merges = refBpe(words, 2).map { case (a, b, _) => (a, b) }
    def tokenize(w: String): Seq[String] = {
      var s: Vector[String] = w.map(_.toString).toVector :+ Tokenizer.wordEnd
      for ((a, b) <- merges) {
        val buf = Vector.newBuilder[String]
        var i = 0
        while (i < s.length) {
          if (i < s.length - 1 && s(i) == a && s(i + 1) == b) { buf += (a + b); i += 2 }
          else { buf += s(i); i += 1 }
        }
        s = buf.result()
      }
      s
    }
    val expected = Seq(0L -> Seq("low", "low", "lower"), 1L -> Seq("lowest", "low"))
      .flatMap { case (d, ws) => ws.flatMap(tokenize).map(sym => (d, sym)) }
      .groupBy(identity).map { case ((d, sym), xs) => (d, sym) -> xs.size.toLong }
    val got = Tokenizer.bpeEncode(docs, merges = 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("sym")) ->
        r.getAs[Long]("n_tokens")).toMap
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("encode totals reconcile with the trained vocabulary's symbol mass") {
    val docs = graft.sources.Tables.documents(spark, TestSession.sf)
    val vocab = Tokenizer.bpeVocab(docs).collect()
      .map(r => r.getAs[String]("sym") -> r.getAs[Long]("total_freq")).toMap
    val enc = Tokenizer.bpeEncode(docs).collect()
      .map(r => r.getAs[String]("sym") -> r.getAs[Long]("n_tokens"))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
    assert(enc == vocab,
      "per-symbol encode totals across docs must equal the vocab's total_freq")
  }

  test("fertility: token mass over word mass per source, consistent with encode") {
    val docs = Seq((0L, "low low lower", "a", "webA"), (1L, "lowest low", "b", "webB"))
      .toDF("doc_id", "text", "lang", "source")
    val syms = Tokenizer.trainedSyms(docs, 2)
    val out = Tokenizer.bpeFertility(docs, syms).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("fertility_ppm")))).toMap
    // totals must reconcile with the per-doc encode
    val enc = Tokenizer.bpeEncodeFromSyms(docs, syms).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens"))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
    assert(out("webA")._1 == 3L && out("webA")._2 == enc(0L))
    assert(out("webB")._1 == 2L && out("webB")._2 == enc(1L))
    out.values.foreach { case (w, t, f) =>
      assert(f == t * 1000000L / w && t >= w, "a word is at least one token")
    }
  }

  test("repartitioning the corpus does not change the trained merges") {
    val docs = graft.sources.Tables.documents(spark, TestSession.sf)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Int]("merge_rank"), r.getAs[String]("left_sym"),
        r.getAs[String]("right_sym"), r.getAs[Long]("pair_freq"))).toSet
    assert(key(Tokenizer.bpeTrain(docs.repartition(13), 4))
      == key(Tokenizer.bpeTrain(docs, 4)))
  }
}
