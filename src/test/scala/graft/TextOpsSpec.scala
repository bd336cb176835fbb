package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def docs(texts: (Long, String)*) =
    texts.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("quality percentiles: endpoints per language, monotone in quality, singleton lang = 0") {
    val fixture = graft.sources.Tables.documents(spark, TestSession.sf)
      .limit(40).union(
        Seq((9001L, "zz solo doc", "xx", "s", 11L))
          .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = graft.operators.TextOps.qualityPercentileByLang(fixture).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("quality"), r.getAs[Long]("pct_ppm")))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      if (rs.length == 1) assert(rs.head._4 == 0L, s"singleton $lang must score 0")
      else {
        assert(rs.map(_._4).min == 0L && rs.map(_._4).max == 1000000L,
          s"$lang endpoints must hit 0 and 1e6")
        // percentile order must agree with (quality, doc_id) order
        val sorted = rs.sortBy(x => (x._3, x._2)).map(_._4)
        assert(sorted.zip(sorted.tail).forall { case (a, b) => a < b },
          s"$lang percentiles not strictly increasing in quality order")
      }
    }
    assert(rows.count(_._1 == "xx") == 1)
  }

  test("normalize: lowercase, strip punctuation, collapse whitespace") {
    val out = TextOps.normalize(docs(1L -> "  Hello,   WORLD!! x-1  "))
      .head().getString(1)
    assert(out == "hello world x 1")
  }

  test("curation manifest: every reason code reachable, first-failing order, keep iff kept") {
    // One engineered document per drop reason. URL synthesis keys on doc_id
    // (host = id%6, path = id%50), so ids are chosen to control the URL
    // gates: ids ≡ 2,3 (mod 6) land on the blocked news-site.org domain,
    // ≡ 4 on blocked shop.example.com; 0 and 300 share canonical
    // example.com/p/0 (url-dup pair); 0 and 97 are benchmark members
    // (id % 97 == 0).
    val keptText = "the a data query table fast engine runs the a data query " +
      "table fast while alpha beta gamma delta epsilon zeta"
    val nearA = "the a data query table fast data query table fast the a " +
      "quick brown fox jumps over lazy dog near river bank under bright morning sun today"
    val fixture = Seq(
      0L -> "the a benchmark probe sequence alpha beta gamma delta",  // benchmark
      300L -> "totally unique filler text for the url duplicate case", // url_duplicate (loses /p/0 to doc 0)
      2L -> "another unique document text that lands on a blocked host", // blocked_domain
      1L -> keptText,                                                  // kept
      7L -> keptText,                                                  // exact_duplicate of 1
      5L -> nearA,                                                     // survivor of the near-dup pair
      11L -> (nearA.split(" ").dropRight(1).mkString(" ") + " now"), // near_duplicate (shorter variant → lower quality → 5 survives)
      97L -> "zulu yankee xray whiskey victor uniform tango sierra romeo quebec", // benchmark (held-out source)
      24L -> ("the a zulu yankee xray whiskey victor papa oscar november " +
        "mike lima kilo juliet india hotel golf"),                     // contaminated (5-gram from 97)
      6L -> "hi yo",                                                   // gopher_rules (2 tokens)
      12L -> "the a dup data query table fast data query engine",      // wordlist (1/10 hits = cap)
      13L -> "der die das und ist the a haus berg tal wald fluss",     // language (de)
      18L -> "the the the the a a a a xerox xerox",                    // low_quality
      19L -> "the a small mountain river forest valley stone cloud garden summer winter morning evening" // model_quality
    ).map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val m = TextOps.curationManifest(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val expected = Map(
      0L -> "benchmark", 300L -> "url_duplicate", 2L -> "blocked_domain",
      1L -> "kept", 7L -> "exact_duplicate", 5L -> "kept",
      11L -> "near_duplicate", 97L -> "benchmark", 24L -> "contaminated",
      6L -> "gopher_rules", 12L -> "wordlist", 13L -> "language",
      18L -> "low_quality", 19L -> "model_quality")
    expected.foreach { case (id, reason) =>
      assert(m(id).getAs[String]("drop_reason") == reason,
        s"doc $id: expected $reason, got ${m(id).getAs[String]("drop_reason")}")
    }
    // every declared reason code is exercised by the fixture
    assert(TextOps.curationReasons.toSet.subsetOf(
      m.values.map(_.getAs[String]("drop_reason")).toSet))
    // keep ⟺ drop_reason == kept, everywhere
    m.values.foreach { r =>
      assert(r.getAs[Boolean]("keep") == (r.getAs[String]("drop_reason") == "kept"))
    }
    // the funnel is exactly the manifest's reason histogram
    val funnel = TextOps.curationFunnel(fixture).collect()
      .map(r => r.getAs[String]("drop_reason") -> r.getAs[Long]("n_docs")).toMap
    val hist = m.values.groupBy(_.getAs[String]("drop_reason"))
      .map { case (k, v) => k -> v.size.toLong }
    assert(funnel == hist)
  }

  test("training manifest: one row per doc; keep is exactly the documented conjunction") {
    val fixture = graft.sources.Tables.documents(spark, TestSession.sf)
    val m = TextOps.trainingManifest(fixture).collect()
    assert(m.length == fixture.count())
    m.foreach { r =>
      val expect = r.getAs[Boolean]("is_canonical") &&
        r.getAs[Boolean]("is_cluster_survivor") &&
        r.getAs[String]("lang_pred") == "en" && r.getAs[Double]("quality") >= 0.5
      assert(r.getAs[Boolean]("keep") == expect, s"doc ${r.getAs[Long]("doc_id")}")
      assert(Set("train", "val", "test").contains(r.getAs[String]("split")))
    }
    assert(m.exists(_.getAs[Boolean]("keep")))
    assert(m.exists(!_.getAs[Boolean]("keep")))
  }

  test("incremental training manifest vs stored state equals the full manifest on the batch") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    def manifestKey(r: org.apache.spark.sql.Row) = r.getAs[Long]("doc_id") ->
      (r.getAs[Boolean]("is_canonical"), r.getAs[Double]("quality"),
        r.getAs[String]("lang_pred"), r.getAs[Long]("cluster_id"),
        r.getAs[Boolean]("is_cluster_survivor"), r.getAs[String]("split"),
        r.getAs[Boolean]("model_keep"), r.getAs[Boolean]("keep"))
    def incrementalVsFull(fixture: org.apache.spark.sql.DataFrame) = {
      val hist = fixture.filter(pmod(col("doc_id"), lit(7)) =!= 0)
      val batch = fixture.filter(pmod(col("doc_id"), lit(7)) === 0)
      val idx = graft.operators.Dedup.minhashIndex(hist)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val labels = graft.operators.Dedup.clusters(hist)
      val got = TextOps.trainingManifestIncremental(batch, labels,
        graft.operators.Dedup.clusterSurvivors(hist, labels)
          .select(col("cluster_id"), col("survivor_id"), col("survivor_quality")),
        graft.operators.Dedup.exactGroups(hist)
          .select(col("text_key"), col("canonical_id")),
        idx).collect()
      val want = TextOps.trainingManifest(fixture)
        .filter(pmod(col("doc_id"), lit(7)) === 0).collect()
      assert(got.nonEmpty)
      assert(got.map(manifestKey).toMap == want.map(manifestKey).toMap)
      idx.unpersist()
      got
    }
    // Engineered fixture: the sf fixtures have NO exact copies straddling
    // the history/batch boundary, so the cross-document gates (stored
    // canonicity probe, survivorship against stored cluster bests) would
    // pass vacuously on real data alone. Identical copies double as both
    // gates: same text → same quality → the (quality desc, id asc)
    // tie-break decides survivorship deterministically.
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
      "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omi", "pi", "rho",
      "sigma")
    def gen(seed: Int, n: Int = 50): String =
      (0 until n).map(i => vocab((i * 7 + seed * 13 + i * i * seed) % vocab.size))
        .mkString(" ")
    val a = gen(1)
    val nearA = { val ws = a.split(" "); ws(25) = "CHANGED"; ws.mkString(" ") }
    val nearA2 = { val ws = a.split(" "); ws(30) = "OTHER"; ws.mkString(" ") }
    val y = gen(5)
    val eng = docs(
      1L -> a, 7L -> a,            // batch 7 = exact copy: loses canonicity
      2L -> nearA, 21L -> nearA2,  // near-dups joining the {1,7} cluster
      14L -> y, 15L -> y,          // batch 14 beats history 15 on id
      3L -> gen(9),                // history singleton
      28L -> gen(11))              // batch singleton
    val got = incrementalVsFull(eng).map(manifestKey).toMap
    // gate coverage, both directions of each cross-document decision:
    val g7 = got(7L); val g14 = got(14L); val g28 = got(28L)
    assert(!g7._1, "batch exact copy of an older stored doc is non-canonical")
    assert(!g7._5, "batch copy loses survivorship to the identical older doc")
    assert(g14._1, "batch doc with the smaller id beats the stored owner")
    assert(g14._5 && got(14L)._4 == 14L,
      "batch doc wins survivorship of its 2-doc cluster on the id tie-break")
    assert(g7._4 == 1L, "copy clusters under the full-corpus min id")
    assert(g28._1 && g28._5, "unrelated batch doc: canonical self-survivor")
    // breadth: the same contract on the real sf fixture (no engineered dups,
    // but real quality/cluster variety)
    incrementalVsFull(graft.sources.Tables.documents(spark, TestSession.sf))
  }

  test("quality model: hand-computed linear score, clamping, gate, calibration grain") {
    // "the the data slow x": 2·30000 + 20000 − 25000 = 55000 term sum;
    // 5 tokens → +1000 length credit; bias 100000 → 156000, below the gate
    val low = "the the data slow x"
    // 10 repeats of six heavyweight terms: term sum 1 120 000 → clamps to 1e6
    val high = (1 to 10).map(_ => "the a data query table fast").mkString(" ")
    val scored = TextOps.qualityModelScore(docs(1L -> low, 2L -> high)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("score_ppm"), r.getAs[Int]("model_keep"))).toMap
    assert(scored(1L) == ((156000L, 0)))
    assert(scored(2L) == ((1000000L, 1)))
    val cal = TextOps.qualityModelCalibration(docs(1L -> low, 2L -> high)).collect()
    assert(cal.map(_.getAs[Long]("bucket")).toSet == Set(1L, 9L))
    assert(cal.forall(_.getAs[Long]("n_docs") == 1L))
    // manifest carries the model gate column alongside the heuristic keep
    val m = TextOps.trainingManifest(docs(1L -> low, 2L -> high)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("model_keep")).toMap
    assert(m == Map(1L -> false, 2L -> true))
  }

  test("bigram lm: conditional probabilities normalize per first token, count-desc order") {
    // "a b a b" → (a b)×2, (b a)×1; "a c" → (a c)×1. P(·|a) over 3 starts.
    val out = TextOps.bigramLm(docs(1L -> "a b a b", 2L -> "a c")).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("n"), r.getAs[Double]("p")))
    assert(out.toSeq == Seq(
      ("a", "b", 2L, 2.0 / 3), ("a", "c", 1L, 1.0 / 3), ("b", "a", 1L, 1.0)))
    // k caps the table deterministically
    assert(TextOps.bigramLm(docs(1L -> "a b a b", 2L -> "a c"), k = 1).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("a", "b")))
  }

  test("bigram fluency: seen transitions score high, unique ones low; short docs out") {
    // corpus: (a b)×2, (b a)×1, (a c)×1 → P(b|a)=2/3, P(c|a)=1/3, P(a|b)=1
    val out = TextOps.bigramFluency(
      docs(1L -> "a b a b", 2L -> "a c", 3L -> "solo")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_conf_ppm"),
          r.getAs[Long]("mean_conf_ppm")))).toMap
    // doc 1 bigrams: (a b) 666666, (b a) 1000000, (a b) 666666
    assert(out(1L) == ((3L, 2333332L, 777777L)))
    // doc 2: the rarer transition alone
    assert(out(2L) == ((1L, 333333L, 333333L)))
    // a 1-token doc has no transitions — absent, not zero-scored
    assert(!out.contains(3L))
    // the templated doc outscores the rare-transition doc
    assert(out(1L)._3 > out(2L)._3)
  }

  test("lang mismatch: confident disagreements count, unknown abstains") {
    import spark.implicits._
    // doc 1: English text declared 'en' (agree); doc 2: English text
    // declared 'de' (mismatch); doc 3: no marker words (unknown — abstains
    // even though declared 'fr')
    val d = Seq(
      (1L, "the quick and the lazy with many of those words", "en", "webA", 0L),
      (2L, "the quick and the lazy with many of those words", "de", "webA", 0L),
      (3L, "zzz qqq xxx", "fr", "webB", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.langMismatch(d).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_mismatch"),
          r.getAs[Long]("mismatch_ppm")))).toMap
    assert(out("webA") == ((2L, 1L, 500000L)), s"got ${out("webA")}")
    assert(out("webB") == ((1L, 0L, 0L)), s"got ${out("webB")}")
  }

  test("ngram novelty: first-seen credit by doc order; duplicates add nothing") {
    // doc 1 introduces all its 5-grams; doc 2 is an exact copy (novelty 0);
    // doc 3 shares a 4-word overlap but introduces its shifted grams
    val a = "q w e r t y u"
    val d = docs(1L -> a, 2L -> a, 3L -> ("z " + a))
    val out = TextOps.ngramNovelty(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"),
          r.getAs[Long]("novelty_ppm")))).toMap
    // 7 words → 3 distinct 5-grams; doc 1 owns them all
    assert(out(1L) == ((3L, 3L, 1000000L)), s"got ${out(1L)}")
    // the exact copy introduces nothing
    assert(out(2L) == ((3L, 0L, 0L)))
    // "z q w e r t y u" → 4 grams, 3 shared with doc 1, 1 novel ("z q w e r")
    assert(out(3L) == ((4L, 1L, 250000L)), s"got ${out(3L)}")
  }

  test("lm commonness: mean corpus frequency and rare-token fraction, exact arithmetic") {
    // vocab: a→3, b→1, c→1 (b and c are "rare" at the ≤2 threshold; a is not)
    val out = TextOps.lmCommonness(docs(1L -> "a a b", 2L -> "a c")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("sum_cf"), r.getAs[Double]("mean_cf"),
          r.getAs[Long]("n_rare"), r.getAs[Double]("rare_frac")))).toMap
    assert(out(1L) == ((3L, 7L, 7.0 / 3, 1L, 1.0 / 3)))
    assert(out(2L) == ((2L, 4L, 2.0, 1L, 0.5)))
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

  test("split assign: deterministic, content-keyed, partitions the corpus") {
    val d = docs((1L to 200L).map(i => i -> s"doc number $i"): _*)
    val a1 = TextOps.splitAssign(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val a2 = TextOps.splitAssign(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(a1 == a2, "split must be deterministic across runs")
    assert(a1.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(a1.values.count(_ == "train") > a1.values.count(_ == "test"),
      "train bucket range is 18x the test range")
    // growing the corpus never migrates an existing doc's split
    val grown = TextOps.splitAssign(docs((1L to 400L).map(i => i -> s"doc number $i"): _*))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(a1.forall { case (id, s) => grown(id) == s })
  }

  test("mixture sample: per-source rates honored, membership stable under growth") {
    def corpus(n: Long) = (1L to n).map(i => (i, s"doc $i", "en", "src" + (i % 4), 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val weights = Seq("src0" -> 100, "src1" -> 50, "src2" -> 0) // src3 not in the recipe
    val kept = TextOps.mixtureSample(corpus(400), weights).collect()
    val bySrc = kept.groupBy(_.getAs[String]("source")).view.mapValues(_.length).toMap
    assert(bySrc("src0") == 100, "a 100% source keeps every doc")
    assert(!bySrc.contains("src2"), "a 0% source keeps nothing")
    assert(!bySrc.contains("src3"), "a source absent from the recipe is dropped")
    val r1 = bySrc.getOrElse("src1", 0)
    assert(r1 > 25 && r1 < 75, s"src1 kept $r1 of 100 docs; target rate is 50%")
    // growing the corpus never revokes or changes an existing doc's membership
    val keptIds = kept.map(_.getAs[Long]("doc_id")).toSet
    val grownIds = TextOps.mixtureSample(corpus(800), weights).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(grownIds.filter(_ <= 400) == keptIds)
  }

  test("global shuffle: shards partition the corpus; dense positions; order is not id order") {
    val d = docs((1L to 200L).map(i => i -> s"doc $i"): _*)
    val rows = TextOps.globalShuffle(d).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"), r.getAs[Long]("pos")))
    assert(rows.map(_._1).toSet == (1L to 200L).toSet, "every doc lands in exactly one shard")
    val byShard = rows.groupBy(_._2)
    byShard.foreach { case (shard, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length.toLong),
        s"shard $shard positions must be dense 1..n")
    }
    assert(byShard.size == TextOps.shuffleShards, "200 hashed docs reach all 8 shards")
    // a shuffle, not a sort: at least one shard's hash order inverts the id order
    assert(byShard.values.exists { rs =>
      val inOrder = rs.sortBy(_._3).map(_._1).toSeq
      inOrder != inOrder.sorted
    }, "positions must follow the hash permutation, not doc_id order")
    val again = TextOps.globalShuffle(d).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"), r.getAs[Long]("pos")))
    assert(rows.toSet == again.toSet, "the permutation is reproducible")
  }

  test("repetition: duplicate and top-bigram fractions; short docs excluded") {
    val d = docs(1L -> "a b a b a b", 2L -> "u v w x", 3L -> "solo")
    val r = TextOps.repetitionStats(d).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(!r.contains(3L), "single-token doc has no bigrams")
    // doc 1: bigrams (a b)x3, (b a)x2 → 5 total, 2 distinct, top 3
    assert(r(1L).getAs[Long]("n_bigrams") == 5L)
    assert(r(1L).getAs[Long]("n_distinct_bigrams") == 2L)
    assert(math.abs(r(1L).getAs[Double]("dup_bigram_frac") - 0.6) < 1e-12)
    assert(math.abs(r(1L).getAs[Double]("top_bigram_frac") - 0.6) < 1e-12)
    // doc 2: all distinct → dup fraction 0
    assert(r(2L).getAs[Double]("dup_bigram_frac") == 0.0)
  }

  test("collocations: exclusive pairs outrank promiscuous ones by lift") {
    val texts = (1 to 5).map(i => i.toLong -> "alpha beta common x common y") ++
      Seq(6L -> "common z common w common v")
    val c = TextOps.collocations(docs(texts: _*), k = 10, minCount = 5).collect()
      .map(r => ((r.getAs[String]("w1"), r.getAs[String]("w2")), r.getAs[Double]("lift")))
    val m = c.toMap
    // "alpha beta" co-occur ONLY with each other (c1=c2=c12=5) → top lift
    assert(c.head._1 == ("alpha", "beta"))
    assert(m(("alpha", "beta")) > m.getOrElse(("common", "x"), 0.0))
  }

  test("decontaminate: flags only corpus docs sharing an n-gram with the benchmark") {
    // doc 0 is benchmark (0 % 97 == 0); doc 1 shares its 5-gram, doc 2 doesn't
    val d = docs(
      0L -> "one two three four five six",
      1L -> "zz one two three four five",
      2L -> "totally different words here entirely")
    val hits = TextOps.decontaminate(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hits")).toMap
    assert(hits.keySet == Set(1L))
    assert(hits(1L) == 1L) // exactly the shared "one two three four five"
  }

  test("redact pii: emails and long digit runs masked, counts kept") {
    val d = docs(1L -> "mail me at jo.doe@example.com or call 5551234567 ext 12")
    val r = TextOps.redactPii(d).head()
    assert(r.getAs[Long]("n_emails") == 1L)
    assert(r.getAs[Long]("n_long_nums") == 1L) // "12" is below the 4-digit floor
    val t = r.getAs[String]("text_redacted")
    assert(t.contains("<EMAIL>") && t.contains("<NUM>") && t.contains("ext 12"))
    assert(!t.contains("example.com") && !t.contains("5551234567"))
    // mixed case must not escape; digits consumed by the email mask must not
    // inflate the digit-run audit count
    val r2 = TextOps.redactPii(docs(2L -> "Reach John.Doe42@Example.COM or 98765432")).head()
    assert(r2.getAs[Long]("n_emails") == 1L)
    assert(r2.getAs[Long]("n_long_nums") == 1L) // only the bare run, not 42
    val t2 = r2.getAs[String]("text_redacted")
    assert(!t2.toLowerCase.contains("example.com") && !t2.contains("98765432"))
    assert(t2 == "Reach <EMAIL> or <NUM>")
  }

  test("pack chunks: exclusive prefix sum assigns budget-sized packs per shard") {
    // 3 docs of 300 "tokens" each (single-char words), budget 512:
    // cum_before = 0, 300, 600 → packs 0, 0, 1; separate source restarts at 0
    val text300 = Seq.fill(300)("x").mkString(" ")
    val d = Seq((1L, "s0"), (2L, "s0"), (3L, "s0"), (9L, "s1"))
      .map { case (id, src) => (id, text300, "en", src, text300.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val p = TextOps.packChunks(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_tokens"), r.getAs[Long]("pack_id"))).toMap
    assert(p(1L) == ((300L, 300L, 0L)))
    assert(p(2L) == ((300L, 600L, 0L))) // starts at offset 300, still pack 0
    assert(p(3L) == ((300L, 900L, 1L))) // starts at offset 600 → pack 1
    assert(p(9L) == ((300L, 300L, 0L))) // other shard packs independently
  }

  test("quota per source: caps each source at the quota, keeps lowest ids") {
    val d = Seq((1L, "big"), (2L, "big"), (3L, "big"), (4L, "small"))
      .map { case (id, src) => (id, "t", "en", src, 1L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val q = TextOps.quotaPerSource(d, quota = 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Long]("src_rank")))
    assert(q.sortBy(_._1).toSeq == Seq((1L, "big", 1L), (2L, "big", 2L), (4L, "small", 1L)))
  }

  test("quota per source: bounded aggregator formulation matches the window oracle") {
    val docs = graft.sources.Tables.documents(spark, TestSession.sf)
    val window = TextOps.quotaPerSource(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Long]("src_rank")))
      .toSet
    val agg = TextOps.quotaPerSourceAgg(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Long]("src_rank")))
      .toSet
    assert(agg == window)
  }

  test("bloom decontamination: superset of exact hits, per-doc counts never lower") {
    val docs = graft.sources.Tables.documents(spark, TestSession.sf)
    val exact = TextOps.decontaminate(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hits")).toMap
    val bloom = TextOps.decontaminateBloom(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hits")).toMap
    // structural guarantee: no false negatives — every exact hit flagged,
    // with at least as many gram hits
    exact.foreach { case (d, n) =>
      assert(bloom.contains(d), s"doc $d flagged by exact but missed by bloom")
      assert(bloom(d) >= n, s"doc $d: bloom ${bloom(d)} < exact $n hits")
    }
    // at fixture scale the deterministic hashes produce no false positive,
    // so the flag sets coincide outright
    assert(bloom == exact)
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

  test("dup ngram fraction: shared vs unique 5-grams, short docs excluded") {
    // doc 1: grams {a b c d e, b c d e f}; doc 2 shares only the first;
    // doc 3 is fully unique; doc 4 is too short to have any 5-gram
    val d = docs(
      1L -> "a b c d e f",
      2L -> "a b c d e x",
      3L -> "p q r s t u",
      4L -> "too short")
    val out = TextOps.dupNgramFraction(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_shared"),
          r.getAs[Double]("dup_frac"))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((2L, 0L, 0.0)))
  }

  test("corpus health: dup and quality counts roll up per source") {
    val good = (1 to 60).map(i => if (i % 7 == 0) "the" else s"w$i").mkString(" ")
    val d = Seq(
      (1L, good, "en", "a", good.length.toLong),
      (2L, good, "en", "a", good.length.toLong),  // exact duplicate of 1
      (3L, "zz zz", "de", "a", 5L),
      (4L, "yy yy", "en", "b", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val h = TextOps.corpusHealth(d).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_dup_docs"),
          r.getAs[Long]("n_langs"), r.getAs[Double]("avg_chars"))))
      .toMap
    val aChars = (2 * good.length + 5).toDouble / 3
    assert(h("a") == ((3L, 2L, 2L, aChars)))
    assert(h("b") == ((1L, 0L, 1L, 5.0)))
    // both copies of the good doc clear the threshold; the short ones don't
    val nq = TextOps.corpusHealth(d).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_quality_docs")).toMap
    assert(nq == Map("a" -> 2L, "b" -> 0L))
  }

  test("heavy hitters: CMS never undercounts, exact without collisions, hot token leads") {
    // wide sketch, 3-token vocab → no bucket collisions → est IS exact
    val small = docs(1L -> "a a a b b c", 2L -> "b c c")
    val est = TextOps.heavyHittersApprox(small, k = 10).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("est_count")).toMap
    assert(est == Map("a" -> 3L, "b" -> 3L, "c" -> 3L))

    // forced saturation: w = 2 buckets, hot token (freq 500) + 360 rare
    // singletons, real partial merges via repartition(8). CMS guarantees
    // are one-sided the OTHER way from Misra-Gries:
    //  - every estimate >= its true count (collisions only ever add mass),
    //  - est <= total mass (a counter can never exceed N = 860),
    //  - the true heavy hitter is NEVER displaced from the report head:
    //    any token beating est("hot") shares hot's bucket in EVERY row, so
    //    its estimate equals hot's and 'hot' < 'rareNNN' wins the tie.
    val hot = Seq.fill(500)("hot") ++ (1 to 360).map(i => s"rare$i")
    val corpus = docs(hot.zipWithIndex.map { case (w, i) =>
      (i + 1).toLong -> w }: _*).repartition(8)
    val n = hot.size.toLong
    val rep = TextOps.heavyHittersApprox(corpus, d = 4, w = 2, k = 8).collect()
    val sat = rep.map(r => r.getAs[String]("token") -> r.getAs[Long]("est_count")).toMap
    assert(rep.head.getAs[String]("token") == "hot",
      s"true heavy hitter displaced from the report head: ${rep.toSeq}")
    assert(sat("hot") >= 500L && sat("hot") <= n,
      s"estimate ${sat("hot")} outside [500, $n]")
    val truth = Map("hot" -> 500L).withDefaultValue(1L)
    for ((t, e) <- sat)
      assert(e >= truth(t) && e <= n, s"$t: est $e vs true ${truth(t)} (N=$n)")
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

  test("source drift: symmetric two-source split yields equal TVD, exact ppm") {
    // source A: all 8-token docs (bucket 1); source B: all 80-token (bucket 10).
    // corpus is half/half, so each source's TVD = ½(|1e6−5e5| + |0−5e5|) = 5e5.
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val d = ((1 to 10).map(i => (i.toLong, words(8), "en", "A", 0L)) ++
      (11 to 20).map(i => (i.toLong, words(80), "en", "B", 0L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.sourceDrift(d).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("tvd_ppm"), r.getAs[Long]("n_buckets"))).toMap
    assert(out == Map("A" -> ((500000L, 2L)), "B" -> ((500000L, 2L))), s"got $out")
  }

  test("quality budget: kept set is the exact greedy prefix of quality order") {
    import org.apache.spark.sql.functions.{col, size, split}
    val docs = graft.sources.Tables.documents(spark, TestSession.sf)
    val kept = graft.operators.Relational.qualityBudgetSample(docs).collect()
    assert(kept.nonEmpty)
    assert(kept.forall(_.getAs[Long]("cum_tokens") <=
      graft.operators.Relational.qualityBudget), "budget is a hard ceiling")
    // the kept docs are a contiguous prefix of (quality desc, doc_id)
    val order = graft.operators.TextOps.qualityScore(docs)
      .join(docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n")), "doc_id")
      .select(col("doc_id"), col("quality"), col("n")).collect()
      .sortBy(r => (-r.getAs[Double]("quality"), r.getAs[Long]("doc_id")))
    val keptIds = kept.map(_.getAs[Long]("doc_id")).toSet
    val prefix = order.takeWhile(r => keptIds(r.getAs[Long]("doc_id")))
    assert(prefix.length == keptIds.size, "kept docs must form a greedy prefix")
    // maximality: the next doc in order would overflow the budget
    val used = prefix.map(_.getAs[Long]("n")).sum
    val next = order.drop(prefix.length).headOption
    next.foreach { r =>
      assert(used + r.getAs[Long]("n") > graft.operators.Relational.qualityBudget,
        "the first excluded doc must not have fit")
    }
  }

  test("temperature mixture: sqrt weights lift the small source; quotas stay within budget") {
    import spark.implicits._
    // big source: 100 docs x 100 tokens = 10000; small: 1 doc x 100 tokens
    val big = (0L until 100L).map(i => (i, ("w " * 100).trim, "en", "big", 0L))
    val small = Seq((900L, ("w " * 100).trim, "en", "small", 0L))
    val docs = (big ++ small).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.operators.TextOps.temperatureMixturePlan(docs, budget = 1000L)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out("big").getAs[Long]("src_tokens") == 10000L)
    assert(out("big").getAs[Long]("weight") == 100L)   // isqrt(10000)
    assert(out("small").getAs[Long]("weight") == 10L)  // isqrt(100)
    // natural share of small = 100/10100 ≈ 9900 ppm; temperature share =
    // 10/110 ≈ 90909 ppm — a ~9x lift; big is correspondingly damped
    assert(out("small").getAs[Long]("upsample_ppm") > 1000000L)
    assert(out("big").getAs[Long]("upsample_ppm") < 1000000L)
    assert(out("small").getAs[Long]("temperature_ppm") == 10L * 1000000L / 110L)
    // quotas: exact (B*w) div W via the split formula, and they never
    // overshoot the budget in total
    assert(out("big").getAs[Long]("quota_tokens") == 1000L * 100L / 110L)
    assert(out.values.map(_.getAs[Long]("quota_tokens")).sum <= 1000L)
  }

  test("dsir: target-like docs outweigh corpus-common docs; selection is the greedy budget prefix") {
    import spark.implicits._
    // target slice (en) speaks "alpha beta", the rest of the corpus speaks
    // "gamma delta"; one probe doc per dialect plus a too-short doc
    val en = (0L to 3L).map(i => (i, ("alpha beta " * 8).trim, "en", "s", 0L))
    val fr = (10L to 13L).map(i => (i, ("gamma delta " * 8).trim, "fr", "s", 0L))
    val probes = Seq(
      (20L, "alpha beta alpha beta", "fr", "s", 0L),  // target-dialect text
      (21L, "gamma delta gamma delta", "fr", "s", 0L), // corpus-common text
      (22L, "solo", "fr", "s", 0L))                    // <2 tokens: no bigrams
    val docs = (en ++ fr ++ probes)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.operators.Relational.dsirSample(docs, budget = 40L).collect()
    assert(out.length == docs.count(), "every doc keeps its audit row")
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(20L).getAs[Long]("weight_ppm") > byId(21L).getAs[Long]("weight_ppm"),
      "target-dialect probe must outweigh the corpus-common probe")
    assert(byId(22L).getAs[Long]("n_bigrams") == 0L &&
      byId(22L).getAs[Long]("weight_ppm") == 0L, "short doc scores zero, still present")
    // selected = exact greedy prefix of (weight desc, doc_id) under the budget
    val order = out.sortBy(r => (-r.getAs[Long]("weight_ppm"), r.getAs[Long]("doc_id")))
    var cum = 0L
    order.foreach { r =>
      cum += r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("cum_tokens") == cum, "prefix sum must match serial replay")
      assert(r.getAs[Boolean]("selected") == (cum <= 40L))
    }
  }

  test("vocab growth: verbatim copies add no types, cumsum runs exactly") {
    import spark.implicits._
    val a = (0 until 10).map(i => s"w$i").mkString(" ") // 6 distinct 5-grams
    val b = (0 until 10).map(i => s"v$i").mkString(" ")
    // doc 0 introduces a's grams (bucket 0); doc 25 is a verbatim copy of
    // doc 0 (adds nothing); doc 26 introduces b's grams (bucket 1)
    val docs = Seq((0L, a), (25L, a), (26L, b)).toDF("doc_id", "text")
    val r = TextOps.vocabGrowth(docs).collect()
      .map(x => x.getAs[Long]("bucket") ->
        (x.getAs[Long]("new_types"), x.getAs[Long]("cum_types"))).toMap
    assert(r == Map(0L -> ((6L, 6L)), 1L -> ((6L, 12L))), s"got $r")
  }

  test("chunk overlap: stride starts, clamped tail, no chunk inside its predecessor") {
    import spark.implicits._
    def text(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, text(40)), (2L, text(32)), (3L, text(33)), (4L, text(5)))
      .toDF("doc_id", "text")
    val out = TextOps.chunkOverlap(docs).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.sortBy(_.getAs[Long]("chunk_idx"))).toMap
    // 40 tokens: chunks at 0 (32 tokens) and 16 (24 tokens) — the 2nd
    // reaches the end, so no 3rd chunk fully inside it
    assert(out(1L).map(r => (r.getAs[Long]("start_pos"), r.getAs[Long]("n_chunk_tokens")))
      .toSeq == Seq((0L, 32L), (16L, 24L)))
    // consecutive chunks overlap by window - stride = 16 tokens
    val c0 = out(1L)(0).getAs[String]("chunk_text").split(" ")
    val c1 = out(1L)(1).getAs[String]("chunk_text").split(" ")
    assert(c0.drop(16).toSeq == c1.take(16).toSeq)
    assert(out(2L).length == 1 && out(3L).length == 2)
    assert(out(3L)(1).getAs[Long]("n_chunk_tokens") == 17) // 33 - 16
    assert(out(4L).length == 1 &&
      out(4L)(0).getAs[String]("chunk_text") == text(5))
  }

  test("encoding audit: control / replacement / non-ascii counts and ascii ppm") {
    import spark.implicits._
    val docs = Seq(
      (1L, "clean ascii text"),
      (2L, "bad bytes"),       // 3 control chars
      (3L, "lossy � decode �"),         // 2 replacement chars
      (4L, "café naïve"),               // 2 non-ascii letters
      (5L, "")
    ).toDF("doc_id", "text")
    val out = TextOps.encodingAudit(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_control"), r.getAs[Long]("n_replacement"),
          r.getAs[Long]("n_non_ascii"), r.getAs[Long]("ascii_ppm"))).toMap
    assert(out(1L) == ((0L, 0L, 0L, 1000000L)))
    assert(out(2L)._1 == 3L)
    // U+FFFD is also non-ascii; the replacement count isolates the decode failure
    assert(out(3L)._2 == 2L && out(3L)._3 == 2L)
    assert(out(4L)._1 == 0L && out(4L)._3 == 2L)
    assert(out(4L)._4 == (8L * 1000000L) / 10L) // 10 chars, 2 non-ascii
    assert(out(5L) == ((0L, 0L, 0L, 1000000L))) // empty: clean by convention
  }

  test("padding waste: length-sorted batching beats arrival order on skewed lengths") {
    import spark.implicits._
    def text(n: Int) = (1 to n).map(_ => "w").mkString(" ")
    val docs = Seq((1L, text(10)), (2L, text(2)), (3L, text(10)), (4L, text(2)))
      .toDF("doc_id", "text")
    val out = TextOps.paddingWaste(docs, batch = 2).collect()
      .map(r => (r.getAs[String]("strategy"), r.getAs[Long]("batch_id")) ->
        (r.getAs[Long]("padding"), r.getAs[Long]("waste_ppm"))).toMap
    // arrival pairs (10,2) twice: 8 pad tokens per batch, 8/20 = 400000 ppm
    assert(out(("arrival", 0L)) == ((8L, 400000L)))
    assert(out(("arrival", 1L)) == ((8L, 400000L)))
    // sorted pairs (2,2) and (10,10): zero padding
    assert(out(("sorted", 0L)) == ((0L, 0L)))
    assert(out(("sorted", 1L)) == ((0L, 0L)))
  }

  test("url dedup: canonicalization collapses scheme/case/www/query/slash; first writer owns") {
    // doc 0  → http://www.Example.COM/p/0/?utm…  → example.com/p/0
    // doc 300 → http://www.Example.COM/p/0?utm…  → example.com/p/0   (dup of 0)
    // doc 1  → https://example.com/p/1           → example.com/p/1
    // doc 151 → https://example.com/p/1          → example.com/p/1   (dup of 1)
    // doc 9  → https://news-site.org/p/9?utm…    → news-site.org/p/9 (unique)
    val fixture = docs((0L, "x"), (1L, "x"), (9L, "x"), (151L, "x"), (300L, "x"))
    val out = TextOps.urlDedup(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("canonical_url"), r.getAs[Long]("n_dups"),
          r.getAs[Boolean]("is_url_canonical"))).toMap
    assert(out(0L) == (("example.com/p/0", 2L, true)))
    assert(out(300L) == (("example.com/p/0", 2L, false)))
    assert(out(1L) == (("example.com/p/1", 2L, true)))
    assert(out(151L) == (("example.com/p/1", 2L, false)))
    assert(out(9L) == (("news-site.org/p/9", 1L, true)))
    // raw urls keep the mess the canonicalizer must strip
    val raw = TextOps.urlDedup(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("url")).toMap
    assert(raw(0L) == "http://www.Example.COM/p/0/?utm_source=feed&sid=0")
    assert(raw(1L) == "https://example.com/p/1")
  }

  test("incremental url dedup vs a stored index equals the full recompute on the batch") {
    val fixture = docs((0L, "x"), (1L, "x"), (9L, "x"), (151L, "x"), (300L, "x"),
      (7L, "x"), (14L, "x"), (450L, "x"))
    def key(r: org.apache.spark.sql.Row) =
      r.getAs[Long]("doc_id") -> (r.getAs[String]("canonical_url"),
        r.getAs[Long]("n_dups"), r.getAs[Boolean]("is_url_canonical"))
    for (cut <- Seq(0L, 10L, 200L, 1000L)) { // empty, small, mid, full index
      val idx = TextOps.urlIndex(fixture.filter($"doc_id" < cut))
      val got = TextOps.incrementalUrlDedup(
        fixture.filter($"doc_id" >= cut), idx).collect().map(key).toMap
      val want = TextOps.urlDedup(fixture).collect().map(key).toMap
        .filter(_._1 >= cut)
      assert(got == want, s"cut=$cut: $got != $want")
    }
  }

  test("url domain stats: dup ppm per canonical domain") {
    // three docs on example.com (two URLs), one on news-site.org
    val fixture = docs((0L, "x"), (1L, "x"), (300L, "x"), (9L, "x"))
    val out = TextOps.urlDomainStats(fixture).collect()
      .map(r => r.getAs[String]("domain") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_urls"),
          r.getAs[Long]("dup_ppm"))).toMap
    assert(out("example.com") == ((3L, 2L, 333333L)))
    assert(out("news-site.org") == ((1L, 1L, 0L)))
  }

  test("gopher rules: each of the five rules trips on its constructed doc") {
    val fixture = docs(
      (1L, "the cat sat on a mat"),          // all rules pass
      (2L, "12 34 56 78 xx"),                // numeric + alpha + stopword fail
      (3L, "ab cd"),                          // too few tokens
      (4L, "the a of incomprehensibilities"), // mean word len 34/4 > 12… check
      (5L, "the a b c d"))                    // mean word len 9/5 < 2
    val out = TextOps.gopherRules(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("r_tokens"), r.getAs[Boolean]("r_word_len"),
          r.getAs[Boolean]("r_alpha"), r.getAs[Boolean]("r_numeric"),
          r.getAs[Boolean]("r_stopwords"), r.getAs[Boolean]("pass"))).toMap
    assert(out(1L) == ((true, true, true, true, true, true)))
    // doc 2: 5 tokens, 4 numeric (4*5=20 > 5 → fail), alpha 1*5=5 < 4*5 → fail
    assert(out(2L)._4 == false && out(2L)._3 == false && out(2L)._5 == false)
    assert(out(3L)._1 == false) // 2 tokens < 3
    // doc 4: 4 tokens sum_len 3+1+2+22=28 ≤ 48 → passes word_len; verify doc 5 trips low bound
    assert(out(4L)._2 == true)
    // doc 5: 5 tokens sum_len 3+1+1+1+1=7 < 10 → r_word_len false
    assert(out(5L)._2 == false && out(5L)._6 == false)
  }

  test("wordlist filter: hit ppm against the blocklist and the keep gate") {
    val fixture = docs(
      (1L, "clean words only here"),               // 0 hits → keep
      (2L, "dup dup slow big and six more words x"), // 4 hits / 9 tokens = 444444 ppm → drop
      (3L, "one dup in twelve words a b c d e f g")) // 1/12 = 83333 ppm < 100000 → keep
    val out = TextOps.wordlistFilter(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_hits"), r.getAs[Long]("hit_ppm"),
          r.getAs[Int]("wl_keep"))).toMap
    assert(out(1L) == ((0L, 0L, 1)))
    assert(out(2L) == ((4L, 444444L, 0)))
    assert(out(3L) == ((1L, 83333L, 1)))
  }

  test("domain filter: blocklisted canonical domains drop, others keep") {
    // doc_id % 6 picks the host: 1 → example.com (keep), 2 → news-site.org
    // (blocked), 4 → Shop.Example.com → shop.example.com (blocked),
    // 9 → WWW.news-site.org → news-site.org (blocked via canonicalization)
    val fixture = docs((1L, "x"), (2L, "x"), (4L, "x"), (9L, "x"))
    val out = TextOps.domainFilter(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("domain"), r.getAs[Int]("dom_keep"))).toMap
    assert(out(1L) == (("example.com", 1)))
    assert(out(2L) == (("news-site.org", 0)))
    assert(out(4L) == (("shop.example.com", 0)))
    assert(out(9L) == (("news-site.org", 0)), "www. strip must hit the blocklist")
  }

  test("mixture gap: pct-100 keeps everything; shares consistent with the sample") {
    val fixture = Seq(
      (1L, "a b c d", "en", "src0", 7L), (2L, "e f g h", "en", "src0", 7L),
      (3L, "i j k l", "en", "src1", 7L), (4L, "m n o p", "en", "src1", 7L),
      (5L, "q r s t", "en", "src1", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.mixtureGap(fixture).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("src_tokens"), r.getAs[Long]("kept_tokens"),
          r.getAs[Long]("expected_ppm"), r.getAs[Long]("achieved_ppm"),
          r.getAs[Long]("gap_ppm"))).toMap
    // src0 has pct 100 in the spec → every token kept
    assert(out("src0")._1 == 8L && out("src0")._2 == 8L)
    // expected shares: src0 = 100*8, src1 = 60*12 → 800/1520, 720/1520
    assert(out("src0")._3 == 800L * 1000000L / 1520L)
    assert(out("src1")._3 == 720L * 1000000L / 1520L)
    // kept tokens agree with what mixtureSample actually keeps
    val keptIds = TextOps.mixtureSample(fixture).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val keptSrc1 = Seq(3L, 4L, 5L).count(keptIds.contains) * 4L
    assert(out("src1")._2 == keptSrc1)
    out.values.foreach(v => assert(v._5 == v._4 - v._3))
  }

  test("epoch plan: repeat factor capped, planned yield and shortfall exact") {
    // budget 100000, Σpct = 1000 → targets: src0 (pct 100) = 10000 tokens,
    // src1 (pct 60) = 6000. Both tiny sources cap at 4 epochs.
    val fixture = Seq(
      (1L, "a b c d", "en", "src0", 7L), (2L, "e f g h", "en", "src0", 7L),
      (3L, "i j k l", "en", "src1", 7L), (4L, "m n o p", "en", "src1", 7L),
      (5L, "q r s t", "en", "src1", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.epochPlan(fixture).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("src_tokens"), r.getAs[Long]("target_tokens"),
          r.getAs[Long]("epochs_x1000"), r.getAs[Long]("planned_tokens"),
          r.getAs[Long]("shortfall_tokens"))).toMap
    assert(out("src0") == ((8L, 10000L, 4000L, 32L, 9968L)))
    assert(out("src1") == ((12L, 6000L, 4000L, 48L, 5952L)))
  }

  test("lang segments: bilingual doc flags the confident minority half") {
    // fillers must dodge every marker list ("y" is a Spanish marker!)
    val en16 = "the the the the" + " x" * 12
    val fr16 = "le le le le" + " q" * 12
    val fixture = docs(
      (1L, s"$en16 $fr16"),   // 2 segments: en then fr; doc-level pred = en
      (2L, en16),              // 1 segment, pure en
      (3L, "z z z"))           // 1 segment, no markers anywhere → unknown
    val out = TextOps.langSegments(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("lang_pred"), r.getAs[Long]("n_segments"),
          r.getAs[Long]("n_agree"), r.getAs[Long]("n_unknown"),
          r.getAs[Long]("switch_ppm"))).toMap
    assert(out(1L) == (("en", 2L, 1L, 0L, 500000L)),
      s"half the segments confidently disagree: ${out(1L)}")
    assert(out(2L) == (("en", 1L, 1L, 0L, 0L)))
    assert(out(3L) == (("unknown", 1L, 0L, 1L, 0L)),
      "unknown segments abstain — never counted as agreement or switching")
  }

  test("pack stats: doc/token totals per pack and the straddle flag") {
    // budget 8; token counts 3,4,5,2 → cum 3,7,12,14; packs 0,0,0,1
    val fixture = docs((1L, "aa bb cc"), (2L, "dd ee ff gg"),
      (3L, "hh ii jj kk ll"), (4L, "mm nn"))
    val out = TextOps.packStats(fixture, budget = 8).collect()
      .map(r => r.getAs[Long]("pack_id") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("pack_tokens"),
          r.getAs[Boolean]("straddles_next"))).toMap
    assert(out(0L) == ((3L, 12L, true)), "pack 0 ends at 12 > 8: straddles")
    assert(out(1L) == ((1L, 2L, false)), "pack 1 ends at 14 <= 16: clean")
  }
}
