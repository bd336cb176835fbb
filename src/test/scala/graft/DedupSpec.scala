package graft

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

/** Mechanism tests for the dedup / similarity family on synthetic inputs with
  * known duplicate structure (fixture data has few real near-dups at small SF).
  */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
    "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omi", "pi", "rho", "sigma")

  private def doc(seed: Int, n: Int = 50): String =
    (0 until n).map(i => vocab((i * 7 + seed * 13 + i * i * seed) % vocab.size)).mkString(" ")

  // 0 and 1 identical; 2 is a near-dup of 0 (one word changed); 3 unrelated.
  private val base = doc(1)
  private val near = {
    val ws = base.split(" "); ws(25) = "CHANGED"; ws.mkString(" ")
  }
  private val docs = Seq(
    (0L, base, "en", "s0", base.length.toLong),
    (1L, base, "en", "s1", base.length.toLong),
    (2L, near, "en", "s2", near.length.toLong),
    (3L, doc(9), "en", "s3", 0L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("exact dedup: identical texts collapse to min doc_id") {
    val g = Dedup.exactGroups(docs).filter($"n_copies" > 1).collect()
    assert(g.length == 1 && g.head.getAs[Long]("canonical_id") == 0L
      && g.head.getAs[Long]("n_copies") == 2L)
    val survivors = Dedup.exactSurvivors(docs).collect().map(_.getLong(0)).sorted
    assert(survivors.toSeq == Seq(0L, 2L, 3L))
  }

  test("minhash LSH finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minhashPairs(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("jaccard")))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 1L))) // identical: every band collides, j = 1
    assert(pairs.find(p => (p._1, p._2) == ((0L, 1L))).get._3 == 1.0)
    assert(keys.contains((0L, 2L)) && keys.contains((1L, 2L))) // near-dup, j ≈ 0.88
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated never paired
  }

  test("simhash: identical docs have distance 0; near-dups small; pairs found") {
    val sh = Dedup.simhashDocs(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sh(0L) == sh(1L))
    val pairs = Dedup.simhashPairs(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Int]("hamming")))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 0))
  }

  test("ivf train step: per-cell means over the actual assignment, exact") {
    // axis-aligned vectors: v2 assigns to cell 0 (dot 0.9 with c0 beats 0.81
    // with itself), v3 to cell 1 — the means must follow the assignment
    val embs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.9f, 0.0f)), (3L, Array(0.0f, 0.9f)))
      .toDF("vec_id", "embedding")
    val step = Similarity.ivfTrainStep(embs).collect()
      .map(r => (r.getAs[Long]("cell"), r.getAs[Long]("dim")) ->
        (r.getAs[Double]("centroid"), r.getAs[Long]("n_members"))).toMap
    assert(step.keySet == Set((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L)))
    assert(step((0L, 0L))._2 == 2L && step((1L, 1L))._2 == 2L)
    assert(math.abs(step((0L, 0L))._1 - 0.95) < 1e-6 && step((0L, 1L))._1 == 0.0)
    assert(math.abs(step((1L, 1L))._1 - 0.95) < 1e-6 && step((1L, 0L))._1 == 0.0)
  }

  test("multiprobe IVF: probes=1 equals single-probe; recall never decreases") {
    val embs = graft.sources.Tables.embeddings(spark, TestSession.sf)
    val qp = col("vec_id") < 20
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(pairs(Similarity.ivfMultiprobeTopK(embs, qp, probes = 1))
      == pairs(Similarity.ivfTopK(embs, qp)))
    val brute = pairs(Similarity.bruteForceTopK(embs, qp))
    val single = pairs(Similarity.ivfTopK(embs, qp))
    val multi = pairs(Similarity.ivfMultiprobeTopK(embs, qp))
    assert((multi & brute).size >= (single & brute).size,
      s"multiprobe recall ${(multi & brute).size} fell below single ${(single & brute).size}")
  }

  test("sq8: signed byte codes of the unit vector — bounded, norm-preserving, zero-safe") {
    val embs = graft.sources.Tables.embeddings(spark, TestSession.sf)
    val codes = Similarity.sq8CodesWide(embs).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Int]]("codes").toArray).toMap
    assert(codes.values.forall(_.forall(c => c >= -Similarity.sq8Scale
      && c <= Similarity.sq8Scale)), "code outside [-127, 127]")
    // unit-norm preservation: Σ c² ≈ 127² within the per-dim rounding budget
    codes.foreach { case (id, cs) =>
      val n2 = cs.map(c => c.toLong * c).sum
      assert(n2 > 100L * 100 && n2 < 132L * 132,
        s"vec $id code norm² $n2 far from ${Similarity.sq8Scale * Similarity.sq8Scale}")
    }
    // a zero vector must code to all-zeros, not NaN-poisoned values
    val z = Seq((0L, Array(0.0f, 0.0f, 0.0f)), (1L, Array(3.0f, 4.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val zc = Similarity.sq8CodesWide(z).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Int]]("codes").toList).toMap
    assert(zc(0L) == List(0, 0, 0))
    assert(zc(1L) == List(76, 102, 0), "3-4-5 triangle: 127·(0.6, 0.8, 0)")
  }

  test("sq8 scan recall is near-exact; re-ranking never hurts") {
    val embs = graft.sources.Tables.embeddings(spark, TestSession.sf)
    val qp = col("vec_id") < 20
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val brute = pairs(Similarity.bruteForceTopK(embs, qp))
    val sq8 = pairs(Similarity.sq8TopK(embs, qp))
    val rr = pairs(Similarity.sq8RerankTopK(embs, qp))
    // 8-bit rounding only — the compressed scan should agree on nearly all of top-k
    assert((sq8 & brute).size >= (brute.size * 0.8).toInt,
      s"sq8 recall ${(sq8 & brute).size}/${brute.size} below 0.8")
    assert((rr & brute).size >= (sq8 & brute).size,
      s"re-rank recall ${(rr & brute).size} fell below sq8 ${(sq8 & brute).size}")
    // the re-ranked set can only contain first-stage candidates
    val cand = pairs(Similarity.sq8TopK(embs, qp, k = Similarity.rerankCandidates))
    assert(rr.subsetOf(cand), "re-rank emitted a pair outside its candidate set")
  }

  test("dedup spans: first occurrence survives, later copies removed at any offset") {
    import spark.implicits._
    val span = (1 to 10).map(i => s"w$i").mkString(" ")          // a 10-token span
    val docs = Seq(
      (1L, s"alpha beta $span gamma"),                           // first occurrence
      (2L, s"pre1 pre2 pre3 $span post1 post2"),                 // later copy, shifted offset
      (3L, span),                                                // entirely duplicated
      (4L, "unique tokens only here nothing shared at all")      // untouched
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSpans(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1 owns the span (lowest doc_id): nothing removed
    assert(out(1L).getAs[Long]("n_covered") == 0)
    assert(out(1L).getAs[String]("clean_text") == s"alpha beta $span gamma")
    // doc 2's copy is removed despite the different offset; context survives
    assert(out(2L).getAs[String]("clean_text") == "pre1 pre2 pre3 post1 post2")
    assert(out(2L).getAs[Long]("n_covered") == 10)
    // doc 3 is all duplicate: row kept, text emptied
    assert(out(3L).getAs[String]("clean_text") == "" &&
      out(3L).getAs[Long]("kept_ppm") == 0)
    // doc 4 shares nothing (and is shorter than no window it owns is elsewhere)
    assert(out(4L).getAs[Long]("n_covered") == 0 &&
      out(4L).getAs[Long]("kept_ppm") == 1000000L)
    // within-doc repetition: second occurrence of the doc's own span removed
    val self = Seq((7L, s"$span $span")).toDF("doc_id", "text")
    val so = Dedup.dedupSpans(self).collect().head
    // windows straddling the two copies also repeat (period-10 text), so
    // everything from token 10 on is covered
    assert(so.getAs[Long]("n_covered") == 10)
    assert(so.getAs[String]("clean_text") == span)
  }

  test("incremental spans: equals the full rewrite restricted to the batch") {
    import spark.implicits._
    val spanA = (1 to 10).map(i => s"a$i").mkString(" ") // history-owned
    val spanB = (1 to 10).map(i => s"b$i").mkString(" ") // batch-internal dup
    val history = Seq(
      (1L, s"old1 old2 $spanA old3"),
      (2L, "plain history document with no shared spans inside")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, s"new1 $spanA new2"),         // copy of history's span: removed
      (11L, s"lead $spanB tail1"),        // batch-first occurrence: survives
      (12L, s"$spanB trailer")            // batch-second occurrence: removed
    ).toDF("doc_id", "text")
    val full = Dedup.dedupSpans(history.unionByName(batch)).collect()
      .filter(_.getAs[Long]("doc_id") >= 10L)
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_covered"), r.getAs[String]("clean_text"))).toMap
    val inc = Dedup.dedupSpansIncremental(
        Dedup.spanGramIndex(history), batch).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_covered"), r.getAs[String]("clean_text"))).toMap
    assert(inc == full, s"incremental $inc != full-restricted $full")
    assert(inc(10L)._2 == "new1 new2")        // history owns spanA
    assert(inc(11L)._2 == s"lead $spanB tail1") // batch-first keeps its span
    assert(inc(12L)._2 == "trailer")          // batch-second loses it
  }

  test("binary codes: exact sign-bit semantics; rerank stays inside Hamming candidates") {
    import spark.implicits._
    // constructed vector: bit i set iff coordinate i strictly positive
    val v = Array.tabulate(64)(i => if (i % 3 == 0) 1.5f else if (i % 3 == 1) -2f else 0f)
    val codes = Similarity.binaryCodes(
        Seq((1L, v.toSeq)).toDF("vec_id", "embedding"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("code")).toMap
    val expected = (0 until 64).foldLeft(0L)((a, i) => if (v(i) > 0) a | (1L << i) else a)
    assert(codes(1L) == expected)
    // bit 63 positive → sign bit set, no overflow
    val hi = Array.tabulate(64)(i => if (i == 63) 1f else -1f)
    val hiCode = Similarity.binaryCodes(Seq((2L, hi.toSeq)).toDF("vec_id", "embedding"))
      .collect().head.getAs[Long]("code")
    assert(hiCode == Long.MinValue)

    val embs = graft.sources.Tables.embeddings(spark, TestSession.sf)
    val qp = col("vec_id") < 20
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val brute = pairs(Similarity.bruteForceTopK(embs, qp))
    val bin = pairs(Similarity.binaryTopK(embs, qp))
    // sign bits drop all magnitude — recall trails sq8 but the 50-candidate
    // exact rerank should still recover most of the true top-k
    assert((bin & brute).size >= (brute.size * 0.6).toInt,
      s"binary recall ${(bin & brute).size}/${brute.size} below 0.6")
    // every emitted pair must come from the Hamming candidate stage
    assert(bin.subsetOf(pairs(Similarity.binaryTopK(embs, qp, k = Similarity.rerankCandidates))),
      "rerank emitted a pair outside its Hamming candidate set")
    // the bounded-aggregator formulation is row-identical (score + rank)
    def full(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cos"), r.getAs[Int]("rank"))).toSet
    assert(full(Similarity.binaryTopKAgg(embs, qp)) == full(Similarity.binaryTopK(embs, qp)),
      "agg variant must be row-identical to the window variant")
  }

  test("ivf-sq8: stays inside the query's cell and nearly matches the exact in-cell scan") {
    val embs = graft.sources.Tables.embeddings(spark, TestSession.sf)
    val qp = col("vec_id") < 20
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val composed = pairs(Similarity.ivfSq8TopK(embs, qp))
    val exactInCell = pairs(Similarity.ivfTopK(embs, qp))
    // same cell restriction on both paths → every neighbor must be co-celled
    val cells = Similarity.ivfAssign(embs).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    assert(composed.forall { case (q, n) => cells(q) == cells(n) },
      "a neighbor escaped the query's coarse cell")
    // the int8 scan + 50-candidate refine should recover nearly all of the
    // exact same-cell ranking
    val overlap = (composed & exactInCell).size
    assert(overlap >= (exactInCell.size * 0.9).toInt,
      s"ivf-sq8 recall $overlap/${exactInCell.size} below 0.9")
  }

  test("semantic cells: same-cell pairs verified by cosine; clusters never cross cells") {
    // two semantic clusters on the axes; every vector is its own candidate
    // centroid (id < ivfCells) but the argmax assignment pulls the scaled
    // copies into the unit vectors' cells: cell0 = {0, 2, 4}, cell1 = {1, 3}
    val embs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.9f, 0.0f)), (3L, Array(0.0f, 0.9f)),
      (4L, Array(0.8f, 0.1f)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.semanticCellPairs(embs).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")) -> r.getAs[Double]("cos"))
      .toMap
    assert(pairs.keySet == Set((0L, 2L), (0L, 4L), (2L, 4L), (1L, 3L)),
      s"within-cell near-dups only, got ${pairs.keySet}")
    assert(pairs.values.forall(_ >= Dedup.cosineTau))
    assert(pairs((0L, 2L)) == 1.0, "collinear vectors have cosine exactly 1")
  }

  test("kmeans loop: one iteration reproduces the train step; loop is deterministic") {
    val embs = graft.sources.Tables.embeddings(spark, TestSession.sf)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("cell"), r.getAs[Long]("dim")) ->
        (r.getAs[Double]("centroid"), r.getAs[Long]("n_members"))).toMap
    assert(key(Similarity.kmeansTrain(embs, iters = 1)) == key(Similarity.ivfTrainStep(embs)),
      "a single Lloyd iteration must equal the registered train step bit-for-bit")
    val a = key(Similarity.kmeansTrain(embs))
    assert(a == key(Similarity.kmeansTrain(embs)), "training must be deterministic")
    // every vector stays assigned: per-cell member counts conserve the corpus
    val n = embs.count()
    val members = a.toSeq.groupBy(_._1._1).map { case (_, vs) => vs.head._2._2 }.sum
    assert(members == n, s"member counts $members != corpus $n")
  }

  test("connected components: chains collapse to min label, components stay apart") {
    // path 10-11-12-13 (diameter 3) plus separate pair 20-21: labels must
    // propagate transitively to the component minimum, never across components
    val pairs = Seq((10L, 11L), (11L, 12L), (12L, 13L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    assert(labels == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("connected components: adversarial long chain converges in O(log² n) rounds") {
    // a 256-hop path has diameter far beyond the 20-round budget — plain
    // min-label propagation would fail here; star rounds must converge.
    // driverMaxPairs = 0 forces the DISTRIBUTED path (a 256-edge graph
    // would otherwise take the driver fast path)
    val chain = (0L until 256L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(chain, driverMaxPairs = 0).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    assert(labels.keySet == (0L to 256L).toSet)
    assert(labels.values.forall(_ == 0L), "every chain node must label to the minimum")
    // two chains must not merge: disjoint ranges stay disjoint
    val two = ((0L until 64L).map(i => (i, i + 1)) ++
      (1000L until 1064L).map(i => (i, i + 1))).toDF("doc_a", "doc_b")
    val l2 = Dedup.connectedComponents(two, driverMaxPairs = 0).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    assert((0L to 64L).forall(n => l2(n) == 0L))
    assert((1000L to 1064L).forall(n => l2(n) == 1000L))
  }

  test("connected components: driver fast path and star rounds label identically") {
    // a mix of chains, a clique-ish blob and singleton-free pairs
    val edges = ((0L until 40L).map(i => (i, i + 1)) ++
      Seq((100L, 103L), (101L, 103L), (102L, 101L), (200L, 300L)))
      .toDF("doc_a", "doc_b")
    def labelsOf(threshold: Long) =
      Dedup.connectedComponents(edges, driverMaxPairs = threshold).collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    val driver = labelsOf(Long.MaxValue)
    val distributed = labelsOf(0)
    assert(driver == distributed)
    assert(driver(103L) == 100L && driver(300L) == 200L)
  }

  test("clusters: every doc labeled; exact+near dups share a cluster; singletons self-labeled") {
    val c = Dedup.clusters(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(c.keySet == Set(0L, 1L, 2L, 3L))
    assert(c(0L) == 0L && c(1L) == 0L && c(2L) == 0L) // 0~1 exact, 0~2 near
    assert(c(3L) == 3L)                               // unrelated: own cluster
  }

  test("incremental clustering: label edges + batch pairs reproduce the full re-cluster") {
    // the hard case: a new doc BRIDGES two stored clusters — {0,1} and {5,6}
    // must merge into one component labeled by the global minimum
    val storedLabels = Dedup.connectedComponents(
      Seq((0L, 1L), (5L, 6L)).toDF("doc_a", "doc_b"))
    val batchPairs = Seq((1L, 9L), (9L, 5L)).toDF("doc_a", "doc_b")
    val updated = Dedup.updateClusters(storedLabels, batchPairs).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    assert(updated == Map(0L -> 0L, 1L -> 0L, 5L -> 0L, 6L -> 0L, 9L -> 0L))
    // end-to-end on the text fixture: old/new split through the stored
    // signature index lands on exactly the one-shot clusters
    val oldDocs = docs.filter($"doc_id" =!= 2L)
    val newDocs = docs.filter($"doc_id" === 2L)
    val idx = Dedup.minhashIndex(oldDocs).cache()
    val labels = Dedup.updateClusters(
      Dedup.connectedComponents(Dedup.minhashPairs(oldDocs)),
      Dedup.incrementalMinhashPairs(newDocs, idx))
    val incremental = docs.select($"doc_id")
      .join(labels.select($"node".as("doc_id"), $"label".as("cid")), Seq("doc_id"), "left")
      .select($"doc_id", org.apache.spark.sql.functions.coalesce($"cid", $"doc_id").as("cluster_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dedup.clusters(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(incremental == full)
    idx.unpersist()
  }

  test("cluster survivors: max quality wins, ties to min doc_id, singletons self-survive") {
    val q = graft.operators.TextOps.qualityScore(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
    val cl = Dedup.clusters(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id")))
    // first-principles argmax per cluster: (quality desc, doc_id asc)
    val expected = cl.groupBy(_._2).map { case (cid, members) =>
      val ids = members.map(_._1)
      val best = ids.maxBy(id => (q(id), -id))
      cid -> ((best, q(best), ids.length.toLong))
    }
    val got = Dedup.clusterSurvivors(docs).collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        ((r.getAs[Long]("survivor_id"), r.getAs[Double]("survivor_quality"),
          r.getAs[Long]("cluster_size")))).toMap
    assert(got == expected)
    // the exact+near dup cluster {0,1,2} resolves to ONE kept copy;
    // the unrelated doc survives alone
    assert(got(0L)._3 == 3L)
    assert(got(3L) == ((3L, q(3L), 1L)))
  }

  test("containment pairs: near-subset found across a length gap Jaccard blocking misses") {
    // doc 11 is doc 10's full prefix — 3× the length apart, so the Jaccard
    // op's size-ratio prefilter would never even pair them
    val small = doc(4, n = 20)
    val big = small + " " + doc(7, n = 45)
    val d = Seq(
      (10L, big, "en", "s0", big.length.toLong),
      (11L, small, "en", "s1", small.length.toLong),
      (12L, doc(2), "en", "s2", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val pairs = Dedup.containmentPairs(d).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("containment"))
      .toMap
    assert(pairs.contains((10L, 11L)), s"subset pair missed: $pairs")
    assert(pairs((10L, 11L)) >= 0.8)
    assert(!pairs.keySet.exists(p => p._1 == 12L || p._2 == 12L), "unrelated doc paired")
    // the Jaccard op indeed cannot see this pair (documents the gap)
    val jac = Dedup.ngramJaccardPairs(d).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((10L, 11L)))
  }

  test("ngram jaccard with length blocking finds the near-dup pair") {
    val keys = Dedup.ngramJaccardPairs(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(keys.contains((0L, 1L)) && keys.contains((0L, 2L)))
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L))
    // far below the participant cap: the overflow column is 0 everywhere
    assert(Dedup.ngramJaccardPairs(docs).collect()
      .forall(_.getAs[Long]("bucket_overflow") == 0L))
  }

  test("exact-baseline participant cap bounds within-bucket pairs and reports overflow") {
    // 8 identical docs land in ONE length bucket; cap = 4 keeps the 4 lowest
    // doc_ids -> C(4,2) = 6 pairs, each carrying the 4 dropped docs
    val many = (0L until 8L).map(i => (i, base, "en", s"s$i", base.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val pairs = Dedup.ngramJaccardPairs(many, cap = 4).collect()
    assert(pairs.length == 6)
    val ids = pairs.flatMap(r => Seq(r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(ids == Set(0L, 1L, 2L, 3L), s"cap must keep the lowest doc_ids: $ids")
    assert(pairs.forall(_.getAs[Long]("bucket_overflow") == 4L))
    val sweep = Dedup.jaccardThresholdSweep(many, cap = 4).collect()
    assert(sweep.length == 1)
    assert(sweep.head.getAs[Long]("n_pairs") == 6L)
    assert(sweep.head.getAs[Long]("n_docs_dropped") == 4L)
    // uncapped (default) the same frame yields all C(8,2) pairs, overflow 0
    val full = Dedup.ngramJaccardPairs(many).collect()
    assert(full.length == 28 && full.forall(_.getAs[Long]("bucket_overflow") == 0L))
  }

  private def vec(f: Int => Double): Seq[Float] = (0 until 64).map(i => f(i).toFloat)
  private val embs = Seq(
    (0L, vec(i => math.sin(i + 1.0)), 0),
    (1L, vec(i => math.sin(i + 1.0) * 1.01 + 0.001), 0), // near-dup of 0
    (2L, vec(i => math.cos(3.0 * i + 2.0)), 1),
    (3L, vec(i => math.sin(i + 1.0) * -1.0), 1) // antipode of 0
  ).toDF("vec_id", "embedding", "label")

  test("embedding near-dup: LSH bucket + cosine finds the near pair only") {
    val pairs = Dedup.embeddingNearDups(embs).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"), r.getAs[Double]("cos")))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((0L, 1L)))
    assert(pairs.head._3 > 0.99)
  }

  test("brute-force top-k: nearest is the near-dup, self excluded, k bounded") {
    val top = Similarity.bruteForceTopK(embs, col("vec_id") === 0L, k = 2).collect()
    assert(top.length == 2)
    assert(top.map(_.getAs[Long]("neighbor_id")).toSet.intersect(Set(0L)).isEmpty)
    val first = top.find(_.getAs[Int]("rank") == 1).get
    assert(first.getAs[Long]("neighbor_id") == 1L && first.getAs[Double]("cos") > 0.99)
  }

  test("IVF top-k: cells partition the corpus; no self-matches; ranks contiguous") {
    val e = graft.sources.Tables.embeddings(spark, TestSession.sf)
    val assigned = Similarity.ivfAssign(e).cache()
    assert(assigned.count() == e.count()) // every vector lands in exactly one cell
    assert(assigned.select("cell").distinct().count() <= Similarity.ivfCells)
    val top = Similarity.ivfTopK(e, col("vec_id") < 3, k = 5).collect()
    assert(top.nonEmpty)
    assert(top.forall(r => r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id")))
    val ranks = top.groupBy(_.getAs[Long]("query_id"))
      .values.map(_.map(_.getAs[Int]("rank")).sorted.toSeq)
    assert(ranks.forall(rs => rs == (1 to rs.size)))
  }

  test("incremental minhash against a stored index equals the filtered full pair set") {
    import org.apache.spark.sql.functions.{lit, pmod}
    val docs = graft.sources.Tables.documents(spark, TestSession.sf)
    val corpus = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
    val fresh = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
    val idx = Dedup.minhashIndex(corpus).cache()
    val inc = Dedup.incrementalMinhashPairs(fresh, idx).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val full = Dedup.minhashPairs(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val expected = full.filter { case (a, b) => a % 7 == 0 || b % 7 == 0 }
    assert(inc == expected,
      s"incremental found ${inc.size}, expected ${expected.size} new-involving pairs")
    // the batch path must never emit a corpus-vs-corpus pair
    assert(inc.forall { case (a, b) => a % 7 == 0 || b % 7 == 0 })
    idx.unpersist()
  }

  test("pq: codewords self-encode; ADC against codeword neighbors is the exact dot") {
    import graft.functions.GraftExpressions
    val e = graft.sources.Tables.embeddings(spark, TestSession.sf)
    val codes = Similarity.pqCodesWide(e).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Int]]("codes").toList).toMap
    // every vector gets pqM codes, each within the codebook
    assert(codes.values.forall(cs => cs.length == Similarity.pqM &&
      cs.forall(c => c >= 0 && c < Similarity.pqK)))
    // codebook seed vectors quantize to themselves in every subspace
    (0 until Similarity.pqK).foreach { j =>
      assert(codes(j.toLong) == Seq.fill(Similarity.pqM)(j),
        s"seed vec $j -> ${codes(j.toLong)}")
    }
    // ADC is EXACT for neighbors whose vector IS a codeword reconstruction:
    // the per-subspace lookups sum to the full quantized dot
    GraftExpressions.register(spark)
    val exact = e.filter(col("vec_id") === 17L).select(col("embedding").as("q"))
      .crossJoin(e.filter(col("vec_id") < Similarity.pqK))
      .select(col("vec_id"), GraftExpressions.qdot(col("q"), col("embedding")).as("dot"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("dot")).toMap
    val adc = Similarity.pqAdcTopK(e, col("vec_id") === 17L, k = e.count().toInt)
      .collect().map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Long]("adc")).toMap
    (0 until Similarity.pqK).foreach { j =>
      assert(adc(j.toLong) == exact(j.toLong), s"neighbor $j adc vs exact")
    }
  }

  test("ivfpq: probing every cell collapses to the flat ADC scan; probed subset is consistent") {
    val e = graft.sources.Tables.embeddings(spark, TestSession.sf)
    val qp = col("vec_id") < 5
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id", "adc", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    // composition identity: probes = ivfCells removes the cell restriction,
    // so IVF-PQ must equal pqAdcTopK row-for-row (same codebook, same ties)
    assert(rows(Similarity.ivfpqTopK(e, qp, probes = Similarity.ivfCells)) ==
      rows(Similarity.pqAdcTopK(e, qp)))
    // default probes: a SUBSET of the flat candidates, scored identically —
    // every returned (query, neighbor) pair carries the same adc as flat
    val flat = Similarity.pqAdcScoredForTest(e, qp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val probed = Similarity.ivfpqTopK(e, qp).collect()
    assert(probed.nonEmpty)
    probed.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(flat(key) == r.getAs[Long]("adc"), s"adc mismatch at $key")
    }
    // ranks contiguous from 1 within each query
    probed.groupBy(_.getAs[Long]("query_id")).values.foreach { g =>
      val ranks = g.map(_.getAs[Int]("rank")).sorted
      assert(ranks.toSeq == (1 to ranks.length))
    }
  }

  test("pq train step: refinement reduces quantization distortion; corpus conserved") {
    val e = graft.sources.Tables.embeddings(spark, TestSession.sf)
    // the Lloyd guarantee is DISTORTION decrease (top-k recall of specific
    // queries is not monotone in it and may wiggle): total min quantized
    // L2² over the corpus, refined ≤ seeded
    import spark.implicits._
    val vecs = e.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().sortBy(_._1).map(_._2.toArray)
    def q(x: Float): Long = math.floor(x.toDouble * graft.functions.GraftExpressions.Quant).toLong
    def qd(a: Array[Float], b: Array[Float]): Long =
      a.indices.iterator.map(i => q(a(i)) * q(b(i))).sum
    def distortion(cb: Array[Array[Array[Float]]]): Long =
      vecs.iterator.map { v =>
        (0 until Similarity.pqM).map { s =>
          val sub = v.slice(s * Similarity.pqSubDim, (s + 1) * Similarity.pqSubDim)
          cb(s).iterator.map(c => qd(sub, sub) - 2 * qd(sub, c) + qd(c, c)).min
        }.sum
      }.sum
    val seedCb = Array.tabulate(Similarity.pqM)(s =>
      vecs.take(Similarity.pqK).map(_.slice(s * Similarity.pqSubDim, (s + 1) * Similarity.pqSubDim)))
    val refinedCb = Similarity.pqCodebookRefined(e)
    val (d0, d1) = (distortion(seedCb), distortion(refinedCb))
    assert(d1 <= d0, s"refined distortion $d1 exceeds seeded $d0")
    // the step re-centers on actual members: counts conserve the corpus per subspace
    val step = Similarity.pqTrainStep(e).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getAs[Long]("n_members")).toMap
    val n = e.count()
    (0 until Similarity.pqM).foreach { s =>
      val members = step.collect { case ((`s`, _, 0), m) => m }.sum
      assert(members == n, s"subspace $s members $members != corpus $n")
    }
  }

  test("pq full train: one round equals the single step; distortion keeps falling") {
    val e = graft.sources.Tables.embeddings(spark, TestSession.sf)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        (r.getDouble(3), r.getAs[Long]("n_members"))).toMap
    assert(rows(Similarity.pqTrain(e, 1)) == rows(Similarity.pqTrainStep(e)),
      "pqTrain(_, 1) must be pqTrainStep bit-for-bit")
    // Lloyd monotonicity through the full loop: distortion of the 3-round
    // codebook <= 1-round codebook <= seed (same metric as the step spec)
    import spark.implicits._
    val vecs = e.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().sortBy(_._1).map(_._2.toArray)
    def q(x: Float): Long = math.floor(x.toDouble * graft.functions.GraftExpressions.Quant).toLong
    def qd(a: Array[Float], b: Array[Float]): Long =
      a.indices.iterator.map(i => q(a(i)) * q(b(i))).sum
    def distortion(cb: Array[Array[Array[Float]]]): Long =
      vecs.iterator.map { v =>
        (0 until Similarity.pqM).map { s =>
          val sub = v.slice(s * Similarity.pqSubDim, (s + 1) * Similarity.pqSubDim)
          cb(s).iterator.map(c => qd(sub, sub) - 2 * qd(sub, c) + qd(c, c)).min
        }.sum
      }.sum
    val d1 = distortion(Similarity.pqCodebookTrained(e, 1))
    val d3 = distortion(Similarity.pqCodebookTrained(e, Similarity.pqIters))
    assert(d3 <= d1, s"3-round distortion $d3 exceeds 1-round $d1")
  }

  test("ann recall report: hits bounded by total, multiprobe never below single-probe") {
    val e = graft.sources.Tables.embeddings(spark, TestSession.sf)
    val r = Similarity.annRecallReport(e).collect()
      .map(x => x.getAs[String]("method") ->
        ((x.getAs[Long]("hits"), x.getAs[Long]("total"), x.getAs[Long]("recall_ppm"))))
      .toMap
    assert(r.keySet ==
      Set("ivf", "ivf_multiprobe", "ivfpq", "pq_adc", "sq8", "sq8_rerank"))
    r.foreach { case (m, (h, t, p)) =>
      assert(h <= t && p == h * 1000000L / t, s"$m: inconsistent ($h, $t, $p)")
    }
    assert(r("ivf_multiprobe")._3 >= r("ivf")._3,
      "probing more cells can only add brute-force hits")
    assert(r("sq8_rerank")._3 >= r("sq8")._3,
      "exact re-ranking of sq8 candidates can only improve recall")
    // NOTE no order is asserted between ivfpq and pq_adc: the candidate SET
    // is a subset, but top-k recall is not monotone in it — the cell filter
    // also prunes quantization-error impostors that crowd the flat ADC
    // top-k (measured on the fixture: ivfpq 0.44 vs pq_adc 0.38)
    assert(r("ivfpq")._2 == r("pq_adc")._2, "same brute-force denominator")
  }

  test("knn graph: neighbors stay in-cell and match the in-cell brute force") {
    val e = graft.sources.Tables.embeddings(spark, TestSession.sf)
    val cellOf = Similarity.ivfAssign(e).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    val got = Similarity.knnGraph(e).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos")))
    // every edge joins two vectors of one cell
    got.foreach { case ((v, _), (n, _)) =>
      assert(cellOf(v) == cellOf(n), s"$v -> $n crosses cells")
    }
    // per vector: ranked neighbors equal the exact in-cell cosine order
    val exact = Similarity.ivfTopK(e, lit(true), k = Similarity.knnK).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos"))).toMap
    got.foreach { case ((v, rk), (n, c)) =>
      assert(exact((v, rk)) == ((n, c)),
        s"($v, rank $rk): knn gives ($n, $c), in-cell exact gives ${exact((v, rk))}")
    }
    assert(got.nonEmpty && got.groupBy(_._1._1).values.forall(_.size <= Similarity.knnK))
  }

  test("LSH top-k returns a subset consistent with brute force on the fixture") {
    val sf = TestSession.sf
    val e = graft.sources.Tables.embeddings(spark, sf)
    val bf = Similarity.bruteForceTopK(e, col("vec_id") < 3, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val lsh = Similarity.lshTopK(e, col("vec_id") < 3, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(lsh.nonEmpty) // bucket contains some neighbors
    // every LSH hit that brute force also ranked must agree on membership rules
    assert(lsh.forall { case (q, n) => q != n })
    assert(bf.forall { case (q, n) => q != n })
  }

  test("lsh recall report: high-jaccard bands fully recalled on the dup fixture") {
    // fixture: (0,1) identical (j=1), (0,2)/(1,2) near (j≈0.88) — all three
    // collide in LSH bands (proven by the minhash test), so every band the
    // exact baseline emits must report full recall here
    val rows = Dedup.lshRecallReport(docs).collect()
      .map(r => r.getAs[Double]("tau_lo") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_found"),
          r.getAs[Long]("recall_ppm")))
    assert(rows.map(_._2._1).sum == 3, s"3 baseline pairs expected: ${rows.toSeq}")
    assert(rows.forall { case (_, (n, f, ppm)) => n == f && ppm == 1000000L },
      s"full recall expected on this fixture: ${rows.toSeq}")
    assert(rows.exists(_._1 == 1.0), "the identical pair sits in the top band")
  }

  test("cross-source audit: provenance rollup of near-dup pairs, exact copies counted") {
    // fixture docs: 0(s0) ≡ 1(s1) verbatim; 2(s2) near-dup of both; 3 unrelated
    val rows = Dedup.crossSourcePairs(docs).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_exact"))).toMap
    assert(rows(("s0", "s1")) == ((1L, 1L)), "verbatim cross-source copy counted as exact")
    assert(rows(("s0", "s2")) == ((1L, 0L)) && rows(("s1", "s2")) == ((1L, 0L)),
      s"near-dups roll up without the exact flag: $rows")
    assert(!rows.keys.exists(k => k._1 == "s3" || k._2 == "s3"), "unrelated source absent")
  }

  test("mmr rerank: relevance-first then diversity, exact integer marginals") {
    // colinear points x = 1 (query), 2, 4, 12: nearest first (2), then 4
    // (marginal 9−4 = 5 beats 12's 121−100 = 21), then 12 (121−64 = 57) —
    // all on the Quant² grid (Δx²·2^40)
    def line(x: Double): Seq[Float] = (x +: Seq.fill(63)(0.0)).map(_.toFloat)
    val pts = Seq((0L, line(1), 0), (1L, line(2), 0), (2L, line(4), 0),
      (3L, line(12), 0)).toDF("vec_id", "embedding", "label")
    val sel = Similarity.mmrRerank(pts, queryId = 0L, k = 3, nCand = 3).collect()
      .sortBy(_.getAs[Long]("sel_round"))
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("score_q")))
    val g2 = 1L << 40 // (2^20)² — one unit of squared distance on the grid
    assert(sel.toSeq == Seq((1L, 1L * g2), (2L, 5L * g2), (3L, 57L * g2)),
      s"got ${sel.toSeq}")
  }

  test("fps: greedy max-min selection order on a line, partitioning-invariant") {
    // points on a line (x, 0, 0, ...): 0 at 0 (seed), 1 at 1, 2 at 10, 3 at 5.
    // greedy from 0: farthest is 2 (d=100); then 3 (min(25,25)=25 beats 1's
    // min(1,81)=1); then 1 — selection order 0, 2, 3, 1.
    def line(x: Double): Seq[Float] = (x +: Seq.fill(63)(0.0)).map(_.toFloat)
    val pts = Seq((0L, line(0), 0), (1L, line(1), 0), (2L, line(10), 0),
      (3L, line(5), 0)).toDF("vec_id", "embedding", "label")
    val order = Similarity.fpsSample(pts, k = 4).collect()
      .sortBy(_.getAs[Long]("sel_round")).map(_.getAs[Long]("vec_id")).toSeq
    assert(order == Seq(0L, 2L, 3L, 1L), s"selection order was $order")
    val reparted = Similarity.fpsSample(pts.repartition(7), k = 4).collect()
      .sortBy(_.getAs[Long]("sel_round")).map(_.getAs[Long]("vec_id")).toSeq
    assert(reparted == order, "FPS selection must not depend on partitioning")
    // seed has null distance; every later selection records its max-min dist
    val dists = Similarity.fpsSample(pts, k = 4).collect()
      .sortBy(_.getAs[Long]("sel_round")).map(r => Option(r.getAs[java.lang.Long]("dist_q")))
    assert(dists.head.isEmpty && dists.tail.forall(_.isDefined))
  }

  test("ivf cell stats: totals reconcile and skew is bounded below by balance") {
    val embs = graft.sources.Tables.embeddings(spark, TestSession.sf)
    val r = Similarity.ivfCellStats(embs).collect().head
    assert(r.getAs[Long]("n_vectors") == embs.count())
    assert(r.getAs[Long]("n_nonempty") <= r.getAs[Long]("n_cells"))
    assert(r.getAs[Long]("min_cell") >= 1L)
    assert(r.getAs[Long]("max_cell") >= r.getAs[Long]("min_cell"))
    // max ≥ n_vectors/n_cells always, so the ppm skew ratio floors at 1e6
    assert(r.getAs[Long]("skew_ppm") >= 1000000L, s"got $r")
  }

  test("truncated recall: monotone in width, full width perfect") {
    val embs = graft.sources.Tables.embeddings(spark, TestSession.sf)
    val r = Similarity.truncatedRecall(embs, dims = Seq(8, 32, 64)).collect()
      .map(x => x.getAs[Long]("dims") -> x.getAs[Long]("recall_ppm")).toMap
    assert(r(8L) <= r(32L), s"more dims can only help: $r")
    assert(r(64L) == 1000000L, s"the full 64-dim slice must be exact: $r")
  }

  test("passage dedup: cross-doc chunks flag, within-doc repeats don't") {
    def words(tag: String) = (0 until Dedup.passageLen).map(i => s"$tag$i").mkString(" ")
    val (a, b, c, e) = (words("a"), words("b"), words("c"), words("e"))
    val docs = Seq(
      (1L, s"$a $b"),   // shares passage a with doc 2
      (2L, s"$a $c"),
      (3L, "lonely short tail"), // single ragged passage, unique
      (4L, s"$e $e")    // the same passage twice WITHIN one doc only
    ).toDF("doc_id", "text")
    val r = Dedup.passageStats(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_passages"), x.getAs[Long]("n_dup_passages"),
          x.getAs[Long]("dup_ppm"))).toMap
    assert(r(1L) == ((2L, 1L, 500000L)), s"doc1: ${r(1L)}")
    assert(r(2L) == ((2L, 1L, 500000L)))
    assert(r(3L) == ((1L, 0L, 0L)), "ragged singleton passage is not a dup")
    assert(r(4L) == ((2L, 0L, 0L)),
      "a passage repeated only within one doc must not count as duplicated")
  }

  test("passage incremental: batch audit equals the full recompute on any split") {
    def words(tag: String) = (0 until Dedup.passageLen).map(i => s"$tag$i").mkString(" ")
    val (a, b, c, e) = (words("a"), words("b"), words("c"), words("e"))
    val docs = Seq(
      (1L, s"$a $b"), (2L, s"$c $a"), (3L, "lone tail"),
      (8L, s"$a $e"),  // new: passage a dups against HISTORY only
      (9L, s"$e $c")   // new: e dups against doc 8 (in-batch), c vs history
    ).toDF("doc_id", "text")
    val full = Dedup.passageStats(docs).filter($"doc_id" >= 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val inc = Dedup.passageStatsIncremental(
      Dedup.passageHashIndex(docs.filter($"doc_id" < 8)),
      docs.filter($"doc_id" >= 8)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(inc == full, s"incremental $inc must equal full-restricted $full")
    assert(inc == Set((8L, 2L, 2L, 1000000L), (9L, 2L, 2L, 1000000L)),
      "history dup, in-batch dup, and both-sides dup all flag")
  }

  test("passage clean: first writer keeps, order preserved, empty docs drop") {
    def words(tag: String) = (0 until Dedup.passageLen).map(i => s"$tag$i").mkString(" ")
    val (a, b, c) = (words("a"), words("b"), words("c"))
    val docs = Seq(
      (1L, s"$a $b"),   // owns a and b
      (2L, s"$c $a"),   // keeps c (position preserved), loses a to doc 1
      (3L, s"$a $b")    // a verbatim copy of doc 1 — nothing survives
    ).toDF("doc_id", "text")
    val r = Dedup.passageClean(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_kept"), x.getAs[String]("clean_text"))).toMap
    assert(r.keySet == Set(1L, 2L), "the all-boilerplate doc 3 must drop out")
    assert(r(1L) == ((2L, s"$a $b")), "first writer keeps everything verbatim")
    assert(r(2L) == ((1L, c)), s"doc 2 keeps only its own passage: ${r(2L)}")
  }

  test("cell quota: ranks contiguous per cell, keep iff rank within quota, sizes reconcile") {
    val embs = graft.sources.Tables.embeddings(spark, TestSession.sf)
    val n = embs.count()
    val rows = Similarity.cellQuota(embs, quota = 5).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"),
        r.getAs[Long]("cell_rank"), r.getAs[Long]("cell_size"), r.getAs[Int]("cq_keep")))
    assert(rows.length == n, "every vector is assigned and reported")
    rows.groupBy(_._2).foreach { case (cell, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq,
        s"cell $cell ranks must be dense 1..size")
      assert(rs.forall(_._4 == rs.length), s"cell $cell size column must match")
      // rank order is vec_id order: the k lowest ids are the keepers
      val keepIds = rs.filter(_._5 == 1).map(_._1).sorted.toSeq
      assert(keepIds == rs.map(_._1).sorted.take(5).toSeq)
    }
    assert(rows.count(_._5 == 1) == rows.groupBy(_._2).values.map(rs => math.min(5, rs.length)).sum)
  }

  test("cluster split: every member of a near-dup cluster lands in one split") {
    val out = Dedup.clusterSplitAssign(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[String]("split"))).toMap
    // 0, 1 (identical) and 2 (near-dup of 0) form one cluster labeled 0
    assert(out(0L)._1 == 0L && out(1L)._1 == 0L && out(2L)._1 == 0L)
    assert(out(3L)._1 == 3L, "the unrelated doc is its own cluster")
    assert(Set(out(0L)._2, out(1L)._2, out(2L)._2).size == 1,
      "cluster members must share a split")
  }

  test("leakage audit: cluster keying leaks zero pairs; doc keying matches recount") {
    val row = Dedup.splitLeakageAudit(docs).collect().head
    val pairs = Dedup.minhashPairs(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(row.getAs[Long]("n_pairs") == pairs.length)
    assert(row.getAs[Long]("n_leaked_cluster_keyed") == 0L,
      "cluster-keyed split can never straddle a near-dup pair")
    // recount the doc-keyed leaks independently from the doc-keyed assignment
    val naive = graft.operators.TextOps.splitAssign(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val expectLeaks = pairs.count { case (a, b) => naive(a) != naive(b) }
    assert(row.getAs[Long]("n_leaked_doc_keyed") == expectLeaks)
    val ppm = if (pairs.isEmpty) 0L else expectLeaks.toLong * 1000000L / pairs.length
    assert(row.getAs[Long]("leak_ppm_doc_keyed") == ppm)
  }

  test("vector index store: stored ≡ fresh encode, and every stored-read op matches its fresh twin") {
    import org.apache.spark.sql.functions.pmod
    val sf = TestSession.sf
    val e = graft.sources.Tables.embeddings(spark, sf)
    val stored = Similarity.storedIndex(spark, sf)
    // the artifact row-for-row equals the one-pass fresh encode
    def idx(df: org.apache.spark.sql.DataFrame) = df
      .select("vec_id", "cell", "resid", "codes", "sq8").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getSeq[Int](3), r.getSeq[Int](4))).toSet
    assert(idx(stored) == idx(Similarity.indexFrame(e)))
    // stored-read ANN ops ≡ the fresh-encode formulations, row for row
    val qp = col("vec_id") < 5
    def rs(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    assert(rs(Similarity.pqAdcTopKFrom(stored, e, qp)) == rs(Similarity.pqAdcTopK(e, qp)))
    assert(rs(Similarity.pqAdcTopKAggFrom(stored, e, qp)) == rs(Similarity.pqAdcTopKAgg(e, qp)))
    assert(rs(Similarity.ivfpqTopKFrom(stored, e, qp)) == rs(Similarity.ivfpqTopK(e, qp)))
    val sq8 = stored.select(col("vec_id"), col("sq8").as("codes"))
    assert(rs(Similarity.sq8TopKFrom(sq8, qp)) == rs(Similarity.sq8TopK(e, qp)))
    assert(rs(Similarity.sq8RerankTopKFrom(sq8, e, qp)) == rs(Similarity.sq8RerankTopK(e, qp)))
    val cellSq8 = stored.select(col("vec_id"), col("cell"), col("sq8").as("codes"))
    assert(rs(Similarity.ivfSq8TopKFrom(cellSq8, e, qp)) == rs(Similarity.ivfSq8TopK(e, qp)))
    // append health report off the store ≡ re-encoding the corpus slice
    val corpusPred = col("vec_id") < Similarity.ivfCells ||
      pmod(col("vec_id"), lit(Similarity.appendMod)) =!= 0
    val centroids = e.filter(col("vec_id") < Similarity.ivfCells)
      .select(col("vec_id").as("cell"), col("embedding").as("c_emb"))
    assert(rs(Similarity.ivfIndexAppendFrom(
      stored.filter(corpusPred).select(col("cell"), col("resid")),
      e.filter(!corpusPred), centroids)) ==
      rs(Similarity.ivfIndexAppend(e.filter(corpusPred), e.filter(!corpusPred))))
  }

  test("index append surfaces only-new cells: n_stored 0, share 100%, drift sentinel, retrain") {
    // argmax-dot does not guarantee a seed lands in its own cell: centroid 5
    // (0.5·e16 + 0.9·e6) loses its seed to centroid 6 (2·e6) because
    // dot(c5,c6)=1.8 > dot(c5,c5)=1.06, so cell 5 starts EMPTY. The batch
    // vector e16 then assigns to cell 5 (its only positive dot) — a cell
    // whose members are all new must still appear in the report (full
    // outer join), carrying the strongest retrain signal (ADVICE r8).
    val dim = 64
    def vec(pairs: (Int, Float)*): Seq[Float] = {
      val a = Array.fill(dim)(0f); pairs.foreach { case (i, v) => a(i) = v }; a.toSeq
    }
    val corpus = (0 until Similarity.ivfCells).map { i =>
      if (i == 5) (i.toLong, vec(16 -> 0.5f, 6 -> 0.9f))
      else if (i == 6) (i.toLong, vec(6 -> 2.0f))
      else (i.toLong, vec(i -> 1.0f))
    }.toDF("vec_id", "embedding")
    val batch = Seq((100L, vec(16 -> 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.ivfIndexAppend(corpus, batch).collect()
      .map(r => r.getAs[Long]("cell") -> r).toMap
    assert(out.contains(5L), "cell 5 must be present in the report")
    val c5 = out(5L)
    assert(c5.getAs[Long]("n_stored") == 0L && c5.getAs[Long]("n_new") == 1L)
    assert(c5.getAs[Long]("new_share_ppm") == 1000000L)
    assert(c5.getAs[Long]("drift_x1000") == Similarity.appendDriftInfX1000)
    assert(c5.getAs[Boolean]("retrain"))
    // the displaced seed counts as stored mass in the cell it actually chose
    assert(out(6L).getAs[Long]("n_stored") == 2L)
  }
}
