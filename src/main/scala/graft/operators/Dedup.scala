package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Op
import graft.functions.GraftExpressions
import graft.functions.Portable._
import graft.sources.Tables

/** Deduplication operators for a training-data pipeline, over `documents` and
  * `embeddings` (north-star extension; SURVEY.md §7.3 step 8).
  *
  * Scale design (100 TB): every near-dup strategy here is
  * candidate-generation-by-blocking + verify-within-block — the only joins are
  * equi-joins on small blocking keys (band signature / simhash byte / LSH
  * bucket), so the all-pairs O(n²) never materializes. Exact dedup is one
  * hash-aggregate. Shingling/hashing is a narrow, codegen'd pass.
  *
  * Cost structure (measured at sf0.1 and designed for 1000×):
  *  - each shingle is md5'd ONCE; the two 60-bit halves of that digest seed a
  *    Kirsch-Mitzenmacher double-hashing family `h_s = (h1 + s·(h2>>4)) mod
  *    2^60` for all k MinHash functions — k-independent hashing without k
  *    digests (overflow-free in signed 64-bit on both engines);
  *  - Jaccard verification intersects LONG arrays (hashed shingles), not
  *    string arrays — 8-byte comparisons instead of variable-length;
  *  - pair joins carry a size-ratio prefilter (`j ≥ τ` forces
  *    `min(n)/max(n) ≥ τ`), pruning cross-size pairs before any set op.
  *
  * Portability: md5-based hashes ([[graft.functions.Portable]]) keep DuckDB
  * verifying every op bit-for-bit. A production build would swap md5 for
  * xxhash64 (one line) — the plan shape is identical.
  */
object Dedup {

  val shingleN = 3
  val minhashK = 12 // 4 bands × 3 rows
  val minhashBands = 4
  val minhashRows = 3
  val jaccardTau = 0.7
  val simhashBits = 32
  val hammingMax = 6
  val cosineTau = 0.4

  /** 2^60 - 1: keeps the double-hash family inside signed-64 range. */
  val hashMask: Long = (1L << 60) - 1

  // --------------------------------------------------------------------------
  // Shingling + hashing (shared by minhash / simhash / ngram ops)
  // --------------------------------------------------------------------------

  /** doc_id, n (shingle count), h1/h2 (aligned 60-bit halves of one md5 per
    * distinct word-3-gram shingle). The digest list is SORTED before
    * splitting: fixed-length lowercase hex sorts lexicographically == its
    * numeric value, so h1 comes out numerically sorted (feeding the
    * merge-scan intersection kernel) while h2 stays aligned to the same
    * shingle. Docs with < n words dropped explicitly on both engines
    * (Spark's `sequence` would count down).
    */
  def hashedShingles(docs: DataFrame): DataFrame =
    docs
      // the fixture table arrives as one file = one partition; the shingle+md5
      // projection is the expensive pass, so spread it across the cluster
      // first (a 5k-row shuffle is free next to 2M digests). Size-based
      // fan-out: grows with the corpus, floors at defaultParallelism.
      .repartition(graft.Scale.partitionsFor(docs))
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= shingleN)
      .select(col("doc_id"),
        array_sort(transform(shingles(col("w"), shingleN), x => md5(x))).as("md"))
      .select(col("doc_id"),
        transform(col("md"), m => hexToLong(m, 1)).as("h1"),
        transform(col("md"), m => hexToLong(m, 16)).as("h2"))
      .withColumn("n", size(col("h1")))

  private val hashedShinglesSql =
    s"""hmd AS (
       |  SELECT doc_id, list_sort(list_transform(${shinglesSql("w", shingleN)}, x -> md5(x))) AS md
       |  FROM (SELECT doc_id, string_split(text, ' ') w FROM documents)
       |  WHERE len(w) >= $shingleN),
       |hh AS (
       |  SELECT doc_id,
       |         list_transform(md, m -> ${hexToLongSql("m", 1)}) AS h1,
       |         list_transform(md, m -> ${hexToLongSql("m", 16)}) AS h2,
       |         len(md) AS n
       |  FROM hmd)""".stripMargin

  /** DuckDB CTE chain ending in `mh_pairs(doc_a, doc_b, jaccard)` — shared by
    * the minhash-pairs oracle, the clustering oracle's recursive closure,
    * and the training-manifest oracle (TextOps).
    */
  private[operators] val minhashPairsCtes: String =
    s"""$hashedShinglesSql,
       |sig AS (
       |  SELECT doc_id, h1,
       |    list_transform(generate_series(0, ${minhashK - 1}),
       |      s -> list_min([(x[1] + s*(x[2]>>4)) & $hashMask FOR x IN list_zip(h1, h2)])) AS sg
       |  FROM hh),
       |bands AS (
       |  SELECT doc_id, b,
       |    array_to_string(list_transform(sg[b*$minhashRows+1:b*$minhashRows+$minhashRows], v -> CAST(v AS VARCHAR)), ',') bk
       |  FROM sig, generate_series(0, ${minhashBands - 1}) t(b)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id da, b.doc_id db
       |  FROM bands a JOIN bands b ON a.b = b.b AND a.bk = b.bk AND a.doc_id < b.doc_id),
       |mh_pairs AS (
       |  SELECT doc_a, doc_b, jaccard FROM (
       |    SELECT da AS doc_a, db AS doc_b,
       |           len(list_intersect(x.h1, y.h1)) / (x.n + y.n - len(list_intersect(x.h1, y.h1))) AS jaccard
       |    FROM cand JOIN hh x ON x.doc_id = da JOIN hh y ON y.doc_id = db)
       |  WHERE jaccard >= $jaccardTau)""".stripMargin

  /** Cross-source contamination audit: near-dup pairs whose two documents
    * came from DIFFERENT sources, rolled up to the unordered source pair
    * with the pair count and how many are verbatim copies (Jaccard = 1).
    * The provenance view of dedup — a hot (src_i, src_j) cell means one
    * feed is re-scraping another, which silently over-weights that content
    * in any per-source mixture budget.
    *
    * Plan: [[minhashPairs]]' banded candidates (never all-pairs), two
    * doc_id equi-joins to attach provenance, a tiny source-pair aggregate.
    * The Jaccard = 1 test is exact on both engines (intersection = union).
    */
  def crossSourcePairs(docs: DataFrame): DataFrame = {
    val src = docs.select(col("doc_id"), col("source"))
    minhashPairs(docs)
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("src_a")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("src_b")), "doc_b")
      .filter(col("src_a") =!= col("src_b"))
      .select(least(col("src_a"), col("src_b")).as("source_a"),
        greatest(col("src_a"), col("src_b")).as("source_b"), col("jaccard"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("jaccard") === 1.0, 1L).otherwise(0L)).as("n_exact"))
  }

  /** One-row corpus dedup summary — the number a curation report LEADS
    * with before any per-doc table: total docs, distinct texts, the exact
    * duplicate fraction (ppm), and the count/fraction of docs involved in
    * at least one verified MinHash near-dup pair. Composes the existing
    * exact aggregate and the banded near-dup plan; both collapse to
    * 1-row frames joined by a broadcast cross.
    */
  def corpusSummary(docs: DataFrame): DataFrame = {
    val exact = docs.agg(count(lit(1)).as("n_docs"),
      countDistinct(md5(col("text"))).as("n_distinct_texts"))
    val near = minhashPairs(docs)
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
      .agg(count(lit(1)).as("n_near_docs"))
    exact.crossJoin(broadcast(near))
      .select(col("n_docs"), col("n_distinct_texts"),
        expr("((n_docs - n_distinct_texts) * 1000000) div n_docs")
          .as("exact_dup_ppm"),
        col("n_near_docs"),
        expr("(n_near_docs * 1000000) div n_docs").as("near_doc_ppm"))
  }

  // --------------------------------------------------------------------------
  // Exact dedup
  // --------------------------------------------------------------------------

  /** Exact dedup groups: md5 text key → canonical (min) doc_id + copy count.
    * One hash-aggregate; at 100 TB group by the 128-bit digest, never the text.
    */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_key"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Survivor set of exact dedup: the canonical doc_id per distinct text.
    * Groups by the 128-bit digest so the shuffle key is 16 bytes, never the
    * document text (collision-negligible; same contract as [[exactGroups]]).
    */
  def exactSurvivors(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_key"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")

  // --------------------------------------------------------------------------
  // Passage-grain exact dedup
  // --------------------------------------------------------------------------

  /** Words per passage for [[passageStats]]. */
  val passageLen = 16

  /** Passage-grain duplicate audit — the sub-document dedup pass (the
    * C4/RefinedWeb recipe): each document is cut into consecutive
    * [[passageLen]]-word chunks (last chunk ragged), a passage is a
    * duplicate iff its md5 appears in ≥ 2 DISTINCT documents, and every
    * doc reports its passage count, duplicated-passage count, and the
    * duplicated fraction on the ppm grid — the per-doc signal a curation
    * pipeline thresholds on ("drop docs that are mostly boilerplate
    * shared with other docs", which doc-grain exact dedup cannot see).
    *
    * Plan: one tokenize+slice pass (all codegen'd `slice`/`array_join`),
    * then a hash-grain aggregate for the distinct-doc count and one join
    * back by the 128-bit digest — the shuffle keys are passage hashes,
    * never passage text, and nothing is quadratic in doc length or corpus
    * size. At 100 TB this is two narrow shuffles at passage grain.
    */
  /** The shared chunk pass: one row per (doc, passage index) with the
    * passage text and its md5 — all codegen (`slice`/`array_join`/`md5`).
    */
  private def passageChunks(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        explode(sequence(lit(0), expr(s"(size(ws) - 1) div $passageLen"))).as("ci"),
        col("ws"))
      .select(col("doc_id"), col("ci"),
        array_join(slice(col("ws"), col("ci") * passageLen + 1, lit(passageLen)), " ")
          .as("passage"))
      .withColumn("h", md5(col("passage")))

  def passageStats(docs: DataFrame): DataFrame = {
    val chunks = passageChunks(docs).select(col("doc_id"), col("h"))
    val dupDocs = chunks.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
    chunks.join(dupDocs, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_passages"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup_passages"))
      .select(col("doc_id"), col("n_passages"), col("n_dup_passages"),
        expr("(n_dup_passages * 1000000) div n_passages").as("dup_ppm"))
  }

  /** The passage-dedup REWRITE: every duplicated passage survives only in
    * its first-writer document (lowest doc_id), and each document is
    * reassembled from its surviving passages in original order — the
    * curation transform [[passageStats]] audits (RefinedWeb-style
    * sub-document boilerplate removal). Documents whose every passage is
    * owned elsewhere drop out entirely, which is the intended behavior for
    * all-boilerplate docs.
    *
    * Plan: same chunk pass as the audit; ownership is a hash-grain
    * `min(doc_id)` aggregate; the rebuild is one doc-grain aggregate whose
    * in-group passage order comes from `array_sort` over (position,
    * passage) structs — no windows, no text-keyed shuffles (passages ride
    * exactly twice: into the ownership join and into the rebuild).
    */
  def passageClean(docs: DataFrame): DataFrame = {
    val chunks = passageChunks(docs)
    val owner = chunks.groupBy(col("h")).agg(min(col("doc_id")).as("first_doc"))
    chunks.join(owner, "h")
      .filter(col("doc_id") === col("first_doc"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("ci"), col("passage")))),
            x => x.getField("passage")), " ").as("clean_text"))
  }

  /** The stored passage-hash index: one row per distinct passage digest
    * with the count of distinct documents containing it. Doc-disjoint
    * batches merge this index by ADDITION (the search-df argument: a doc
    * can only be counted by the batch that owns it), so history is hashed
    * once, ever.
    */
  def passageHashIndex(docs: DataFrame): DataFrame =
    passageChunks(docs).select(col("doc_id"), col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("n_docs"))

  /** Sliding-window span length for [[dedupSpans]]. */
  val spanN = 10

  /** Exact duplicated-SPAN removal — the alignment-free generalization of
    * [[passageClean]] (the ExactSubstr semantic from Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better", re-expressed
    * at token-window grain): every [[spanN]]-token window that occurs more
    * than once in the corpus survives only at its FIRST occurrence
    * (lexicographic min (doc_id, position)); every token covered by a
    * non-first occurrence of any duplicated window is removed, and each
    * document is reassembled from its surviving tokens in original order.
    * Fixed-boundary passage dedup misses a duplicated span that straddles a
    * chunk boundary or starts mid-chunk; the sliding window catches it at
    * any offset. Documents that are entirely duplicated text keep a row
    * with `clean_text = ''` (the curation join wants the grain preserved).
    *
    * Plan: positional windows are hashed ([[graft.functions.Portable
    * .hash60]]) BEFORE any shuffle — raw text is never a shuffle key (the
    * module contract); ownership is one gh-partitioned window min over
    * (doc_id, pos) structs (the [[graft.operators.TextOps.ngramNovelty]]
    * shape — the gram frame shuffles ONCE); coverage is a bounded explode
    * (≤ [[spanN]] rows per redundant window, distinct at token grain); the
    * rebuild is one doc-grain aggregate ordered by `array_sort` over
    * (pos, token) structs — per-group state bounded by document length,
    * never corpus-proportional. At 100 TB: two token-grain narrow passes +
    * one gram-hash shuffle + one doc-grain aggregate, all linear.
    */
  def dedupSpans(docs: DataFrame, n: Int = spanN): DataFrame = {
    val base = docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
    val grams = base.filter(size(col("ws")) >= n)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(1), size(col("ws")) - (n - 1)),
          i => concat_ws(" ", slice(col("ws"), i, lit(n))))))
      .toDF("doc_id", "pos", "gram")
      .select(col("doc_id"), col("pos"),
        graft.functions.Portable.hash60(col("gram")).as("gh"))
    val owned = grams.withColumn("owner",
      min(struct(col("doc_id"), col("pos")))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("gh"))))
    val covered = owned
      .filter(col("owner.doc_id") =!= col("doc_id") || col("owner.pos") =!= col("pos"))
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + (n - 1))).as("cpos"))
      .distinct()
    val toks = base.select(col("doc_id"), posexplode(col("ws")))
      .toDF("doc_id", "pos", "token")
    val kept = toks.join(covered,
      toks("doc_id") === covered("doc_id") && toks("pos") === covered("cpos"),
      "left_anti")
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("token")))),
            x => x.getField("token")), " ").as("clean_text"))
    base.select(col("doc_id"), size(col("ws")).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_covered"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .withColumn("kept_ppm",
        expr("((n_tokens - n_covered) * 1000000) div n_tokens"))
  }

  /** The stored span-gram index for [[dedupSpansIncremental]]: one row per
    * distinct window hash with its first-occurrence owner (min (doc_id,
    * pos)). Doc-disjoint batches merge by keeping the struct-min owner per
    * gh — history is tokenized once, ever (the [[passageHashIndex]]
    * convention at sliding-window grain).
    */
  def spanGramIndex(docs: DataFrame, n: Int = spanN): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= n)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(1), size(col("ws")) - (n - 1)),
          i => concat_ws(" ", slice(col("ws"), i, lit(n))))))
      .toDF("doc_id", "pos", "gram")
      .select(graft.functions.Portable.hash60(col("gram")).as("gh"),
        col("doc_id"), col("pos"))
      .groupBy(col("gh"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("owner"))

  /** [[dedupSpans]] for an ARRIVING batch against stored history — the
    * production loop: clean only the new documents, never re-tokenize the
    * corpus. The effective owner of a window is the struct-min of the
    * STORED owner and the batch's own first occurrence, which is EXACTLY
    * the full recompute's global min when batches are doc-disjoint — so the
    * registered op shares the full rewrite's oracle restricted to the
    * batch. Per batch this costs one batch-grain gram pass + one gh-keyed
    * left join against the index (at 100 TB: batch-sized probe against the
    * bucketed gram index; history contributes only 8-byte hashes + owners).
    */
  def dedupSpansIncremental(stored: DataFrame, newDocs: DataFrame,
      n: Int = spanN): DataFrame = {
    val base = newDocs.select(col("doc_id"), split(col("text"), " ").as("ws"))
    val grams = base.filter(size(col("ws")) >= n)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(1), size(col("ws")) - (n - 1)),
          i => concat_ws(" ", slice(col("ws"), i, lit(n))))))
      .toDF("doc_id", "pos", "gram")
      .select(col("doc_id"), col("pos"),
        graft.functions.Portable.hash60(col("gram")).as("gh"))
    val batchOwned = grams.withColumn("batch_owner",
      min(struct(col("doc_id"), col("pos")))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("gh"))))
    val owned = batchOwned
      .join(stored.select(col("gh"), col("owner").as("stored_owner")), Seq("gh"), "left")
      .withColumn("owner",
        when(col("stored_owner").isNotNull &&
          col("stored_owner") < col("batch_owner"), col("stored_owner"))
          .otherwise(col("batch_owner")))
    val covered = owned
      .filter(col("owner.doc_id") =!= col("doc_id") || col("owner.pos") =!= col("pos"))
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + (n - 1))).as("cpos"))
      .distinct()
    val toks = base.select(col("doc_id"), posexplode(col("ws")))
      .toDF("doc_id", "pos", "token")
    val kept = toks.join(covered,
      toks("doc_id") === covered("doc_id") && toks("pos") === covered("cpos"),
      "left_anti")
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("token")))),
            x => x.getField("token")), " ").as("clean_text"))
    base.select(col("doc_id"), size(col("ws")).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_covered"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        expr("(coalesce(n_kept, 0L) * 1000000) div n_tokens").as("kept_ppm"))
  }

  /** [[passageStats]] for an ARRIVING batch against stored history — the
    * production shape: score only the new documents, never re-chunk the
    * corpus. A new doc's passage is a duplicate iff it exists anywhere in
    * history (`stored n_docs ≥ 1`) OR in ≥ 2 distinct new docs; with
    * doc-disjoint batches that is EXACTLY the full recompute's
    * `total nd ≥ 2` test (total = stored + new, and the passage's own doc
    * always contributes 1 to new) — so the registered op shares the full
    * audit's oracle restricted to the batch.
    *
    * Plan: the batch is chunked once; one hash-grain aggregate over the
    * batch; one digest-keyed left join against the stored index (at
    * 100 TB: batch-sized probe side against the bucketed index, history
    * never re-read beyond the join).
    */
  def passageStatsIncremental(stored: DataFrame, newDocs: DataFrame): DataFrame = {
    val ch = passageChunks(newDocs).select(col("doc_id"), col("h"))
    val newNd = ch.groupBy(col("h")).agg(countDistinct(col("doc_id")).as("new_nd"))
    ch.join(newNd, "h")
      .join(stored.select(col("h"), col("n_docs")), Seq("h"), "left")
      .select(col("doc_id"),
        when(coalesce(col("n_docs"), lit(0L)) >= 1 || col("new_nd") >= 2, 1L)
          .otherwise(0L).as("d"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_passages"), sum(col("d")).as("n_dup_passages"))
      .select(col("doc_id"), col("n_passages"), col("n_dup_passages"),
        expr("(n_dup_passages * 1000000) div n_passages").as("dup_ppm"))
  }

  // --------------------------------------------------------------------------
  // MinHash + LSH
  // --------------------------------------------------------------------------

  /** k min-hashes per doc from the double-hashing family — ONE codegen'd
    * pass over the aligned (h1, h2) arrays ([[graft.functions.MinHashSig]]);
    * the `transform(sequence, s -> array_min(zip_with(...)))` formulation
    * re-traversed both arrays k times in interpreted eval and allocated k
    * zipped temporaries per document.
    */
  def minhashSignatures(hs: DataFrame): DataFrame = {
    GraftExpressions.register(hs.sparkSession)
    hs.withColumn("sig",
      GraftExpressions.minhashSig(col("h1"), col("h2"), minhashK))
  }

  /** Near-dup pairs: band-bucket candidates, then exact shingle-Jaccard ≥ τ.
    * Band join keys are tiny strings → the candidate join shuffles only
    * (doc_id, band_key); verification re-joins hashed shingle sets by doc_id.
    */
  def minhashPairs(docs: DataFrame): DataFrame = {
    GraftExpressions.register(docs.sparkSession)
    // persisted: the signature pass and the verify join both consume the
    // hashed shingles — without the cache the scan+shingle+md5 subtree runs
    // three times (bands + both verify sides). MEMORY_AND_DISK spills cleanly
    // on a real cluster.
    val hs = hashedShingles(docs).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    verifyPairs(lshCandidates(hs), hs)
  }

  /** The band-collision candidate pair set BEFORE Jaccard verification —
    * [[minhashPairs]]' first stage, exposed so the recall report can score
    * the banding scheme itself (a verified pair set can't distinguish "LSH
    * missed it" from "verification rejected it").
    */
  def lshCandidates(hs: DataFrame): DataFrame = {
    val bands = bandsOf(minhashSignatures(hs))
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Banding recall curve: the exact blocked n-gram-Jaccard baseline pairs
    * (j ≥ 0.5, same shingle space) bucketed into 0.05 Jaccard bands, with
    * the fraction of each band that the MinHash banding scheme surfaced as
    * a CANDIDATE — the measured S-curve that validates the (bands × rows)
    * choice against its theoretical `1−(1−j^r)^b`. Low-j bands SHOULD show
    * low recall (that's the point of banding); the τ-relevant bands near 1
    * must be ≈ 1e6.
    *
    * Plan: both pair generators are the existing banded/blocked plans
    * (never all-pairs); scoring is one left join of two pair sets on the
    * pair key + a band-grain aggregate. Integers except the band label.
    */
  def lshRecallReport(docs: DataFrame): DataFrame = {
    GraftExpressions.register(docs.sparkSession)
    val hs = hashedShingles(docs)
    val cand = lshCandidates(hs).withColumn("found", lit(1L))
    ngramJaccardPairs(docs)
      .join(cand, Seq("doc_a", "doc_b"), "left")
      .select(col("jaccard"), coalesce(col("found"), lit(0L)).as("found"))
      .groupBy(floor(col("jaccard") * 20).as("band"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("found")).as("n_found"))
      .select((col("band").cast(DoubleType) / 20).as("tau_lo"),
        col("n_pairs"), col("n_found"),
        expr("(n_found * 1000000) div n_pairs").as("recall_ppm"))
  }

  /** Exact shingle-Jaccard verification of candidate (doc_a, doc_b) pairs
    * against a (doc_id, h1, n) hash-set frame — the contract BOTH the batch
    * and the incremental path must share, or "incremental ≡ filtered full
    * pair set" silently breaks.
    */
  private def verifyPairs(cand: DataFrame, h: DataFrame): DataFrame =
    cand
      .join(h.select(col("doc_id").as("doc_a"), col("h1").as("sh_a"), col("n").as("n_a")), "doc_a")
      .join(h.select(col("doc_id").as("doc_b"), col("h1").as("sh_b"), col("n").as("n_b")), "doc_b")
      .withColumn("inter", GraftExpressions.sortedIntersectCount(col("sh_a"), col("sh_b")))
      .select(col("doc_a"), col("doc_b"),
        jaccardFromInter(col("inter"), col("n_a"), col("n_b")).as("jaccard"))
      .filter(col("jaccard") >= jaccardTau)

  /** |A∩B| / (|A|+|B|−|A∩B|): one intersection instead of intersect+union —
    * valid because the hashed shingle arrays are sets.
    */
  private def jaccardFromInter(inter: Column, na: Column, nb: Column): Column =
    inter / (na + nb - inter)

  // --------------------------------------------------------------------------
  // SimHash
  // --------------------------------------------------------------------------

  /** 32-bit SimHash over the hashed shingle set: bit j is the sign of Σ ±1
    * weighted by bit j of each shingle's h1. ONE codegen'd pass over the h1
    * array ([[graft.functions.SimHash32]]) — the earlier 32-`aggregate`-HOF
    * formulation re-traversed every shingle array 32× in interpreted eval and
    * was the bench's single hottest query.
    */
  def simhashDocs(docs: DataFrame): DataFrame = {
    GraftExpressions.register(docs.sparkSession)
    hashedShingles(docs)
      .select(col("doc_id"), GraftExpressions.simhash32(col("h1")).as("simhash"))
  }

  private val simhashOfSql: String =
    (0 until simhashBits).map { j =>
      s"(CASE WHEN list_sum([CASE WHEN (h>>$j)&1=1 THEN 1 ELSE -1 END FOR h IN h1]) > 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" + ")

  private val simhashDocsSql =
    s"""$hashedShinglesSql,
       |simdocs AS (SELECT doc_id, $simhashOfSql AS simhash FROM hh)""".stripMargin

  /** Near-dup pairs by SimHash: block on each of the 4 bytes (bands are a
    * recall/cost dial, as with MinHash), verify with exact Hamming distance.
    */
  def simhashPairs(docs: DataFrame): DataFrame = {
    // persisted: the self-join would otherwise run the full shingle+hash+
    // 32-bit-aggregate subtree once per side.
    val sd = simhashDocs(docs).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = sd.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("simhash"), b * 8).bitwiseAND(lit(255L))): _*)))
      .toDF("doc_id", "simhash", "band", "band_key")
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= hammingMax)
  }

  // --------------------------------------------------------------------------
  // N-gram Jaccard with length blocking
  // --------------------------------------------------------------------------

  /** Per-length-bucket PARTICIPANT cap for the exact verification baselines
    * ([[ngramJaccardPairs]], [[jaccardThresholdSweep]], the exact side of
    * [[lshRecallReport]]). Their contract is exact all-candidate
    * verification, which is inherently quadratic WITHIN a length bucket —
    * fine at audit scale, a hang at 100×. The cap bounds every bucket's
    * candidate set at C(cap, 2) so the exact baseline degrades MEASURABLY
    * (each output row carries its bucket's overflow; the sweep reports the
    * corpus-total dropped-doc count) instead of exploding — the
    * [[Analytics.basketMaxItems]] precedent. Membership under the cap is
    * deterministic (the bucket's `cap` lowest doc_ids), so results are
    * partitioning- and engine-invariant; the banded MinHash family remains
    * the uncapped scale path.
    */
  val exactPairDocCap = 2000

  /** The capped per-bucket shingle frame feeding the exact baselines:
    * (doc_id, bucket, sh, n, bucket_overflow) restricted to each bucket's
    * [[exactPairDocCap]] lowest doc_ids, plus the bucket-grain stats frame
    * (bucket, n_docs, n_docs_dropped).
    *
    * Ranking uses [[Analytics.withGlobalRowNumber]] on a SKINNY
    * (doc_id, bucket) projection sorted by (bucket, doc_id) — a
    * bucket-partitioned window would be |buckets| straggler tasks at corpus
    * scale (buckets are few and huge); per-bucket ranks are recovered by
    * subtracting each bucket's broadcast min-rank offset (the
    * [[TextOps.qualityPercentileByLang]] recipe).
    */
  private[graft] def cappedShingleBuckets(docs: DataFrame,
      cap: Int = exactPairDocCap): (DataFrame, DataFrame) = {
    GraftExpressions.register(docs.sparkSession)
    val hs = docs
      .repartition(graft.Scale.partitionsFor(docs))
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= shingleN)
      .select(col("doc_id"),
        (length(col("text")).cast(LongType) / lit(50L)).cast(LongType).as("bucket"),
        array_sort(transform(shingles(col("w"), shingleN), x => hexToLong(md5(x), 1))).as("sh"))
      .withColumn("n", size(col("sh")))
    val (ranked, _) = Analytics.withGlobalRowNumber(
      hs.select(col("doc_id"), col("bucket")), "grk",
      Seq(col("bucket"), col("doc_id")))
    val bounds = ranked.groupBy(col("bucket"))
      .agg(min(col("grk")).as("b_off"), count(lit(1)).as("n_docs"))
    val stats = bounds.select(col("bucket"), col("n_docs"),
      greatest(col("n_docs") - lit(cap.toLong), lit(0L)).as("n_docs_dropped"))
    val kept = ranked.join(broadcast(bounds.select(col("bucket"), col("b_off"),
        greatest(col("n_docs") - lit(cap.toLong), lit(0L)).as("bucket_overflow"))),
        "bucket")
      .filter(col("grk") - col("b_off") < lit(cap.toLong))
      .select(col("doc_id"), col("bucket_overflow"))
    (hs.join(kept, "doc_id"), stats)
  }

  /** One-entry [[graft.SharedCheckpoint]] memo of the capped-shingle frames,
    * keyed by (session, input plan — `sameResult`-confirmed, cap). The three exact-baseline
    * queries ([[ngramJaccardPairs]], [[jaccardThresholdSweep]],
    * [[lshRecallReport]]) start from the identical rank-capped subtree and
    * the driver harnesses run them back to back, so without sharing the
    * suite pays the global-rank + cap pass three times (they were bench
    * ranks 1/2/4 in r7). `localCheckpoint` rather than `persist` because
    * the harnesses clear the SQL cache between queries; the frames are
    * [[graft.Release.retain]]ed so the harness's inter-query RDD release
    * (which DOES drop checkpoint blocks — the r8 sf10 OOM fix) leaves
    * exactly these resident. A new key (different fixture, session, or
    * cap) replaces the entry and unretains the old frames — their blocks
    * go at the next inter-query release. At most one corpus's frames are
    * ever resident (doc-grain shingle arrays — the size of one stored
    * minhash index shard, not the corpus).
    */
  private val cappedShingleMemo = new graft.SharedCheckpoint[Int]

  private[graft] def cappedShingleShared(docs: DataFrame,
      cap: Int = exactPairDocCap): (DataFrame, DataFrame) = {
    val Seq(hs, stats) = cappedShingleMemo.getOrBuild(docs, cap) { d =>
      val (h, s) = cappedShingleBuckets(d, cap)
      Seq(h, s)
    }
    (hs, stats)
  }

  /** Direct shingle-Jaccard ≥ 0.5 restricted to same length-bucket
    * (`length div 50`) AND compatible set sizes (j ≥ 0.5 forces
    * min(n)/max(n) ≥ 0.5 — the ratio prefilter prunes pairs with two int
    * compares before any array op runs). Participants are bounded per bucket
    * by [[exactPairDocCap]]; every pair carries its bucket's overflow count
    * (0 everywhere the cap did not bite).
    */
  def ngramJaccardPairs(docs: DataFrame, cap: Int = exactPairDocCap): DataFrame = {
    val (hs, _) = cappedShingleShared(docs, cap)
    // NOTE the bucket key has only ~|length range|/50 distinct values — at
    // fixture scale Spark already plans this small self-join well, and at
    // corpus scale the right side must NOT be broadcast (it is the whole
    // corpus, not a dim); skew beyond AQE's split goes through salting
    // (Relational.saltedLeftJoin shape). The cap above bounds any bucket's
    // within-bucket pair count at C(cap, 2).
    hs.as("a").join(hs.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id")
          && col("a.n") <= lit(2) * col("b.n") && col("b.n") <= lit(2) * col("a.n"))
      .withColumn("inter", GraftExpressions.sortedIntersectCount(col("a.sh"), col("b.sh")))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        jaccardFromInter(col("inter"), col("a.n"), col("b.n")).as("jaccard"),
        col("a.bucket_overflow").as("bucket_overflow"))
      .filter(col("jaccard") >= 0.5)
  }

  /** Per-band pair counts over the [[ngramJaccardPairs]] candidates — the
    * τ-tuning curve (bands of 0.05 on [0.5, 1]; the 0.5 floor is the
    * blocking guarantee's validity bound, so the sweep covers exactly the
    * τ range the pipeline could actually enforce). Every row carries the
    * corpus-total count of docs the [[exactPairDocCap]] excluded — the loud
    * "this curve is over a capped baseline" marker (0 until the cap bites).
    */
  def jaccardThresholdSweep(docs: DataFrame, cap: Int = exactPairDocCap): DataFrame = {
    val (hs, stats) = cappedShingleShared(docs, cap)
    val dropped = stats.agg(
      coalesce(sum(col("n_docs_dropped")), lit(0L)).cast(LongType).as("n_docs_dropped"))
    hs.as("a").join(hs.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id")
          && col("a.n") <= lit(2) * col("b.n") && col("b.n") <= lit(2) * col("a.n"))
      .withColumn("inter", GraftExpressions.sortedIntersectCount(col("a.sh"), col("b.sh")))
      .select(jaccardFromInter(col("inter"), col("a.n"), col("b.n")).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
      .groupBy(floor(col("jaccard") * 20).as("band"))
      .agg(count(lit(1)).as("n_pairs"))
      .select((col("band").cast(DoubleType) / 20).as("tau_lo"), col("n_pairs"))
      .crossJoin(broadcast(dropped)) // 1-row frame (the A/B-gate precedent)
  }

  /** Oracle CTE chain for the capped exact baseline, ending in
    * `njp(doc_a, doc_b, jaccard, bucket_overflow)` and the 1-row
    * `njdrop(n_docs_dropped)` — shared by the pair op, the sweep, and the
    * recall report. The rank/cap is the same deterministic rule the Spark
    * side applies (each bucket's [[exactPairDocCap]] lowest doc_ids).
    */
  private lazy val ngramJaccardCtes: String =
    s"""shb AS (
       |  SELECT doc_id, CAST(length(text) AS BIGINT) // 50 AS bucket,
       |         list_transform(${shinglesSql("w", shingleN)}, x -> ${hexToLongSql("md5(x)", 1)}) AS sh
       |  FROM (SELECT doc_id, text, string_split(text, ' ') w FROM documents)
       |  WHERE len(w) >= $shingleN),
       |shr AS (SELECT doc_id, bucket, sh, len(sh) AS n,
       |               row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rk,
       |               count(*) OVER (PARTITION BY bucket) AS nb
       |        FROM shb),
       |shn AS (SELECT doc_id, bucket, sh, n,
       |               CAST(greatest(nb - $exactPairDocCap, 0) AS BIGINT) AS bucket_overflow
       |        FROM shr WHERE rk <= $exactPairDocCap),
       |njp AS (
       |  SELECT doc_a, doc_b, jaccard, bucket_overflow FROM (
       |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |           len(list_intersect(a.sh, b.sh)) / (a.n + b.n - len(list_intersect(a.sh, b.sh))) AS jaccard,
       |           a.bucket_overflow
       |    FROM shn a JOIN shn b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
       |      AND a.n <= 2*b.n AND b.n <= 2*a.n)
       |  WHERE jaccard >= 0.5),
       |njdrop AS (SELECT CAST(COALESCE(SUM(greatest(nb - $exactPairDocCap, 0)), 0) AS BIGINT) AS n_docs_dropped
       |           FROM (SELECT bucket, MAX(nb) AS nb FROM shr GROUP BY bucket))""".stripMargin

  /** Containment threshold as an exact rational (4/5): the criterion is the
    * all-integer `5·inter ≥ 4·min(n_a, n_b)`, so no float boundary can
    * disagree between engines or break the prefix-filter guarantee.
    */
  val containNum = 4
  val containDen = 5

  /** Asymmetric near-subset detection: pairs where the smaller document's
    * shingle set is ≥ 4/5 contained in the other's — the quote/boilerplate/
    * wrapper case Jaccard misses (a 100-word doc quoted inside a 10 000-word
    * doc has tiny Jaccard but containment ≈ 1, so length blocking can never
    * pair them).
    *
    * Blocking is PREFIX FILTERING (the public PPJoin-family bound): if
    * `5·inter ≥ 4·n_a` then one of A's `n_a div 5 + 1` SMALLEST hashes must
    * occur in B — else inter ≤ n_a − (n_a div 5 + 1), and 5·inter ≤ 4·n_a − 1.
    * So each doc probes only its prefix against the inverted shingle index,
    * the candidate join keys on a single shingle hash, and verification is
    * one [[graft.functions.SortedIntersectCount]] merge-scan per candidate.
    * Lossless by the bound above — the brute-force oracle states exactly the
    * same pair set. Like [[ngramJaccardPairs]] this is the documented exact
    * baseline; MinHash remains the probabilistic scale path.
    */
  def containmentPairs(docs: DataFrame): DataFrame = {
    GraftExpressions.register(docs.sparkSession)
    val hs = docs
      .repartition(graft.Scale.partitionsFor(docs))
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= shingleN)
      .select(col("doc_id"),
        array_sort(transform(shingles(col("w"), shingleN), x => hexToLong(md5(x), 1))).as("sh"))
      .withColumn("n", size(col("sh")))
      .localCheckpoint() // consumed three times: prefix probe, index, verify
    val prefix = hs.select(col("doc_id").as("pid"),
      explode(slice(col("sh"), lit(1), expr(s"n div $containDen + 1"))).as("h"))
    val index = hs.select(col("doc_id").as("iid"), explode(col("sh")).as("h"))
    val candidates = prefix.join(index, "h")
      .filter(col("pid") =!= col("iid"))
      .select(least(col("pid"), col("iid")).as("doc_a"),
        greatest(col("pid"), col("iid")).as("doc_b"))
      .distinct()
    candidates
      .join(hs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("n").as("n_a")), "doc_a")
      .join(hs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("n").as("n_b")), "doc_b")
      .withColumn("inter", GraftExpressions.sortedIntersectCount(col("sh_a"), col("sh_b")))
      .filter(col("inter") * containDen >= least(col("n_a"), col("n_b")) * containNum)
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast(DoubleType) / least(col("n_a"), col("n_b"))).as("containment"))
  }

  // --------------------------------------------------------------------------
  // Incremental dedup against a stored signature index
  // --------------------------------------------------------------------------

  /** The per-document signature INDEX an incremental pipeline persists:
    * (doc_id, h1 sorted shingle hashes, n, sig minhash signature). Computing
    * this is the expensive pass (shingle + md5 + minhash over the text);
    * everything downstream (band keys, verification) derives from these
    * columns without touching the text again — so a production store appends
    * each batch's rows here once and never re-hashes the corpus.
    */
  def minhashIndex(docs: DataFrame): DataFrame =
    minhashSignatures(hashedShingles(docs))
      .select(col("doc_id"), col("h1"), col("n"), col("sig"))

  /** Band rows from stored signatures — a narrow explode, free next to the
    * hashing pass the index already paid.
    */
  private def bandsOf(idx: DataFrame): DataFrame =
    idx.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(minhashBands - 1)),
        b => concat_ws(",",
          transform(slice(col("sig"), b * minhashRows + 1, lit(minhashRows)),
            v => v.cast(StringType))))))
      .toDF("doc_id", "band", "band_key")

  /** Incremental near-dup detection: all pairs involving at least one NEW
    * document — new-vs-corpus via a band join against the stored index,
    * new-vs-new among the batch itself; corpus-vs-corpus is never touched.
    * Per batch this costs O(|batch| hashing + band-bucket joins); the corpus
    * contributes only its stored band keys and shingle hashes. That is the
    * production dedup loop at 100 TB: the corpus is hashed exactly once,
    * ever.
    *
    * Caller contract: `newDocs` ids are disjoint from the index, and the
    * CALLER owns the index's caching — pass a stored-table read (already
    * cheap to re-scan) or persist a computed lineage yourself; this function
    * consumes `index` twice (band join + verification union) but does not
    * persist a frame it doesn't own. The batch-local signature frame it
    * DOES create is persisted internally and unpersisted by the session's
    * normal cache lifecycle (`clearCache` between queries; long-running
    * drivers appending many batches should store each batch's index rows
    * anyway — at which point both sides are stored-table reads).
    */
  def incrementalMinhashPairs(newDocs: DataFrame, index: DataFrame): DataFrame = {
    GraftExpressions.register(newDocs.sparkSession)
    val newIdx = minhashIndex(newDocs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val newBands = bandsOf(newIdx)
    val nc = newBands.as("a").join(bandsOf(index).as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
    val nn = newBands.as("a").join(newBands.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val cand = nc.union(nn).distinct()
    val h = index.select(col("doc_id"), col("h1"), col("n"))
      .union(newIdx.select(col("doc_id"), col("h1"), col("n")))
    verifyPairs(cand, h)
  }

  // --------------------------------------------------------------------------
  // Duplicate clustering (connected components over near-dup pairs)
  // --------------------------------------------------------------------------

  /** Connected components by alternating large-star/small-star rounds (the
    * public Kiveris et al. algorithm, "Connected Components in MapReduce and
    * Beyond", SoCC'14): each round rewires every edge toward the minimum id
    * seen in a neighborhood, converging to star graphs rooted at each
    * component's minimum in O(log² n) rounds — independent of component
    * DIAMETER, where plain min-label propagation pays one round per hop and
    * an adversarial chain outruns any fixed round budget.
    *
    * Scale design (100 TB): each half-round is one hash-aggregate (per-node
    * min) plus one equi-join on node id plus a distinct — no driver-side
    * graph state, edges never leave the cluster. `localCheckpoint` truncates
    * the growing lineage each round (a real cluster job would checkpoint to
    * reliable storage instead).
    *
    * Convergence check: edge count + endpoint sums as a cheap per-round
    * checksum; only when the checksum goes flat is set equality confirmed
    * with one exact `except` — so the O(shuffle) exactness test runs once at
    * the fixpoint, not every round.
    *
    * Small-graph fast path: at or below `driverMaxPairs` edges (≤ ~16 MB —
    * the same order as Spark's broadcast threshold) the pair set is
    * union-found on the driver in one collect, because even one distributed
    * round costs more scheduling than the whole tiny graph is worth. The
    * labels are identical by construction (component minimum either way;
    * DedupSpec pins path equality), so the oracle covers both. Pass
    * `driverMaxPairs = 0` to force the distributed rounds.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
      driverMaxPairs: Long = 1L << 20): DataFrame = {
    // materialize the pair set ONCE: the candidate pipeline upstream (band
    // join + verify join for minhash pairs) must not re-run per round
    val p = pairs.localCheckpoint()
    if (p.count() <= driverMaxPairs) return driverUnionFind(p)
    // canonical orientation: u = larger endpoint, v = smaller
    var edges = p
      .select(greatest(col("doc_a"), col("doc_b")).as("u"),
        least(col("doc_a"), col("doc_b")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint()

    // large-star: every neighbor LARGER than u re-attaches to the minimum of
    // u's closed neighborhood — long tails collapse onto small ids. Output
    // may carry duplicate edges; small-star's terminal distinct dedups the
    // ROUND, so no exchange is spent deduping here.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u"))
        .agg(min(col("v")).as("mn"))
        .select(col("u").as("c"), least(col("u"), col("mn")).as("m"))
      sym.filter(col("v") > col("u"))
        .join(mins, col("u") === col("c"))
        .select(col("v").as("u"), col("m").as("v")) // v > u ≥ m keeps orientation
        .filter(col("u") =!= col("v"))
    }

    // small-star: every neighbor at most u (edges are canonical, so all of
    // Γ(u)) plus u itself attach to u's minimum neighbor. Both emissions
    // come off the single joined frame via explode — no second branch
    // re-reading the aggregate, one terminal distinct for the whole round.
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy(col("u")).agg(min(col("v")).as("m"))
      e.join(mins, "u")
        .select(explode(array(col("v"), col("u"))).as("node"), col("m"))
        .filter(col("node") =!= col("m")) // node ∈ Γ(u) ∪ {u}, node ≥ m
        .select(col("node").as("u"), col("m").as("v"))
        .distinct()
    }

    def checksum(e: DataFrame): (Long, Option[BigDecimal], Option[BigDecimal]) = {
      val r = e.agg(count(lit(1)),
        sum(col("u")).cast(DecimalType(38, 0)),
        sum(col("v")).cast(DecimalType(38, 0))).collect()(0)
      (r.getLong(0), Option(r.getDecimal(1)).map(BigDecimal(_)),
        Option(r.getDecimal(2)).map(BigDecimal(_)))
    }

    var prev = checksum(edges)
    var converged = prev._1 == 0 // no edges: trivially a (empty) star set
    var iter = 0
    while (!converged && iter < maxIter) {
      // localCheckpoint EVERY round: materializes the round in one job AND
      // truncates lineage. Truncation is not optional hygiene here — each
      // star round references its input frame several times, so an
      // untruncated logical plan grows multiplicatively per round and the
      // per-action plan walk (UI description / explain of a tree with that
      // much sharing) dominates wall time long before execution does. A
      // real cluster job would checkpoint to reliable storage instead;
      // superseded round blocks are retired by the ContextCleaner once
      // unreferenced.
      val next = smallStar(largeStar(edges)).localCheckpoint()
      val cur = checksum(next)
      // checksum-flat is necessary, not sufficient — confirm set equality
      // exactly (both sides are distinct sets, so equal counts + empty
      // difference ⇔ equal sets); runs ~once, at the fixpoint
      converged = cur == prev && next.exceptAll(edges).isEmpty
      prev = cur
      edges = next
      iter += 1
    }
    // an unconverged exit would silently report one real component as several
    // clusters — fail loudly instead (recovery: raise maxIter; rounds scale
    // with log² n, so hitting this means something is structurally wrong)
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge within $maxIter rounds")
    // fixpoint is a star forest: non-roots point straight at the component
    // minimum; roots label themselves. Materialized (node-grain, small) so
    // superseded round blocks can retire before the caller executes its plan.
    val labels = edges.select(col("u").as("node"), col("v").as("label"))
      .union(edges.select(col("v").as("node"), col("v").as("label")))
      .distinct()
      .localCheckpoint()
    edges.unpersist(false)
    labels
  }

  /** Driver union-find over a tiny collected pair set, union-by-minimum with
    * path compression — every root is its component's minimum id, matching
    * the star rounds' labeling exactly.
    */
  private def driverUnionFind(p: DataFrame): DataFrame = {
    val spark = p.sparkSession
    import spark.implicits._
    val es = p.selectExpr("cast(doc_a as long)", "cast(doc_b as long)")
      .as[(Long, Long)].collect()
    val parent = scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      // merging under the smaller root keeps every root the component min:
      // a node below its root would have been a root itself at insertion
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keysIterator.map(n => (n, find(n))).toSeq.toDF("node", "label")
  }

  /** One row per document: its duplicate-cluster id (min doc_id of its
    * MinHash near-dup component; docs with no near-dup are their own cluster).
    * The downstream curation join: keep `doc_id == cluster_id`.
    *
    * Memoized per (session, input plan) via [[graft.SharedCheckpoint]]: the
    * iterative connected-components stage is the priciest subtree of every
    * consumer — the dedup cluster family, the leakage-safe split, and all
    * THREE manifests (training / curation / cross-modal) — and the label
    * frame is doc-grain, so one build serves the whole suite (the
    * production shape: cluster labels are computed once per corpus version
    * and read everywhere).
    *
    * The memo is ONE-ENTRY by design (bounded resident blocks), so do NOT
    * call this on a sub-corpus plan (a fixture's history split, a sampled
    * slice) from code that shares a session with full-corpus consumers: the
    * sub-corpus key evicts the full entry and bills a complete re-cluster
    * to the next full-corpus caller (measured r12: an incremental op's
    * history-split call here turned dedup_cluster_survivors from 49 ms
    * memo-warm into a 15.6 s rebuild every suite pass). For one-off stored-
    * state fixtures, build labels directly — `connectedComponents(
    * minhashPairs(subset))` with a caller-owned persist.
    */
  def clusters(docs: DataFrame): DataFrame =
    clustersMemo.getOrBuild(docs, ()) { d =>
      Seq(d.select(col("doc_id"))
        .join(connectedComponents(minhashPairs(d))
            .select(col("node").as("doc_id"), col("label").as("cid")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("cid"), col("doc_id")).as("cluster_id")))
    }.head

  private val clustersMemo = new graft.SharedCheckpoint[Unit]

  // --------------------------------------------------------------------------
  // Leakage-safe train/val/test split (cluster-keyed)
  // --------------------------------------------------------------------------

  /** Cluster-keyed train/val/test split: the split hash is taken on the
    * document's near-dup CLUSTER id, not its own id, so every member of a
    * near-dup cluster lands in the same split — the leakage guard the
    * doc-keyed split ([[graft.operators.TextOps.splitAssign]]) cannot give
    * (a near-identical train/test doc pair is memorized eval data). Same
    * hash and bucket rule as the doc-keyed split, so the two assignments are
    * directly comparable in [[splitLeakageAudit]]. Cost over plain
    * splitAssign: the cluster labels — which a dedup pipeline has already
    * computed (composes [[clusters]]; at 100 TB the label frame is doc-grain
    * and the bucket pass is narrow codegen on top of it).
    */
  def clusterSplitAssign(docs: DataFrame): DataFrame =
    clusters(docs)
      .withColumn("bucket",
        pmod(hash60(col("cluster_id").cast(StringType)), lit(100)))
      .withColumn("split",
        when(col("bucket") < TextOps.splitTrainUpper, "train")
          .when(col("bucket") < TextOps.splitValUpper, "val")
          .otherwise("test"))

  /** Split-leakage audit: for every MinHash near-dup pair, do the two sides
    * land in the same split? One row: the pair count, how many pairs
    * straddle splits under the doc-keyed assignment (leaked — eval contains
    * a near-copy of training data), the leak rate on the ppm grid, and the
    * same count under the cluster-keyed assignment (zero by construction —
    * both endpoints of a pair share a component, hence a cluster id, hence a
    * bucket; computing it here machine-checks that claim every run). This is
    * the report that justifies paying for cluster labels before splitting.
    *
    * Plan: banded near-dup pairs (never all-pairs) + four doc_id equi-joins
    * to attach the two assignments, collapsed to one row.
    */
  def splitLeakageAudit(docs: DataFrame): DataFrame = {
    val na = TextOps.splitAssign(docs).select(col("doc_id"), col("split"))
    val cl = clusterSplitAssign(docs).select(col("doc_id"), col("split"))
    minhashPairs(docs)
      .join(na.select(col("doc_id").as("doc_a"), col("split").as("na_a")), "doc_a")
      .join(na.select(col("doc_id").as("doc_b"), col("split").as("na_b")), "doc_b")
      .join(cl.select(col("doc_id").as("doc_a"), col("split").as("cl_a")), "doc_a")
      .join(cl.select(col("doc_id").as("doc_b"), col("split").as("cl_b")), "doc_b")
      .agg(count(lit(1)).as("n_pairs"),
        coalesce(sum(when(col("na_a") =!= col("na_b"), 1L).otherwise(0L)), lit(0L))
          .as("n_leaked_doc_keyed"),
        coalesce(sum(when(col("cl_a") =!= col("cl_b"), 1L).otherwise(0L)), lit(0L))
          .as("n_leaked_cluster_keyed"))
      .select(col("n_pairs"), col("n_leaked_doc_keyed"),
        when(col("n_pairs") === 0L, 0L)
          .otherwise(expr("(n_leaked_doc_keyed * 1000000) div n_pairs"))
          .as("leak_ppm_doc_keyed"),
        col("n_leaked_cluster_keyed"))
  }

  /** Incremental duplicate clustering: fold a new batch's near-dup pairs
    * into STORED cluster labels without re-clustering the corpus. A star
    * forest (node → label) is connectivity-equivalent to the pair set it
    * was computed from — the union-find invariant — so connected components
    * over (label edges ∪ batch pairs) yields exactly the labels a full
    * re-cluster of every pair ever seen would, at the cost of the label
    * table (node-grain) plus the batch pairs; the historical pair set is
    * never revisited. Together with [[incrementalMinhashPairs]] this closes
    * the loop: per batch, hash only the batch, band-join only the batch,
    * and merge only the batch's pairs.
    */
  def updateClusters(labels: DataFrame, newPairs: DataFrame): DataFrame =
    connectedComponents(
      labels.filter(col("node") =!= col("label"))
        .select(col("node").as("doc_a"), col("label").as("doc_b"))
        .union(newPairs.select(col("doc_a"), col("doc_b"))))

  /** Canonical survivor per near-dup cluster: the highest-quality document
    * wins (ties → lowest doc_id) — the decision [[clusters]] feeds: not just
    * WHICH documents duplicate each other but which copy to KEEP. Quality is
    * [[TextOps.qualityScore]]'s composite (already bit-identical to the
    * DuckDB oracle), so the argmax is deterministic on both engines.
    *
    * Scale shape: one equi-join on doc_id, then one hash aggregate at
    * cluster grain whose `max_by` keeps ≤1 candidate per cluster per task
    * map-side — no per-cluster sort, no window over the corpus.
    */
  def clusterSurvivors(docs: DataFrame): DataFrame =
    clusterSurvivors(docs, clusters(docs))

  /** [[clusterSurvivors]] over PRECOMPUTED cluster labels (the frame
    * [[clusters]] returns). Composites that need both the labels and the
    * survivors ([[TextOps.trainingManifest]]) call [[clusters]] once and
    * pass the result here — the iterative connected-components stage (the
    * priciest subtree, executed eagerly via per-round localCheckpoint) runs
    * once instead of twice; referencing its checkpointed output from two
    * places re-reads cached blocks, it does not re-run the loop.
    */
  def clusterSurvivors(docs: DataFrame, labels: DataFrame): DataFrame =
    labels
      .join(TextOps.qualityScore(docs).select(col("doc_id"), col("quality")), Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(
        max_by(struct(col("doc_id"), col("quality")),
          struct(col("quality"), -col("doc_id"))).as("w"),
        count(lit(1)).as("cluster_size"))
      .select(col("cluster_id"), col("w.doc_id").as("survivor_id"),
        col("w.quality").as("survivor_quality"), col("cluster_size"))

  // --------------------------------------------------------------------------
  // Embedding cosine near-dup (LSH-bucketed)
  // --------------------------------------------------------------------------

  /** Integer hyperplane coefficients — exact in both engines. */
  def planeCoefs(p: Int): Seq[Int] = (0 until 64).map(i => ((i * 31 + p * 17) % 7) - 3)

  /** 8-bit sign-projection LSH bucket of an embedding. Exact integer dot
    * products over the quantized grid → the sign (hence the bucket) is
    * identical on every engine.
    */
  def lshBucket(emb: Column): Column =
    (0 until 8).map { p =>
      val dot = aggregate(
        zip_with(emb, typedLit(planeCoefs(p)),
          (x, c) => c.cast(LongType) * floor(x.cast(DoubleType) * lit(GraftExpressions.Quant))),
        lit(0L), (acc, v) => acc + v)
      when(dot > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  def lshBucketSql(emb: String): String =
    (0 until 8).map { p =>
      val coefs = planeCoefs(p).mkString("[", ", ", "]")
      s"(CASE WHEN list_sum([x[2] * ${GraftExpressions.quantSql("x[1]")} FOR x IN list_zip($emb, $coefs)]) > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")

  /** vec_id, embedding, bucket, and the quantized squared norm — computed
    * ONCE per vector, not once per pair (norms are half the cost of a naive
    * cosine).
    */
  def bucketedWithNorm(embs: DataFrame): DataFrame = {
    GraftExpressions.register(embs.sparkSession)
    embs
      .repartition(graft.Scale.partitionsFor(embs))
      .select(col("vec_id"), col("embedding"),
      lshBucket(col("embedding")).as("bucket"),
      GraftExpressions.qdot(col("embedding"), col("embedding")).as("n2"))
  }

  val bucketedWithNormSql: String =
    s"""bv AS (
       |  SELECT vec_id, embedding, ${lshBucketSql("embedding")} AS bucket,
       |         ${GraftExpressions.qdotSql("embedding", "embedding")} AS n2
       |  FROM embeddings)""".stripMargin

  /** Quantized cosine from a precomputed-norm pair — single codegen'd integer
    * dot + two IEEE sqrt/divide ops.
    */
  def cosQ(embA: Column, embB: Column, n2A: Column, n2B: Column): Column =
    GraftExpressions.qdot(embA, embB).cast(DoubleType) /
      (sqrt(n2A.cast(DoubleType)) * sqrt(n2B.cast(DoubleType)))

  def cosQSql(a: String, b: String): String =
    s"CAST(${GraftExpressions.qdotSql(s"$a.embedding", s"$b.embedding")} AS DOUBLE)" +
      s" / (sqrt(CAST($a.n2 AS DOUBLE)) * sqrt(CAST($b.n2 AS DOUBLE)))"

  /** Embedding near-dup: candidates share an LSH bucket, verified by exact
    * quantized cosine ≥ τ. (Recall < 1 by construction — the scale path;
    * brute-force cosine is [[Similarity.bruteForceTopK]] for bounded query
    * sets.)
    */
  def embeddingNearDups(embs: DataFrame): DataFrame = {
    val b = bucketedWithNorm(embs)
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosQ(col("a.embedding"), col("b.embedding"), col("a.n2"), col("b.n2")).as("cos"))
      .filter(col("cos") >= cosineTau)
  }

  // --------------------------------------------------------------------------
  // Registered ops + DuckDB oracles
  // --------------------------------------------------------------------------

  /** Full-corpus clustering oracle (recursive-CTE reachability + min label),
    * shared by the one-shot and incremental clustering ops — the incremental
    * op's contract is exactly "lands on the full re-cluster's labels".
    */
  private lazy val clustersOracleSql: String =
    s"""WITH RECURSIVE $minhashPairsCtes,
       |edges AS (
       |  SELECT doc_a AS a, doc_b AS b FROM mh_pairs
       |  UNION ALL SELECT doc_b, doc_a FROM mh_pairs),
       |reach(node, r) AS (
       |  SELECT DISTINCT a, a FROM edges
       |  UNION
       |  SELECT reach.node, e.b FROM reach JOIN edges e ON e.a = reach.r),
       |lab AS (SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node)
       |SELECT d.doc_id, COALESCE(lab.cluster_id, d.doc_id) AS cluster_id
       |FROM documents d LEFT JOIN lab ON lab.node = d.doc_id""".stripMargin

  /** Shared span-rewrite oracle CTEs ending in `w(doc_id, ws)` and
    * `reb(doc_id, n_kept, clean_text)` — the full-corpus rewrite both span
    * ops project from (the incremental op adds only its batch filter).
    */
  private lazy val spanRewriteCtes: String =
    s"""w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |g0 AS (SELECT doc_id, ws,
       |              unnest(generate_series(1, len(ws) - ${spanN - 1})) AS i
       |       FROM w WHERE len(ws) >= $spanN),
       |g AS (SELECT doc_id, i - 1 AS pos,
       |             ${hash60Sql(s"array_to_string(ws[i:i+${spanN - 1}], ' ')")} AS gh
       |      FROM g0),
       |own AS (SELECT doc_id, pos, gh,
       |               FIRST_VALUE(doc_id) OVER win AS od,
       |               FIRST_VALUE(pos) OVER win AS op
       |        FROM g WINDOW win AS (PARTITION BY gh ORDER BY doc_id, pos)),
       |cov0 AS (SELECT doc_id, pos, unnest(generate_series(0, ${spanN - 1})) AS dd
       |         FROM own WHERE od <> doc_id OR op <> pos),
       |cov AS (SELECT DISTINCT doc_id, pos + dd AS cpos FROM cov0),
       |t0 AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM w),
       |tok AS (SELECT doc_id, i - 1 AS pos, ws[i] AS token FROM t0),
       |kept AS (SELECT t.doc_id, t.pos, t.token
       |         FROM tok t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.cpos = t.pos
       |         WHERE c.doc_id IS NULL),
       |reb AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
       |               string_agg(token, ' ' ORDER BY pos) AS clean_text
       |        FROM kept GROUP BY doc_id)""".stripMargin

  def ops: Seq[Op] = Seq(
    Op.sql("dedup_exact_groups",
      """SELECT md5(text) AS text_key, MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin) { (s, d) =>
      exactGroups(Tables.documents(s, d))
    },

    // One-row corpus dedup headline: exact + near duplication fractions.
    Op.sql("dedup_corpus_summary",
      s"""WITH $minhashPairsCtes,
         |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_near_docs FROM (
         |         SELECT DISTINCT doc_id FROM (
         |           SELECT doc_a AS doc_id FROM mh_pairs
         |           UNION ALL SELECT doc_b FROM mh_pairs))),
         |ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |              CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts
         |       FROM documents)
         |SELECT ex.n_docs, ex.n_distinct_texts,
         |       ((ex.n_docs - ex.n_distinct_texts) * 1000000) // ex.n_docs
         |         AS exact_dup_ppm,
         |       nd.n_near_docs,
         |       (nd.n_near_docs * 1000000) // ex.n_docs AS near_doc_ppm
         |FROM ex CROSS JOIN nd""".stripMargin) { (s, d) =>
      corpusSummary(Tables.documents(s, d))
    },

    Op.sql("dedup_exact_survivors",
      "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)") { (s, d) =>
      exactSurvivors(Tables.documents(s, d))
    },

    Op.sql("dedup_passages",
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |ch AS (SELECT doc_id,
         |              unnest(generate_series(0, (len(ws)-1)//$passageLen)) AS ci, ws
         |       FROM w),
         |p AS (SELECT doc_id,
         |             md5(array_to_string(
         |               ws[ci*$passageLen+1 : ci*$passageLen+$passageLen], ' ')) AS h
         |      FROM ch),
         |dd AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM p GROUP BY h),
         |per AS (SELECT p.doc_id, CAST(COUNT(*) AS BIGINT) AS n_passages,
         |               CAST(SUM(CASE WHEN dd.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |                 AS n_dup_passages
         |        FROM p JOIN dd USING (h) GROUP BY 1)
         |SELECT doc_id, n_passages, n_dup_passages,
         |       (n_dup_passages * 1000000) // n_passages AS dup_ppm
         |FROM per""".stripMargin) { (s, d) =>
      passageStats(Tables.documents(s, d))
    },

    // Arriving batch audited against stored passage history — shares the
    // full audit's oracle restricted to the batch (doc-disjoint exactness).
    Op.sql("dedup_passages_incremental",
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |ch AS (SELECT doc_id,
         |              unnest(generate_series(0, (len(ws)-1)//$passageLen)) AS ci, ws
         |       FROM w),
         |p AS (SELECT doc_id,
         |             md5(array_to_string(
         |               ws[ci*$passageLen+1 : ci*$passageLen+$passageLen], ' ')) AS h
         |      FROM ch),
         |dd AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM p GROUP BY h),
         |per AS (SELECT p.doc_id, CAST(COUNT(*) AS BIGINT) AS n_passages,
         |               CAST(SUM(CASE WHEN dd.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |                 AS n_dup_passages
         |        FROM p JOIN dd USING (h) GROUP BY 1)
         |SELECT doc_id, n_passages, n_dup_passages,
         |       (n_dup_passages * 1000000) // n_passages AS dup_ppm
         |FROM per WHERE doc_id % 10 >= 8""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val stored = passageHashIndex(docs.filter(col("doc_id") % 10 < 8))
      passageStatsIncremental(stored, docs.filter(col("doc_id") % 10 >= 8))
    },

    Op.sql("dedup_passages_clean",
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |ch AS (SELECT doc_id,
         |              unnest(generate_series(0, (len(ws)-1)//$passageLen)) AS ci, ws
         |       FROM w),
         |p AS (SELECT doc_id, ci,
         |             array_to_string(
         |               ws[ci*$passageLen+1 : ci*$passageLen+$passageLen], ' ') AS passage
         |      FROM ch),
         |own AS (SELECT md5(passage) AS h, MIN(doc_id) AS first_doc
         |        FROM p GROUP BY 1),
         |kept AS (SELECT p.doc_id, p.ci, p.passage
         |         FROM p JOIN own ON own.h = md5(p.passage)
         |         WHERE p.doc_id = own.first_doc)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |       string_agg(passage, ' ' ORDER BY ci) AS clean_text
         |FROM kept GROUP BY doc_id""".stripMargin) { (s, d) =>
      passageClean(Tables.documents(s, d))
    },

    // Sliding-window duplicated-SPAN removal (ExactSubstr semantics at
    // token-window grain): first corpus occurrence of each duplicated
    // 10-token window survives; tokens covered by any later occurrence are
    // removed. Both engines rank ownership by (doc_id, pos) and rebuild by
    // position, so the rewrite is bit-reproducible.
    Op.sql("dedup_spans",
      s"""WITH $spanRewriteCtes
         |SELECT w.doc_id, len(w.ws) AS n_tokens,
         |       len(w.ws) - COALESCE(r.n_kept, 0) AS n_covered,
         |       COALESCE(r.clean_text, '') AS clean_text,
         |       (COALESCE(r.n_kept, 0) * 1000000) // len(w.ws) AS kept_ppm
         |FROM w LEFT JOIN reb r USING (doc_id)""".stripMargin) { (s, d) =>
      dedupSpans(Tables.documents(s, d))
    },

    // The incremental rewrite must equal the FULL recompute restricted to
    // the arriving batch (doc_id % 7 = 0 plays the new docs; history is
    // pre-aggregated to the gh-grain owner index and never re-tokenized) —
    // the oracle states that contract directly, like dedup_incremental_minhash.
    Op.sql("dedup_spans_incremental",
      s"""WITH $spanRewriteCtes
         |SELECT w.doc_id, len(w.ws) AS n_tokens,
         |       len(w.ws) - COALESCE(r.n_kept, 0) AS n_covered,
         |       COALESCE(r.clean_text, '') AS clean_text,
         |       (COALESCE(r.n_kept, 0) * 1000000) // len(w.ws) AS kept_ppm
         |FROM w LEFT JOIN reb r USING (doc_id)
         |WHERE w.doc_id % 7 = 0""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val stored = spanGramIndex(docs.filter(pmod(col("doc_id"), lit(7)) =!= 0))
      dedupSpansIncremental(stored,
        docs.filter(pmod(col("doc_id"), lit(7)) === 0))
    },

    Op.sql("dedup_minhash_pairs",
      s"""WITH $minhashPairsCtes
         |SELECT doc_a, doc_b, jaccard FROM mh_pairs""".stripMargin) { (s, d) =>
      minhashPairs(Tables.documents(s, d))
    },

    // The incremental path must find EXACTLY the full pair set restricted to
    // pairs touching a "new" doc (here: doc_id divisible by 7 plays the
    // incoming batch) — the oracle states that contract directly.
    Op.sql("dedup_incremental_minhash",
      s"""WITH $minhashPairsCtes
         |SELECT doc_a, doc_b, jaccard FROM mh_pairs
         |WHERE doc_a % 7 = 0 OR doc_b % 7 = 0""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      // this op COMPUTES the corpus index (no store in the fixture setup), so
      // it owns the persist — per the incrementalMinhashPairs caller contract
      val idx = minhashIndex(docs.filter(pmod(col("doc_id"), lit(7)) =!= 0))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      incrementalMinhashPairs(docs.filter(pmod(col("doc_id"), lit(7)) === 0), idx)
    },

    Op.sql("dedup_clusters", clustersOracleSql) { (s, d) =>
      clusters(Tables.documents(s, d))
    },

    // The incremental path must land on the SAME labels as a full re-cluster
    // of the whole corpus — so its oracle IS the full-recluster oracle.
    Op.sql("dedup_clusters_incremental", clustersOracleSql) { (s, d) =>
      val docs = Tables.documents(s, d)
      val oldDocs = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
      val newDocs = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
      // the stored state a production loop carries: the old corpus's labels
      // and signature index (caller-owned persist, per the contract)
      val idx = minhashIndex(oldDocs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val labels = updateClusters(
        connectedComponents(minhashPairs(oldDocs)),
        incrementalMinhashPairs(newDocs, idx))
      docs.select(col("doc_id"))
        .join(labels.select(col("node").as("doc_id"), col("label").as("cid")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("cid"), col("doc_id")).as("cluster_id"))
    },

    Op.sql("dedup_cluster_survivors",
      s"""WITH RECURSIVE $minhashPairsCtes,
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM mh_pairs
         |  UNION ALL SELECT doc_b, doc_a FROM mh_pairs),
         |reach(node, r) AS (
         |  SELECT DISTINCT a, a FROM edges
         |  UNION
         |  SELECT reach.node, e.b FROM reach JOIN edges e ON e.a = reach.r),
         |lab AS (SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node),
         |cl AS (SELECT d.doc_id, COALESCE(lab.cluster_id, d.doc_id) AS cluster_id
         |       FROM documents d LEFT JOIN lab ON lab.node = d.doc_id),
         |q AS (${TextOps.qualityCteSql}),
         |ranked AS (
         |  SELECT cl.cluster_id, cl.doc_id, q.quality,
         |    ROW_NUMBER() OVER (PARTITION BY cl.cluster_id
         |      ORDER BY q.quality DESC, cl.doc_id) AS rn,
         |    COUNT(*) OVER (PARTITION BY cl.cluster_id) AS cluster_size
         |  FROM cl JOIN q USING (doc_id))
         |SELECT cluster_id, doc_id AS survivor_id, quality AS survivor_quality,
         |       cluster_size
         |FROM ranked WHERE rn = 1""".stripMargin) { (s, d) =>
      clusterSurvivors(Tables.documents(s, d))
    },

    Op.sql("dedup_simhash_docs",
      s"""WITH $simhashDocsSql
         |SELECT doc_id, simhash FROM simdocs""".stripMargin) { (s, d) =>
      simhashDocs(Tables.documents(s, d))
    },

    Op.sql("dedup_simhash_pairs",
      s"""WITH $simhashDocsSql,
         |bands AS (
         |  SELECT doc_id, simhash, b, (simhash >> (b*8)) & 255 AS bk
         |  FROM simdocs, generate_series(0, 3) t(b))
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       bit_count(xor(a.simhash, b.simhash)) AS hamming
         |FROM bands a JOIN bands b ON a.b = b.b AND a.bk = b.bk AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= $hammingMax""".stripMargin) { (s, d) =>
      simhashPairs(Tables.documents(s, d))
    },

    Op.sql("dedup_ngram_jaccard",
      s"""WITH $ngramJaccardCtes
         |SELECT doc_a, doc_b, jaccard, bucket_overflow FROM njp""".stripMargin) { (s, d) =>
      ngramJaccardPairs(Tables.documents(s, d))
    },

    // Threshold-sweep histogram over the verified pair set: how many pairs
    // each dedup τ ∈ [0.5, 1] would act on — the tuning curve a curator
    // reads before fixing the threshold (bands of 0.05; band arithmetic is
    // the same exact ratio floored identically on both engines). The
    // n_docs_dropped column is the corpus-total participant-cap overflow.
    Op.sql("dedup_threshold_sweep",
      s"""WITH $ngramJaccardCtes
         |SELECT CAST(FLOOR(jaccard * 20) AS DOUBLE) / 20 AS tau_lo,
         |       CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |       (SELECT n_docs_dropped FROM njdrop) AS n_docs_dropped
         |FROM njp GROUP BY 1""".stripMargin) { (s, d) =>
      jaccardThresholdSweep(Tables.documents(s, d))
    },

    // Measured LSH banding S-curve against the exact Jaccard baseline
    // (capped per bucket like the baseline itself — the curve measures
    // banding recall over the pairs the exact side actually verified).
    Op.sql("dedup_lsh_recall",
      s"""WITH $minhashPairsCtes,
         |$ngramJaccardCtes,
         |sc AS (SELECT njp.jaccard,
         |              CASE WHEN c.da IS NOT NULL THEN 1 ELSE 0 END AS found
         |       FROM njp LEFT JOIN cand c
         |         ON c.da = njp.doc_a AND c.db = njp.doc_b)
         |SELECT CAST(FLOOR(jaccard * 20) AS DOUBLE) / 20 AS tau_lo,
         |       CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |       CAST(SUM(found) AS BIGINT) AS n_found,
         |       CAST((SUM(found) * 1000000) // COUNT(*) AS BIGINT) AS recall_ppm
         |FROM sc GROUP BY 1""".stripMargin) { (s, d) =>
      lshRecallReport(Tables.documents(s, d))
    },

    // Provenance rollup of near-dup pairs spanning two different sources.
    Op.sql("dedup_cross_source",
      s"""WITH $minhashPairsCtes,
         |ss AS (SELECT doc_id, source FROM documents),
         |x AS (SELECT LEAST(a.source, b.source) AS source_a,
         |             GREATEST(a.source, b.source) AS source_b, p.jaccard
         |      FROM mh_pairs p
         |      JOIN ss a ON a.doc_id = p.doc_a
         |      JOIN ss b ON b.doc_id = p.doc_b
         |      WHERE a.source <> b.source)
         |SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |       CAST(SUM(CASE WHEN jaccard = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact
         |FROM x GROUP BY 1, 2""".stripMargin) { (s, d) =>
      crossSourcePairs(Tables.documents(s, d))
    },

    Op.sql("dedup_containment_pairs",
      s"""WITH shb AS (
         |  SELECT doc_id,
         |         list_transform(${shinglesSql("w", shingleN)}, x -> ${hexToLongSql("md5(x)", 1)}) AS sh
         |  FROM (SELECT doc_id, text, string_split(text, ' ') w FROM documents)
         |  WHERE len(w) >= $shingleN),
         |shn AS (SELECT doc_id, sh, len(sh) AS n FROM shb)
         |SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / mn AS containment FROM (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         len(list_intersect(a.sh, b.sh)) AS inter, LEAST(a.n, b.n) AS mn
         |  FROM shn a JOIN shn b ON a.doc_id < b.doc_id)
         |WHERE inter * $containDen >= mn * $containNum""".stripMargin) { (s, d) =>
      containmentPairs(Tables.documents(s, d))
    },

    Op.sql("dedup_embedding_cosine",
      s"""WITH $bucketedWithNormSql
         |SELECT vec_a, vec_b, cos FROM (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, ${cosQSql("a", "b")} AS cos
         |  FROM bv a JOIN bv b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |WHERE cos >= $cosineTau""".stripMargin) { (s, d) =>
      embeddingNearDups(Tables.embeddings(s, d))
    },

    // Cluster-keyed split: hash the near-dup cluster id, not the doc id.
    Op.sql("split_cluster_assign",
      s"""WITH RECURSIVE $minhashPairsCtes,
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM mh_pairs
         |  UNION ALL SELECT doc_b, doc_a FROM mh_pairs),
         |reach(node, r) AS (
         |  SELECT DISTINCT a, a FROM edges
         |  UNION
         |  SELECT reach.node, e.b FROM reach JOIN edges e ON e.a = reach.r),
         |lab AS (SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node)
         |SELECT doc_id, cluster_id, bucket,
         |  CASE WHEN bucket < ${TextOps.splitTrainUpper} THEN 'train'
         |       WHEN bucket < ${TextOps.splitValUpper} THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (
         |  SELECT d.doc_id, COALESCE(lab.cluster_id, d.doc_id) AS cluster_id,
         |         ${hash60Sql("CAST(COALESCE(lab.cluster_id, d.doc_id) AS VARCHAR)")} % 100 AS bucket
         |  FROM documents d LEFT JOIN lab ON lab.node = d.doc_id)""".stripMargin) { (s, d) =>
      clusterSplitAssign(Tables.documents(s, d))
    },

    // One-row leakage report: near-dup pairs straddling splits, both keyings.
    Op.sql("split_leakage_audit",
      s"""WITH RECURSIVE $minhashPairsCtes,
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM mh_pairs
         |  UNION ALL SELECT doc_b, doc_a FROM mh_pairs),
         |reach(node, r) AS (
         |  SELECT DISTINCT a, a FROM edges
         |  UNION
         |  SELECT reach.node, e.b FROM reach JOIN edges e ON e.a = reach.r),
         |lab AS (SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node),
         |na AS (
         |  SELECT doc_id,
         |    CASE WHEN h < ${TextOps.splitTrainUpper} THEN 'train'
         |         WHEN h < ${TextOps.splitValUpper} THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |          ${hash60Sql("CAST(doc_id AS VARCHAR)")} % 100 AS h
         |        FROM documents)),
         |cs AS (
         |  SELECT doc_id,
         |    CASE WHEN h < ${TextOps.splitTrainUpper} THEN 'train'
         |         WHEN h < ${TextOps.splitValUpper} THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM (
         |    SELECT d.doc_id,
         |      ${hash60Sql("CAST(COALESCE(lab.cluster_id, d.doc_id) AS VARCHAR)")} % 100 AS h
         |    FROM documents d LEFT JOIN lab ON lab.node = d.doc_id))
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(COALESCE(SUM(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END), 0) AS BIGINT)
         |    AS n_leaked_doc_keyed,
         |  CAST(CASE WHEN COUNT(*) = 0 THEN 0
         |       ELSE (COALESCE(SUM(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END), 0)
         |             * 1000000) // COUNT(*) END AS BIGINT) AS leak_ppm_doc_keyed,
         |  CAST(COALESCE(SUM(CASE WHEN ca.split <> cb.split THEN 1 ELSE 0 END), 0) AS BIGINT)
         |    AS n_leaked_cluster_keyed
         |FROM mh_pairs p
         |JOIN na a ON a.doc_id = p.doc_a
         |JOIN na b ON b.doc_id = p.doc_b
         |JOIN cs ca ON ca.doc_id = p.doc_a
         |JOIN cs cb ON cb.doc_id = p.doc_b""".stripMargin) { (s, d) =>
      splitLeakageAudit(Tables.documents(s, d))
    },
  )
}
