package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Op
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
  * Portability: hashes are md5-based ([[graft.functions.Portable.hash60]]) so
  * DuckDB verifies every op bit-for-bit. A production build would swap
  * `hash60` for `xxhash64` (one line) — the plan shape is identical.
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

  /** doc_id + distinct word-3-gram shingle set; docs with < n words dropped
    * (explicitly, on both engines — Spark's `sequence` would count down).
    */
  def shingled(docs: DataFrame): DataFrame =
    docs.withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= shingleN)
      .select(col("doc_id"), shingles(col("w"), shingleN).as("sh"))

  private val shingledSql =
    s"""sh AS (
       |  SELECT doc_id, ${shinglesSql("w", shingleN)} AS sh
       |  FROM (SELECT doc_id, string_split(text, ' ') w FROM documents)
       |  WHERE len(w) >= $shingleN)""".stripMargin

  // --------------------------------------------------------------------------
  // Exact dedup
  // --------------------------------------------------------------------------

  /** Exact dedup groups: md5 text key → canonical (min) doc_id + copy count.
    * One hash-aggregate; at 100 TB group by the 128-bit digest, never the text.
    */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_key"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Survivor set of exact dedup: the canonical doc_id per distinct text. */
  def exactSurvivors(docs: DataFrame): DataFrame =
    docs.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id")).select("doc_id")

  // --------------------------------------------------------------------------
  // MinHash + LSH
  // --------------------------------------------------------------------------

  /** k min-hashes per doc from one seeded hash family. */
  def minhashSignatures(shingled: DataFrame): DataFrame =
    shingled.withColumn("sig",
      transform(sequence(lit(0), lit(minhashK - 1)),
        s => array_min(transform(col("sh"), x => hash60Seeded(x, s)))))

  /** Near-dup pairs: band-bucket candidates, then exact shingle-Jaccard ≥ τ.
    * Band join keys are tiny strings → the candidate join shuffles only
    * (doc_id, band_key), and verification re-joins shingle sets by doc_id.
    */
  def minhashPairs(docs: DataFrame): DataFrame = {
    val sh = shingled(docs)
    val bands = minhashSignatures(sh)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(minhashBands - 1)),
          b => concat_ws(",",
            transform(slice(col("sig"), b * minhashRows + 1, lit(minhashRows)),
              v => v.cast(StringType))))))
      .toDF("doc_id", "band", "band_key")
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyJaccard(cand, sh, jaccardTau)
  }

  private def verifyJaccard(pairs: DataFrame, sh: DataFrame, tau: Double): DataFrame =
    pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sh_a"), col("sh_b")))
          / size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= tau)

  private def jaccardSql(a: String, b: String): String =
    s"len(list_intersect($a, $b)) / len(list_distinct(list_concat($a, $b)))"

  // --------------------------------------------------------------------------
  // SimHash
  // --------------------------------------------------------------------------

  /** 32-bit SimHash over the shingle set: bit j is the sign of Σ ±1 weighted
    * by bit j of each shingle's hash. Computed from ONE hash pass over the
    * shingles (`hs` is materialized once per row, then 32 cheap bit-aggregates).
    */
  def simhashDocs(docs: DataFrame): DataFrame =
    shingled(docs)
      .withColumn("hs", transform(col("sh"), x => hash60(x)))
      .select(col("doc_id"), simhashOf(col("hs")).as("simhash"))

  private def simhashOf(hs: Column): Column =
    (0 until simhashBits).map { j =>
      val bitsum = aggregate(hs, lit(0),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
      when(bitsum > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  private val simhashOfSql: String =
    (0 until simhashBits).map { j =>
      s"(CASE WHEN list_sum([CASE WHEN (h>>$j)&1=1 THEN 1 ELSE -1 END FOR h IN hs]) > 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" + ")

  private val simhashDocsSql =
    s"""$shingledSql,
       |hsd AS (SELECT doc_id, list_transform(sh, x -> ${hash60Sql("x")}) hs FROM sh),
       |simdocs AS (SELECT doc_id, $simhashOfSql AS simhash FROM hsd)""".stripMargin

  /** Near-dup pairs by SimHash: block on each of the 4 bytes (any byte equal →
    * candidate; Hamming ≤ 6 over 32 bits guarantees some equal byte when split
    * 4-way only for ≤3 — bands are a recall/cost dial, as with MinHash),
    * verify with exact Hamming distance.
    */
  def simhashPairs(docs: DataFrame): DataFrame = {
    val sd = simhashDocs(docs)
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

  /** Direct shingle-Jaccard ≥ 0.5 restricted to same length-bucket
    * (`length div 50`) — near-dups rarely differ much in length, so blocking
    * keeps the pair space linear-ish.
    */
  def ngramJaccardPairs(docs: DataFrame): DataFrame = {
    val sh = docs.withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= shingleN)
      .select(col("doc_id"), (length(col("text")).cast(LongType) / lit(50L)).cast(LongType).as("bucket"),
        shingles(col("w"), shingleN).as("sh"))
    sh.as("a").join(sh.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (size(array_intersect(col("a.sh"), col("b.sh")))
          / size(array_union(col("a.sh"), col("b.sh")))).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
  }

  // --------------------------------------------------------------------------
  // Embedding cosine near-dup (LSH-bucketed)
  // --------------------------------------------------------------------------

  /** Integer hyperplane coefficients — exact in both engines. */
  def planeCoefs(p: Int): Seq[Int] = (0 until 64).map(i => ((i * 31 + p * 17) % 7) - 3)

  /** 8-bit sign-projection LSH bucket of an embedding. Decimal-exact dot
    * products → the sign (hence the bucket) is identical on every engine.
    */
  def lshBucket(emb: Column): Column =
    (0 until 8).map { p =>
      val dot = aggregate(
        zip_with(emb, typedLit(planeCoefs(p)),
          (x, c) => (x.cast(DoubleType) * c.cast(DoubleType)).cast(DecimalType(25, 12))),
        lit(0).cast(DecimalType(25, 12)), (acc, v) => (acc + v).cast(DecimalType(25, 12)))
      when(dot > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  def lshBucketSql(emb: String): String =
    (0 until 8).map { p =>
      val coefs = planeCoefs(p).mkString("[", ", ", "]")
      s"(CASE WHEN list_sum([CAST(CAST(x[1] AS DOUBLE)*CAST(x[2] AS DOUBLE) AS DECIMAL(25,12)) FOR x IN list_zip($emb, $coefs)]) > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")

  /** Embedding near-dup: candidates share an LSH bucket, verified by exact
    * cosine ≥ τ. (Recall < 1 by construction — the scale path; brute-force
    * cosine is [[Similarity.bruteForceTopK]] for bounded query sets.)
    */
  def embeddingNearDups(embs: DataFrame): DataFrame = {
    val b = embs.select(col("vec_id"), col("embedding"), lshBucket(col("embedding")).as("bucket"))
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosine(col("a.embedding"), col("b.embedding")).as("cos"))
      .filter(col("cos") >= cosineTau)
  }

  // --------------------------------------------------------------------------
  // Registered ops + DuckDB oracles
  // --------------------------------------------------------------------------

  def ops: Seq[Op] = Seq(
    Op.sql("dedup_exact_groups",
      """SELECT md5(text) AS text_key, MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin) { (s, d) =>
      exactGroups(Tables.documents(s, d))
    },

    Op.sql("dedup_exact_survivors",
      "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text") { (s, d) =>
      exactSurvivors(Tables.documents(s, d))
    },

    Op.sql("dedup_minhash_pairs", {
      val seeded = hash60SeededSql("x", "s")
      s"""WITH $shingledSql,
         |sig AS (
         |  SELECT doc_id, sh,
         |    list_transform(generate_series(0, ${minhashK - 1}),
         |      s -> list_min(list_transform(sh, x -> $seeded))) AS sg
         |  FROM sh),
         |bands AS (
         |  SELECT doc_id, b,
         |    array_to_string(list_transform(sg[b*$minhashRows+1:b*$minhashRows+$minhashRows], v -> CAST(v AS VARCHAR)), ',') bk
         |  FROM sig, generate_series(0, ${minhashBands - 1}) t(b)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id da, b.doc_id db
         |  FROM bands a JOIN bands b ON a.b = b.b AND a.bk = b.bk AND a.doc_id < b.doc_id)
         |SELECT da AS doc_a, db AS doc_b, ${jaccardSql("x.sh", "y.sh")} AS jaccard
         |FROM cand JOIN sh x ON x.doc_id = da JOIN sh y ON y.doc_id = db
         |WHERE ${jaccardSql("x.sh", "y.sh")} >= $jaccardTau""".stripMargin
    }) { (s, d) => minhashPairs(Tables.documents(s, d)) },

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
      s"""WITH shb AS (
         |  SELECT doc_id, CAST(length(text) AS BIGINT) // 50 AS bucket,
         |         ${shinglesSql("w", shingleN)} AS sh
         |  FROM (SELECT doc_id, text, string_split(text, ' ') w FROM documents)
         |  WHERE len(w) >= $shingleN)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, ${jaccardSql("a.sh", "b.sh")} AS jaccard
         |FROM shb a JOIN shb b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
         |WHERE ${jaccardSql("a.sh", "b.sh")} >= 0.5""".stripMargin) { (s, d) =>
      ngramJaccardPairs(Tables.documents(s, d))
    },

    Op.sql("dedup_embedding_cosine",
      s"""WITH bv AS (
         |  SELECT vec_id, embedding, ${lshBucketSql("embedding")} AS bucket FROM embeddings)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |       ${cosineSql("a.embedding", "b.embedding")} AS cos
         |FROM bv a JOIN bv b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE ${cosineSql("a.embedding", "b.embedding")} >= $cosineTau""".stripMargin) { (s, d) =>
      embeddingNearDups(Tables.embeddings(s, d))
    },
  )
}
