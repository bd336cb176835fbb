package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Op
import graft.functions.GraftExpressions
import graft.sources.Tables

/** Multimodal column plumbing (north-star extension): image/audio/video as
  * opaque `binary` payloads with typed metadata, processed by batched
  * executor-side functions.
  *
  * IMAGE decoding is REAL: [[decode]] reads width/height from actual image
  * headers through the JDK's `javax.imageio` readers (PNG/JPEG/BMP/GIF/
  * TIFF), header-only — no pixel decode. Payloads that aren't images (and
  * audio/video, for which this container has no libraries) fall back to the
  * deterministic [[decodeStub]]. Everything around the decode is likewise
  * real and tested: the binary schema, the `mapPartitions` batching (the
  * Scala analog of `mapInPandas` — the executor processes fixed-size record
  * batches, amortizing per-batch setup like model load), frame sampling,
  * and feature extraction.
  *
  * Scale: payloads never shuffle — every op here is a narrow map over the
  * scan; features (small) are what downstream joins/aggregations consume.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  final case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Int,
      width: Int, height: Int, mean_byte: Double,
      min_byte: Int, max_byte: Int, entropy: Double,
      frame_checksums: Seq[Long])

  /** Synthesizes a media table from `documents` (payload = utf-8 bytes) —
    * the fixture set has no real binaries; schema and plumbing are the point.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      concat(lit("media/"), col("source")).as("media_type"),
      encode(col("text"), "utf-8").as("payload"))

  /** STUB decode — deterministic fake dimensions derived from the payload.
    * The fallback for payloads no installed image reader claims (the
    * fixture's text-derived payloads land here, keeping the oracle's
    * closed-form width/height valid); real image bytes take [[decode]]'s
    * header path instead.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int) = {
    val n = if (payload == null) 0 else payload.length
    (64 + (n % 193), 64 + ((n * 31) % 149))
  }

  /** REAL image decode via `javax.imageio` (JDK built-in readers: PNG, JPEG,
    * BMP, GIF, TIFF, WBMP): header-only width/height — the reader parses
    * image metadata, never the pixel planes, so cost is O(header) per
    * payload regardless of image size. Non-image bytes (no reader claims
    * the magic numbers) fall back to [[decodeStub]], as does a claimed-but-
    * corrupt header. The in-memory ImageIO cache is forced once per JVM —
    * the default disk-scratch cache would add a file create/delete per
    * record on the executor hot path.
    */
  def decode(payload: Array[Byte]): (Int, Int) = {
    if (payload == null || payload.isEmpty) return decodeStub(payload)
    ensureMemCache()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) decodeStub(payload)
      else {
        val r = readers.next()
        try { r.setInput(iis); (r.getWidth(0), r.getHeight(0)) }
        catch { case _: java.io.IOException => decodeStub(payload) }
        finally r.dispose()
      }
    } finally if (iis != null) iis.close()
  }

  @volatile private var memCacheSet = false
  private def ensureMemCache(): Unit =
    if (!memCacheSet) { javax.imageio.ImageIO.setUseCache(false); memCacheSet = true }

  /** Evenly frame-samples a payload into `n` slices (video frame extraction
    * shape); returns a cheap checksum per frame.
    */
  def frameChecksums(payload: Array[Byte], n: Int): Seq[Long] = {
    if (payload.isEmpty) return Seq.fill(n)(0L)
    val step = math.max(1, payload.length / n)
    (0 until n).map { i =>
      val from = math.min(i * step, payload.length)
      val until = math.min(from + step, payload.length)
      var h = 1125899906842597L // FNV-ish rolling checksum
      var j = from
      while (j < until) { h = 31 * h + (payload(j) & 0xff); j += 1 }
      h
    }
  }

  /** Shannon byte entropy QUANTIZED to the engine's 2^-20 grid (the ppm
    * convention from the GK→histogram conversions): each of the ≤256
    * histogram terms −p·log₂p is floored onto the integer grid and the
    * INTEGER grid values sum — so the value is independent of summation
    * order (the old float Σ was not) and the final division by 2^20 is an
    * exact power-of-two step both engines perform identically. Error vs
    * true entropy < 256·2^-20 ≈ 2.4e-4 bits, one-sided (never over).
    * The only cross-engine surface left is libm `ln` itself, which both
    * engines evaluate on identical doubles; a disagreement would need a
    * >grid-width discrepancy (2^-20 vs sub-ulp libm error) — hash-gated
    * against the DuckDB oracle at every fixture scale.
    */
  private def shannonEntropy(payload: Array[Byte]): Double = {
    if (payload.isEmpty) return 0.0
    val counts = new Array[Int](256)
    payload.foreach(b => counts(b & 0xff) += 1)
    val n = payload.length.toDouble
    var grid = 0L
    var i = 0
    while (i < 256) {
      val c = counts(i)
      if (c > 0) {
        val p = c / n
        // exact op-for-op twin of the oracle's
        // FLOOR((-(c/n) * ln(c/n)) / ln(2.0) * 1048576.0)
        grid += math.floor(-p * math.log(p) / math.log(2.0) * 1048576.0).toLong
      }
      i += 1
    }
    grid / 1048576.0
  }

  /** Batched feature extraction over binary payloads — `mapPartitions` with
    * explicit record batches of `batchSize` (the `mapInPandas` batch shape:
    * per-batch setup happens once per batch, not once per record).
    */
  def extractFeatures(media: Dataset[MediaRecord], nFrames: Int = 4,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would go here (codec init, model load, ...)
        batch.iterator.map { r =>
          val p = if (r.payload == null) Array.emptyByteArray else r.payload
          val (w, h) = decode(p)
          val mean =
            if (p.isEmpty) 0.0
            else p.map(b => (b & 0xff).toLong).sum.toDouble / p.length
          val minB = if (p.isEmpty) 0 else p.iterator.map(_ & 0xff).min
          val maxB = if (p.isEmpty) 0 else p.iterator.map(_ & 0xff).max
          MediaFeatures(r.doc_id, r.media_type, p.length, w, h,
            mean, minB, maxB, shannonEntropy(p), frameChecksums(p, nFrames))
        }
      }
    }
  }

  /** The typed media dataset from the fixture documents. */
  def mediaDataset(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    mediaFromDocuments(Tables.documents(spark, dir)).as[MediaRecord]
  }

  // --------------------------------------------------------------------------
  // Perceptual-hash image near-dup (pixel-content dedup)
  // --------------------------------------------------------------------------

  /** Hamming radius for [[mediaNearDups]]: the classic "same image, different
    * encode" dHash threshold.
    */
  val nearDupHamming = 10

  /** Band layout for the Hamming-space LSH: 4 substrings × 16 bits. Multi-
    * index hashing (Norouzi et al., "Fast Search in Hamming Space with
    * Multi-Index Hashing"): a pair within Hamming distance d shares at least
    * one identical substring whenever d < bands (pigeonhole), so recall is
    * EXACT for d ≤ 3 and high (and deterministic — the oracle replays the
    * same bands) up to [[nearDupHamming]]. 16-bit substrings keep the bucket
    * space at 65536 per band — the candidate count scales as Σ bucket², not
    * as |corpus|², and a skewed bucket (e.g. flat-image hashes) is an AQE
    * skew-join case, not a plan rewrite.
    */
  val dhashBands = 4

  /** Per-payload 64-bit perceptual hash ([[graft.multimodal.Dhash]]): real
    * pixel decode for image payloads, the deterministic byte-slice grid for
    * everything else (the fixture's utf-8 payloads — which is what keeps
    * this op oracle-checkable while the pixel path is spec-pinned on
    * generated PNGs). One narrow codegen map over the scan; payloads never
    * shuffle.
    */
  def mediaDhash(docs: DataFrame): DataFrame =
    dhashOf(mediaFromDocuments(docs))

  /** (doc_id, dhash) over any (doc_id, payload binary) frame. */
  def dhashOf(media: DataFrame): DataFrame = {
    GraftExpressions.register(media.sparkSession)
    media.select(col("doc_id"), GraftExpressions.dhash64(col("payload")).as("dhash"))
  }

  /** Pixel-content near-duplicate pairs — the image-dedup capability byte
    * digests cannot provide (a re-encode/brightness shift changes every byte
    * but almost no dHash bit).
    *
    * Scale shape: exact-duplicate hashes collapse FIRST (one hash-aggregate
    * on the 8-byte dhash — the [[graft.operators.Dedup.exactGroups]]
    * convention), and each group's members attach to their canonical as
    * hamming-0 STAR pairs (linear in group size, never the quadratic
    * within-group clique). The surviving distinct hashes are banded
    * ([[dhashBands]]) and cross-hash candidates come from a bucket
    * equi-join, verified by one codegen `bit_count(xor)` per candidate.
    * Output is (doc_a < doc_b, hamming ≤ threshold); a brightness-shifted
    * re-encode lands in the star set (dHash is gradient-sign invariant —
    * MultimodalSpec pins this on generated PNGs), a resized one in the
    * banded set.
    */
  def mediaNearDups(docs: DataFrame, threshold: Int = nearDupHamming): DataFrame =
    nearDupPairs(mediaFromDocuments(docs), threshold)

  /** 16-bit Hamming band rows of a (doc_id, dhash) frame — the multi-index
    * key material for both the batch and incremental near-dup joins.
    */
  def dhashBandsOf(hashes: DataFrame): DataFrame =
    hashes.select(col("doc_id"), col("dhash"),
      explode(array((0 until dhashBands).map(i =>
        struct(lit(i).as("band"),
          shiftright(col("dhash"), 16 * i).bitwiseAND(lit(65535L)).as("bv"))): _*))
        .as("b"))
      .select(col("doc_id"), col("dhash"), col("b.band").as("band"), col("b.bv").as("bv"))

  /** [[mediaNearDups]] over any (doc_id, payload binary) frame. */
  def nearDupPairs(media: DataFrame, threshold: Int = nearDupHamming): DataFrame = {
    val hashes = dhashOf(media).localCheckpoint() // consumed twice: reps + star
    val reps = hashes.groupBy(col("dhash")).agg(min(col("doc_id")).as("doc_id"))
    val star = hashes
      .join(reps.withColumnRenamed("doc_id", "doc_a"), "dhash")
      .filter(col("doc_id") =!= col("doc_a"))
      .select(col("doc_a"), col("doc_id").as("doc_b"), lit(0L).as("hamming"))
    val bands = dhashBandsOf(reps)
    val left = bands.select(col("band"), col("bv"),
      col("doc_id").as("doc_a"), col("dhash").as("ha"))
    val right = bands.select(col("band"), col("bv"),
      col("doc_id").as("doc_b"), col("dhash").as("hb"))
    val near = left.join(right, Seq("band", "bv"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("ha"), col("hb")).distinct()
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= threshold)
    star.unionByName(near)
  }

  /** Hamming-threshold tuning sweep over the banded candidate set: pair
    * count at every threshold 0..[[nearDupHamming]] (cumulative — a pair at
    * distance d counts toward every t ≥ d), zero-rows kept so the curve is
    * complete. The image twin of [[graft.operators.Dedup
    * .jaccardThresholdSweep]]: the report read before picking the near-dup
    * threshold, from ONE banded pass (pairs explode into their ≥-thresholds;
    * never re-scanned per threshold). Recall caveat inherited from the band
    * layout: exact for d < [[dhashBands]], banded-candidate recall above.
    */
  def mediaThresholdSweep(docs: DataFrame, maxT: Int = nearDupHamming): DataFrame = {
    val counts = nearDupPairs(mediaFromDocuments(docs), maxT)
      .select(explode(sequence(col("hamming"), lit(maxT.toLong))).as("threshold"))
      .groupBy(col("threshold")).agg(count(lit(1)).as("n_pairs"))
    docs.sparkSession.range(0, maxT + 1L).toDF("threshold")
      .join(counts, Seq("threshold"), "left")
      .select(col("threshold"), coalesce(col("n_pairs"), lit(0L)).as("n_pairs"))
  }

  /** One row per media record: its image dup-cluster id — the min doc_id of
    * its dHash near-dup component (exact copies via star pairs, re-encodes
    * via the banded Hamming pairs); records with no near-dup are their own
    * cluster. Composes [[nearDupPairs]] with the engine's large-star/
    * small-star connected components ([[graft.operators.Dedup
    * .connectedComponents]] — O(log² n) rounds, no driver graph state).
    * The downstream curation join: keep `doc_id == cluster_id` (one asset
    * per visual identity).
    */
  def mediaDupClusters(docs: DataFrame): DataFrame =
    dupClustersOf(mediaFromDocuments(docs))

  /** [[mediaDupClusters]] over any (doc_id, payload binary) frame. */
  def dupClustersOf(media: DataFrame): DataFrame =
    media.select(col("doc_id"))
      .join(graft.operators.Dedup.connectedComponents(
          nearDupPairs(media).select(col("doc_a"), col("doc_b")))
          .select(col("node").as("doc_id"), col("label").as("cid")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cid"), col("doc_id")).as("cluster_id"))

  // --------------------------------------------------------------------------
  // Cross-modal training manifest
  // --------------------------------------------------------------------------

  /** Fuses the text-side curation trail with the media-side visual identity
    * into ONE doc-grain keep/drop + reason per document-with-payload — the
    * decision table a multimodal training run reads (a doc survives only if
    * its TEXT clears every text gate AND its IMAGE is the canonical copy of
    * its visual-identity cluster). `reason` reports the FIRST failing gate
    * in a fixed precedence (text gates before media — the text manifest's
    * own conjunction order), so `reason = 'keep'` iff `keep`.
    *
    * Takes the two decision frames as inputs (one doc_id equi-join; both
    * sides are doc-grain, so this composes into either pipeline's plan
    * without re-deriving the other side).
    */
  def crossModalManifest(textManifest: DataFrame, mediaClusters: DataFrame): DataFrame =
    textManifest
      .join(mediaClusters.select(col("doc_id"),
        col("cluster_id").as("media_cluster_id")), "doc_id")
      .select(col("doc_id"),
        col("keep").as("text_keep"),
        col("model_keep"),
        col("media_cluster_id"),
        (col("media_cluster_id") === col("doc_id")).as("is_media_canonical"),
        (col("keep") && col("media_cluster_id") === col("doc_id")).as("keep"),
        when(!col("is_canonical"), "exact_dup_text")
          .when(!col("is_cluster_survivor"), "near_dup_text")
          .when(col("lang_pred") =!= "en", "off_language")
          .when(col("quality") < 0.5, "low_quality")
          .when(col("media_cluster_id") =!= col("doc_id"), "dup_media")
          .otherwise("keep").as("reason"))

  /** The registered fixture op: text manifest × media dup-clusters. */
  def multimodalManifest(docs: DataFrame): DataFrame =
    crossModalManifest(graft.operators.TextOps.trainingManifest(docs),
      mediaDupClusters(docs))

  /** Incremental image near-dup: all Hamming-≤-threshold pairs touching at
    * least one NEW media record, at DOC grain — new-vs-corpus via a band
    * join against the STORED hash index, new-vs-new among the batch;
    * corpus-vs-corpus is never touched and corpus payloads are never
    * re-decoded. Per batch this costs O(|batch| decodes + band-bucket
    * joins); the corpus contributes only its stored 8-byte hashes — the
    * production loop at 100 TB: every image is decoded exactly once, ever
    * (the [[graft.operators.Dedup.incrementalMinhashPairs]] convention,
    * including its caller contract: `newMedia` ids are disjoint from the
    * index, and the caller owns the index's caching).
    */
  def incrementalMediaPairs(newMedia: DataFrame, hashIndex: DataFrame,
      threshold: Int = nearDupHamming): DataFrame = {
    // localCheckpoint, not persist: consumed twice (new-vs-corpus and
    // new-vs-new) but a persist here would leak one cached dataset per
    // micro-batch in the streaming loop (nobody downstream can unpersist a
    // subtree); checkpointed RDDs are reclaimed by the ContextCleaner once
    // the returned frame is dereferenced
    val newHashes = dhashOf(newMedia).localCheckpoint()
    val nb = dhashBandsOf(newHashes)
    val nc = nb.as("a").join(dhashBandsOf(hashIndex).as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"),
        col("a.dhash").as("ha"), col("b.dhash").as("hb"))
    val nn = nb.as("a").join(nb.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.dhash").as("ha"), col("b.dhash").as("hb"))
    nc.union(nn).distinct()
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= threshold)
  }

  // --------------------------------------------------------------------------
  // Registered ops
  // --------------------------------------------------------------------------

  /** DuckDB twin of the [[graft.multimodal.Dhash.stubGrid]] + bit-pack path
    * over the fixture's ASCII payloads (`ord(char)` == byte): a `hashes`
    * CTE of (doc_id, dhash BIGINT). HUGEINT bit accumulation, then the
    * two's-complement fold to signed 64-bit that Scala's `Long` gives for
    * free.
    */
  private def dhashCtes(px: String): String =
    s"""${px}d AS (SELECT doc_id, list_transform(string_split(text,''), x -> ord(x)) AS o
       |      FROM documents),
       |${px}d2 AS (SELECT doc_id, o, len(o) AS n FROM ${px}d),
       |${px}grid AS (SELECT doc_id, list_transform(generate_series(0, 71), k ->
       |           CASE WHEN n = 0 THEN 0
       |                WHEN ((k+1)*n)//72 <= (k*n)//72 THEN o[LEAST((k*n)//72, n-1)+1]
       |                ELSE CAST(list_sum(o[(k*n)//72+1:((k+1)*n)//72]) AS BIGINT)
       |                     // (((k+1)*n)//72 - (k*n)//72) END) AS gr
       |         FROM ${px}d2),
       |${px}hu AS (SELECT doc_id, list_sum(list_transform(generate_series(0, 63), b ->
       |          CASE WHEN gr[(b//8)*9 + (b%8) + 2] > gr[(b//8)*9 + (b%8) + 1]
       |               THEN 1::HUGEINT << b ELSE 0::HUGEINT END)) AS hu FROM ${px}grid),
       |${px}hashes AS (SELECT doc_id,
       |             CAST(hu - CASE WHEN hu >= 1::HUGEINT << 63
       |                            THEN 1::HUGEINT << 64 ELSE 0::HUGEINT END
       |                  AS BIGINT) AS dhash
       |           FROM ${px}hu)""".stripMargin

  /** The [[nearDupPairs]] twin as CTEs ending in `mp(doc_a, doc_b, hamming)`
    * — shared by the pair op and the clusters op's recursive components.
    */
  private[graft] def nearDupPairsCtes(px: String): String =
    s"""${dhashCtes(px)},
       |${px}reps AS (SELECT dhash, MIN(doc_id) AS doc_id FROM ${px}hashes GROUP BY dhash),
       |${px}star AS (SELECT r.doc_id AS doc_a, h.doc_id AS doc_b,
       |                0::BIGINT AS hamming
       |         FROM ${px}hashes h JOIN ${px}reps r USING (dhash)
       |         WHERE h.doc_id <> r.doc_id),
       |${px}bands AS (SELECT doc_id, dhash, i, (dhash >> (16*i)::INT) & 65535 AS bv
       |          FROM ${px}reps, generate_series(0, ${dhashBands - 1}) t(i)),
       |${px}cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |                a.dhash AS ha, b.dhash AS hb
       |         FROM ${px}bands a JOIN ${px}bands b
       |           ON a.i = b.i AND a.bv = b.bv AND a.doc_id < b.doc_id),
       |${px}mp AS (SELECT * FROM ${px}star
       |       UNION ALL
       |       SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
       |       FROM ${px}cand WHERE bit_count(xor(ha, hb)) <= $nearDupHamming)""".stripMargin

  /** [[nearDupPairsCtes]] plus the connected-components closure, ending in
    * `<px>clusters(doc_id, cluster_id)` — needs a `WITH RECURSIVE` prefix.
    */
  private[graft] def dupClusterCtes(px: String): String =
    s"""${nearDupPairsCtes(px)},
       |${px}edges AS (
       |  SELECT doc_a AS a, doc_b AS b FROM ${px}mp
       |  UNION ALL SELECT doc_b, doc_a FROM ${px}mp),
       |${px}reach(node, r) AS (
       |  SELECT DISTINCT a, a FROM ${px}edges
       |  UNION
       |  SELECT ${px}reach.node, e.b FROM ${px}reach JOIN ${px}edges e ON e.a = ${px}reach.r),
       |${px}lab AS (SELECT node, MIN(r) AS cluster_id FROM ${px}reach GROUP BY node),
       |${px}clusters AS (
       |  SELECT d.doc_id, COALESCE(${px}lab.cluster_id, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN ${px}lab ON ${px}lab.node = d.doc_id)""".stripMargin

  def ops: Seq[Op] = Seq(
    // Catalog view: binary payload metadata — oracle-checkable (byte lengths
    // and digests are engine-portable for utf-8 payloads).
    Op.sql("media_catalog",
      """SELECT doc_id, 'media/' || source AS media_type,
        |       octet_length(encode(text)) AS n_bytes, md5(text) AS content_md5
        |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        concat(lit("media/"), col("source")).as("media_type"),
        octet_length(encode(col("text"), "utf-8")).as("n_bytes"),
        md5(col("text")).as("content_md5"))
    },

    // The oracle-checkable scalar slice of the feature extractor: n_bytes,
    // stub dimensions (pure functions of length) and mean byte are all
    // DuckDB-expressible over utf-8 payloads (fixture docs are ASCII, so
    // per-char ord == per-byte value; both engines divide the same integer
    // sum by the same integer count — one IEEE division, bit-identical).
    // Runs through the SAME mapPartitions extractor as media_features, so
    // the hash gate covers the real batched-decode arithmetic; only the
    // rolling frame checksums and entropy stay spec-checked.
    Op.sql("media_features_meta",
      """SELECT doc_id, 'media/' || source AS media_type,
        |       octet_length(encode(text)) AS n_bytes,
        |       64 + (octet_length(encode(text)) % 193) AS width,
        |       64 + ((octet_length(encode(text)) * 31) % 149) AS height,
        |       CASE WHEN octet_length(encode(text)) = 0 THEN 0.0
        |            ELSE CAST(list_sum(list_transform(string_split(text, ''), x -> ord(x))) AS DOUBLE)
        |                 / octet_length(encode(text)) END AS mean_byte,
        |       CAST(CASE WHEN octet_length(encode(text)) = 0 THEN 0
        |            ELSE list_min(list_transform(string_split(text, ''), x -> ord(x)))
        |            END AS INTEGER) AS min_byte,
        |       CAST(CASE WHEN octet_length(encode(text)) = 0 THEN 0
        |            ELSE list_max(list_transform(string_split(text, ''), x -> ord(x)))
        |            END AS INTEGER) AS max_byte
        |FROM documents""".stripMargin) { (s, d) =>
      extractFeatures(mediaDataset(s, d)).toDF()
        .select(col("doc_id"), col("media_type"), col("n_bytes"),
          col("width"), col("height"), col("mean_byte"),
          col("min_byte"), col("max_byte"))
    },

    // Per-payload perceptual hash. The oracle replays the deterministic
    // stub-grid path the fixture's non-image payloads take; the pixel path
    // (real PNG decode → integer area-average → same bit pack) is pinned by
    // MultimodalSpec on generated images, where DuckDB can't follow.
    Op.sql("media_dhash",
      s"""WITH ${dhashCtes("")}
         |SELECT doc_id, dhash FROM hashes""".stripMargin) { (s, d) =>
      mediaDhash(Tables.documents(s, d))
    },

    // Pixel-content near-dup pairs: collapse exact-duplicate hashes (star
    // pairs at hamming 0), band the distinct hashes (4 × 16 bits),
    // bucket-join, verify Hamming ≤ threshold. Both engines run the
    // identical banding, so the (deliberately approximate above d = 3)
    // candidate set is bit-reproducible.
    Op.sql("media_near_dups",
      s"""WITH ${nearDupPairsCtes("")}
         |SELECT doc_a, doc_b, hamming FROM mp""".stripMargin) {
      (s, d) => mediaNearDups(Tables.documents(s, d))
    },

    // Threshold-tuning curve: cumulative pair count per Hamming threshold.
    Op.sql("media_threshold_sweep",
      s"""WITH ${nearDupPairsCtes("")},
         |sw AS (SELECT unnest(generate_series(hamming, $nearDupHamming)) AS threshold
         |       FROM mp),
         |c AS (SELECT threshold, CAST(COUNT(*) AS BIGINT) AS n_pairs
         |      FROM sw GROUP BY threshold)
         |SELECT t.threshold, CAST(COALESCE(c.n_pairs, 0) AS BIGINT) AS n_pairs
         |FROM generate_series(0, $nearDupHamming) t(threshold)
         |LEFT JOIN c USING (threshold)""".stripMargin) {
      (s, d) => mediaThresholdSweep(Tables.documents(s, d))
    },

    // One row per asset: its visual-identity cluster (components over the
    // near-dup pair set; the unrolled-CTE oracle is the dedup_clusters
    // pattern applied to the media pairs).
    Op.sql("media_dup_clusters",
      s"""WITH RECURSIVE ${dupClusterCtes("")}
         |SELECT doc_id, cluster_id FROM clusters""".stripMargin) {
      (s, d) => mediaDupClusters(Tables.documents(s, d))
    },

    // The incremental path must find EXACTLY the doc-grain banded pair set
    // restricted to pairs touching a "new" record (doc_id % 7 = 0 plays the
    // incoming batch) — the oracle states that contract directly, like
    // dedup_incremental_minhash.
    Op.sql("media_near_dups_incremental",
      s"""WITH ${dhashCtes("")},
         |bands AS (SELECT doc_id, dhash, i, (dhash >> (16*i)::INT) & 65535 AS bv
         |          FROM hashes, generate_series(0, ${dhashBands - 1}) t(i)),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |                a.dhash AS ha, b.dhash AS hb
         |         FROM bands a JOIN bands b
         |           ON a.i = b.i AND a.bv = b.bv AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(ha, hb)) <= $nearDupHamming
         |  AND (doc_a % 7 = 0 OR doc_b % 7 = 0)""".stripMargin) { (s, d) =>
      val media = mediaFromDocuments(Tables.documents(s, d))
      // this op COMPUTES the corpus hash index (no store in the fixture
      // setup); it is consumed once inside incrementalMediaPairs, so no
      // caching — a production loop reads it from the parquet index store
      val idx = dhashOf(media.filter(pmod(col("doc_id"), lit(7)) =!= 0))
      incrementalMediaPairs(media.filter(pmod(col("doc_id"), lit(7)) === 0), idx)
    },

    // Cross-modal curation manifest: the text manifest's gates and the
    // media dup-clusters' visual identity fused into one keep/drop + reason
    // per document. Oracle composes the two existing CTE chains (the text
    // chain unprefixed, the media chain under the m-prefix) with the same
    // fixed gate precedence.
    Op.sql("multimodal_manifest",
      s"""WITH RECURSIVE ${graft.operators.TextOps.trainingManifestCtes},
         |${dupClusterCtes("m")}
         |SELECT m.doc_id,
         |       m.keep AS text_keep,
         |       m.model_keep,
         |       mc.cluster_id AS media_cluster_id,
         |       mc.cluster_id = m.doc_id AS is_media_canonical,
         |       (m.keep AND mc.cluster_id = m.doc_id) AS keep,
         |       CASE WHEN NOT m.is_canonical THEN 'exact_dup_text'
         |            WHEN NOT m.is_cluster_survivor THEN 'near_dup_text'
         |            WHEN m.lang_pred <> 'en' THEN 'off_language'
         |            WHEN m.quality < 0.5 THEN 'low_quality'
         |            WHEN mc.cluster_id <> m.doc_id THEN 'dup_media'
         |            ELSE 'keep' END AS reason
         |FROM manifest m JOIN mclusters mc USING (doc_id)""".stripMargin) { (s, d) =>
      multimodalManifest(Tables.documents(s, d))
    },

    // Fully hash-gated since r11 (rows-only before that; the old blocker
    // conflated float-sum order with the histogram formulation):
    //  - entropy is the 2^-20-grid-quantized histogram sum (see
    //    [[shannonEntropy]]) -- integer grid terms sum order-independently
    //    and DuckDB replays the identical floor arithmetic;
    //  - the sequential per-byte rolling frame checksums ARE expressible:
    //    DuckDB's list_reduce replays Java's `h = 31*h + b` wrap-around in
    //    HUGEINT mod 2^64 and converts back to the signed BIGINT, slice
    //    boundaries included. The checksum array is serialized to a scalar
    //    md5 digest so the dump stays sortable; the raw per-frame longs and
    //    the empty/short-payload edge cases stay pinned by MultimodalSpec.
    Op.sql("media_features", {
      val seed = "1125899906842597" // frameChecksums' FNV-ish seed
      val two63 = "9223372036854775808"
      val two64 = "18446744073709551616"
      s"""WITH mbase AS (
         |  SELECT doc_id, 'media/' || source AS media_type,
         |         octet_length(encode(text)) AS n_bytes, text
         |  FROM documents),
         |mhist AS (
         |  SELECT doc_id, ord(ch) AS byte, COUNT(*) AS c
         |  FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents)
         |  GROUP BY 1, 2),
         |ment AS (
         |  SELECT h.doc_id,
         |    CAST(SUM(CAST(FLOOR((-(CAST(c AS DOUBLE) / CAST(b.n_bytes AS DOUBLE))
         |                         * ln(CAST(c AS DOUBLE) / CAST(b.n_bytes AS DOUBLE)))
         |                        / ln(2.0) * 1048576.0) AS BIGINT)) AS BIGINT) AS eg
         |  FROM mhist h JOIN mbase b USING (doc_id) GROUP BY 1),
         |mfr AS (
         |  SELECT doc_id, n_bytes, i, GREATEST(1, n_bytes // 4) AS step,
         |         LEAST(i * GREATEST(1, n_bytes // 4), n_bytes) AS frm,
         |         LEAST(LEAST(i * GREATEST(1, n_bytes // 4), n_bytes)
         |               + GREATEST(1, n_bytes // 4), n_bytes) AS unt,
         |         list_transform(string_split(text, ''),
         |                        x -> CAST(ord(x) AS HUGEINT)) AS bytes
         |  FROM mbase CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i)),
         |mck AS (
         |  SELECT doc_id, i,
         |    CAST(CASE WHEN hu >= CAST($two63 AS HUGEINT)
         |              THEN hu - CAST($two64 AS HUGEINT) ELSE hu END AS BIGINT) AS cksum
         |  FROM (
         |    SELECT doc_id, i,
         |      CASE WHEN n_bytes = 0 THEN CAST(0 AS HUGEINT)
         |           WHEN unt <= frm THEN CAST($seed AS HUGEINT)
         |           ELSE list_reduce(
         |                  list_prepend(CAST($seed AS HUGEINT), bytes[frm+1:unt]),
         |                  (h, x) -> (31 * h + x) % CAST($two64 AS HUGEINT))
         |      END AS hu
         |    FROM mfr)),
         |mdig AS (
         |  SELECT doc_id,
         |         md5(array_to_string(list(CAST(cksum AS VARCHAR) ORDER BY i), ','))
         |           AS frames_digest
         |  FROM mck GROUP BY doc_id)
         |SELECT b.doc_id, b.media_type, b.n_bytes,
         |       64 + (b.n_bytes % 193) AS width,
         |       64 + ((b.n_bytes * 31) % 149) AS height,
         |       CASE WHEN b.n_bytes = 0 THEN 0.0
         |            ELSE CAST(list_sum(list_transform(string_split(b.text, ''),
         |                                              x -> ord(x))) AS DOUBLE)
         |                 / b.n_bytes END AS mean_byte,
         |       CAST(CASE WHEN b.n_bytes = 0 THEN 0
         |            ELSE list_min(list_transform(string_split(b.text, ''), x -> ord(x)))
         |            END AS INTEGER) AS min_byte,
         |       CAST(CASE WHEN b.n_bytes = 0 THEN 0
         |            ELSE list_max(list_transform(string_split(b.text, ''), x -> ord(x)))
         |            END AS INTEGER) AS max_byte,
         |       COALESCE(CAST(e.eg AS DOUBLE) / 1048576.0, 0.0) AS entropy,
         |       d.frames_digest
         |FROM mbase b
         |LEFT JOIN ment e USING (doc_id)
         |JOIN mdig d USING (doc_id)""".stripMargin
    }) { (s, d) =>
      extractFeatures(mediaDataset(s, d)).toDF()
        .withColumn("frames_digest",
          md5(concat_ws(",", transform(col("frame_checksums"), _.cast("string")))))
        .drop("frame_checksums")
    },
  )
}
