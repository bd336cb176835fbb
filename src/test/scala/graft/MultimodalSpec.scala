package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaFeatures, MediaRecord}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("binary payload plumbing: schema, batching, deterministic features") {
    import spark.implicits._
    val media = Seq(
      MediaRecord(1L, "media/img", "hello world".getBytes("UTF-8")),
      MediaRecord(2L, "media/img", Array.emptyByteArray),
      MediaRecord(3L, "media/aud", ("x" * 1000).getBytes("UTF-8"))
    ).toDS()
    val feats = Multimodal.extractFeatures(media, nFrames = 4, batchSize = 2)
      .collect().map(f => f.doc_id -> f).toMap

    val f1 = feats(1L)
    assert(f1.n_bytes == 11)
    assert(f1.width == 64 + 11 % 193 && f1.height == 64 + (11 * 31) % 149)
    assert(f1.frame_checksums.length == 4)
    // deterministic: recomputing yields identical values
    val again = Multimodal.extractFeatures(media).collect().map(f => f.doc_id -> f).toMap
    assert(again(1L) == f1)

    val f2 = feats(2L) // empty payload: all-zero features, no crash
    assert(f2.n_bytes == 0 && f2.entropy == 0.0 && f2.frame_checksums.forall(_ == 0L))

    val f3 = feats(3L) // single-symbol payload: zero entropy, mean = 'x'
    assert(f3.entropy == 0.0 && f3.mean_byte == 'x'.toInt.toDouble)
  }

  test("media features over the fixture documents run distributed") {
    val out = Multimodal.extractFeatures(Multimodal.mediaDataset(spark, TestSession.sf))
    assert(out.count() == 500)
  }

  /** JDK-only image fixture: encode a blank w×h image to `fmt` bytes. */
  private def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  test("real image payloads decode header dimensions; non-images fall back to stub") {
    import spark.implicits._
    val png = imageBytes(20, 30, "png")
    val bmp = imageBytes(7, 5, "bmp")
    val jpg = imageBytes(33, 17, "jpg")
    val txt = "not an image at all".getBytes("UTF-8")
    // the decode function itself
    assert(Multimodal.decode(png) == ((20, 30)))
    assert(Multimodal.decode(bmp) == ((7, 5)))
    assert(Multimodal.decode(jpg) == ((33, 17)))
    assert(Multimodal.decode(txt) == Multimodal.decodeStub(txt))
    // corrupt header: PNG magic but truncated body → stub fallback, no crash
    val corrupt = png.take(12)
    assert(Multimodal.decode(corrupt) == Multimodal.decodeStub(corrupt))
    // and through the distributed batched extractor
    val media = Seq(
      MediaRecord(1L, "media/img", png),
      MediaRecord(2L, "media/img", bmp),
      MediaRecord(3L, "media/txt", txt)
    ).toDS()
    val feats = Multimodal.extractFeatures(media, batchSize = 2)
      .collect().map(f => f.doc_id -> ((f.width, f.height))).toMap
    assert(feats(1L) == ((20, 30)) && feats(2L) == ((7, 5)))
    assert(feats(3L) == Multimodal.decodeStub(txt))
  }

  /** Deterministic test pattern at any resolution: vertical stripes + a mild
    * vertical ramp, every value ≤ 200 so a +brightness shift never clamps.
    * Drawn from NORMALIZED coordinates, so two sizes render "the same image".
    */
  private def patternBytes(w: Int, h: Int, bright: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val stripe = if ((x * 13 / w) % 2 == 0) 60 else 160
      val v = math.min(255, stripe + y * 40 / h + bright)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    out.toByteArray
  }

  private def diagBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = ((x * 97 / w) + (y * 151 / h) * 3) % 200
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    out.toByteArray
  }

  test("dHash: brightness-invariant on real pixels, stable under resize, far for different images") {
    import graft.multimodal.Dhash
    val base = Dhash.hash(patternBytes(90, 72))
    // +25 brightness shifts every grid cell by exactly +25 (integer luma of
    // an equal RGB shift), so every gradient SIGN — hence every bit — holds.
    assert(Dhash.hash(patternBytes(90, 72, bright = 25)) == base)
    // the same image rendered at half resolution: nearly all bits hold
    val resized = Dhash.hash(patternBytes(45, 36))
    assert(java.lang.Long.bitCount(base ^ resized) <= Multimodal.nearDupHamming)
    // a genuinely different image is far away in Hamming space
    val other = Dhash.hash(diagBytes(90, 72))
    assert(java.lang.Long.bitCount(base ^ other) > 15)
    // non-image payloads take the deterministic stub-grid path
    val txt = "definitely not an image".getBytes("UTF-8")
    assert(Dhash.hash(txt) == Dhash.fromGrid(Dhash.stubGrid(txt)))
    assert(Dhash.hash(Array.emptyByteArray) == 0L)
    // corrupt image header → stub fallback, no crash
    val corrupt = patternBytes(20, 20).take(16)
    assert(Dhash.hash(corrupt) == Dhash.fromGrid(Dhash.stubGrid(corrupt)))
  }

  /** The base pattern with a bright watermark patch over the top-left grid
    * cell — the "same image plus a logo overlay" near-dup: flips only the
    * bits whose cells the patch touches (≤ 3, inside the d < bands
    * pigeonhole guarantee, so the banded join MUST surface the pair).
    */
  private def watermarkedBytes(w: Int, h: Int): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(patternBytes(w, h)))
    for (y <- 0 until h / 8; x <- 0 until w / 9) {
      val v = math.min(255, (img.getRGB(x, y) & 0xff) + 60)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    out.toByteArray
  }

  test("media near-dup operator pairs brightness-shifted and watermarked re-encodes, not a different image") {
    import spark.implicits._
    import graft.multimodal.Dhash
    // precondition for the pigeonhole-guaranteed banded pair
    val hamWm = java.lang.Long.bitCount(
      Dhash.hash(patternBytes(90, 72)) ^ Dhash.hash(watermarkedBytes(90, 72)))
    assert(hamWm > 0 && hamWm < Multimodal.dhashBands)
    val media = Seq(
      (1L, patternBytes(90, 72)),              // base
      (2L, patternBytes(90, 72, bright = 25)), // brightness-shifted → same hash
      (3L, watermarkedBytes(90, 72)),          // logo overlay → banded near pair
      (4L, diagBytes(90, 72)),                 // unrelated image
      (5L, "same text payload".getBytes("UTF-8")),
      (6L, "same text payload".getBytes("UTF-8")) // exact stub-hash dup
    ).toDF("doc_id", "payload")
    val pairs = Multimodal.nearDupPairs(media)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 2L)) == 0L)            // star pair: identical dHash
    assert(pairs((5L, 6L)) == 0L)            // star pair: identical payload
    assert(pairs((1L, 3L)) == hamWm)         // banded + verified near pair
    assert(!pairs.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("media dup clusters: base, brightness copy, and watermark land in one visual identity") {
    import spark.implicits._
    val media = Seq(
      (1L, patternBytes(90, 72)),
      (2L, patternBytes(90, 72, bright = 25)),
      (3L, watermarkedBytes(90, 72)),
      (4L, diagBytes(90, 72)),
      (5L, "same text payload".getBytes("UTF-8")),
      (6L, "same text payload".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val labels = Multimodal.dupClustersOf(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(1L) == 1L && labels(2L) == 1L && labels(3L) == 1L)
    assert(labels(4L) == 4L)                     // singleton: own cluster
    assert(labels(5L) == 5L && labels(6L) == 5L) // exact stub-hash pair
  }

  test("incremental media near-dup pairs a new re-encode against the stored hash index only") {
    import spark.implicits._
    val corpus = Seq(
      (1L, patternBytes(90, 72)),  // base asset, already indexed
      (4L, diagBytes(90, 72)),     // unrelated indexed asset
      (5L, "old text payload".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val batch = Seq(
      (10L, watermarkedBytes(90, 72)),              // re-encode of indexed 1
      (11L, patternBytes(90, 72, bright = 25)),     // brightness copy of 1
      (12L, "brand new unrelated".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val idx = Multimodal.dhashOf(corpus)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = Multimodal.incrementalMediaPairs(batch, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 11L)) == 0L)                  // exact vs corpus
    assert(pairs.contains((1L, 10L)) && pairs((1L, 10L)) > 0)  // near vs corpus
    assert(pairs.contains((10L, 11L)))              // new-vs-new
    assert(!pairs.keys.exists { case (a, b) => a == 12L || b == 12L || a == 4L })
    idx.unpersist()
  }

  test("cross-modal manifest: gate precedence, dup_media demotion, keep iff reason=keep") {
    import spark.implicits._
    // synthetic decision frames pin every reason branch, including the
    // media-dup-text-unique case the utf-8 fixture payloads cannot produce
    // (payload == utf8(text), so exact text dup <=> exact media dup there)
    def tm(id: Long, canon: Boolean, surv: Boolean, lang: String, q: Double) = {
      val keep = canon && surv && lang == "en" && q >= 0.5
      (id, canon, surv, lang, q, true, keep)
    }
    val textManifest = Seq(
      tm(1L, canon = true, surv = true, "en", 0.9),   // all text gates pass, media canonical
      tm(2L, canon = true, surv = true, "en", 0.9),   // all text gates pass, media DUP
      tm(3L, canon = false, surv = true, "en", 0.9),  // exact text dup (also media dup)
      tm(4L, canon = true, surv = false, "en", 0.9),  // near text dup
      tm(5L, canon = true, surv = true, "de", 0.9),   // off language
      tm(6L, canon = true, surv = true, "en", 0.2)    // low quality
    ).toDF("doc_id", "is_canonical", "is_cluster_survivor", "lang_pred",
      "quality", "model_keep", "keep")
    val clusters = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 6L)
      .toDF("doc_id", "cluster_id")
    val out = Multimodal.crossModalManifest(textManifest, clusters).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("keep"), r.getAs[String]("reason"))).toMap
    assert(out(1L) == ((true, "keep")))
    assert(out(2L) == ((false, "dup_media"))) // text-unique, visual dup
    assert(out(3L) == ((false, "exact_dup_text"))) // text gate outranks media
    assert(out(4L) == ((false, "near_dup_text")))
    assert(out(5L) == ((false, "off_language")))
    assert(out(6L) == ((false, "low_quality")))
    out.foreach { case (id, (keep, reason)) =>
      assert(keep == (reason == "keep"), s"doc $id: keep/reason disagree") }
  }

  test("multimodal manifest over the fixture: doc grain, keep iff reason=keep") {
    val docs = graft.sources.Tables.documents(spark, TestSession.sf)
    val m = Multimodal.multimodalManifest(docs).collect()
    assert(m.length == docs.count())
    m.foreach { r =>
      assert(r.getAs[Boolean]("keep") == (r.getAs[String]("reason") == "keep"))
      val expect = r.getAs[Boolean]("text_keep") && r.getAs[Boolean]("is_media_canonical")
      assert(r.getAs[Boolean]("keep") == expect)
    }
    assert(m.exists(_.getAs[Boolean]("keep")))
    assert(m.exists(!_.getAs[Boolean]("keep")))
  }

  test("media threshold sweep: complete monotone curve, endpoint equals the pair set") {
    val docs = graft.sources.Tables.documents(spark, TestSession.sf)
    val curve = Multimodal.mediaThresholdSweep(docs).collect()
      .map(r => r.getAs[Long]("threshold") -> r.getAs[Long]("n_pairs")).toMap
    assert(curve.keySet == (0L to Multimodal.nearDupHamming).toSet,
      "every threshold row present, including zero-pair ones")
    (1L to Multimodal.nearDupHamming).foreach(t =>
      assert(curve(t) >= curve(t - 1), s"cumulative curve must be monotone at $t"))
    val nPairs = Multimodal.mediaNearDups(docs).count()
    assert(curve(Multimodal.nearDupHamming.toLong) == nPairs,
      "the max-threshold point IS the near-dup pair count")
  }
}
