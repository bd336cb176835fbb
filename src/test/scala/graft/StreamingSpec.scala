package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventOps
import graft.sources.Tables
import graft.streaming.StreamingOps

/** Streaming shapes must converge to the batch (DuckDB-verified) answers. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def stageEvents(): String = {
    val dir = Files.createTempDirectory("graft-stream-in").toString
    // stage fixture events as two "arriving" files
    val ev = Tables.events(spark, TestSession.sf)
    ev.filter(col("event_id") % 2 === 0).write.mode("append").parquet(dir)
    ev.filter(col("event_id") % 2 === 1).write.mode("append").parquet(dir)
    dir
  }

  test("streaming hourly rollup over file source equals the batch rollup") {
    val dir = stageEvents()
    val q = StreamingOps.runAvailableNow(
      StreamingOps.hourlyRollup(StreamingOps.eventStream(spark, dir)),
      "hourly_test", Files.createTempDirectory("graft-ckpt").toString)
    q.awaitTermination(120000)
    val streamed = spark.table("hourly_test")
    val batch = EventOps.hourlyRollup(Tables.events(spark, TestSession.sf))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("incremental streaming KPI upsert converges to the batch answer") {
    import graft.operators.Kpi
    import graft.sources.Tables
    val sf = TestSession.sf
    val ordersDir = Files.createTempDirectory("graft-orders-in").toString
    val kpiPath = Files.createTempDirectory("graft-kpi-out").toString + "/daily"
    val orders = Tables.ordersDomain(spark, sf)
    val items = Tables.orderItems(spark, sf)
    // two "arrival waves" of order files → at least two micro-batches
    orders.filter(col("order_id") % 2 === 0).write.mode("append").parquet(ordersDir)
    orders.filter(col("order_id") % 2 === 1).write.mode("append").parquet(ordersDir)
    val staticOrders = spark.read.schema(graft.sources.Csv.ordersSchema).parquet(ordersDir)
    val q = StreamingOps.incrementalDailyKpis(spark, ordersDir, staticOrders, items,
      kpiPath, Files.createTempDirectory("graft-ckpt3").toString, maxFilesPerTrigger = Some(1))
    q.awaitTermination(180000)
    val streamed = spark.read.parquet(kpiPath)
      .select("date_key", "total_orders", "total_revenue", "return_rate",
        "unique_customers", "total_items_sold")
    val batch = Kpi.orderKpis(staticOrders, items)
      .select("date_key", "total_orders", "total_revenue", "return_rate",
        "unique_customers", "total_items_sold")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      s"streamed=${streamed.count()} batch=${batch.count()}")
  }

  test("streaming dedup: duplicated arrivals collapse to distinct event ids") {
    val dir = Files.createTempDirectory("graft-dup-in").toString
    // deterministic subset (unordered limit could pick different rows per job)
    val ev = Tables.events(spark, TestSession.sf)
      .orderBy(col("event_id")).limit(200)
    // the same 200 events arrive twice (two files) → dedup must emit 200
    ev.write.mode("append").parquet(dir)
    ev.write.mode("append").parquet(dir)
    val q = StreamingOps.dedupStream(StreamingOps.eventStream(spark, dir))
      .writeStream.format("memory").queryName("dedup_test").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-ckpt4").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("dedup_test")
    assert(got.count() == 200)
    assert(got.select("event_id").distinct().count() == 200)
  }

  test("stream-stream attribution self-join equals the same function run in batch") {
    val dir = stageEvents()
    val q = StreamingOps.runAvailableNow(
      StreamingOps.purchaseAttribution(StreamingOps.eventStream(spark, dir)),
      "attr_test", Files.createTempDirectory("graft-ckpt5").toString,
      outputMode = "append")
    q.awaitTermination(120000)
    val streamed = spark.table("attr_test")
    // withWatermark is a no-op in batch: identical code path, batch execution
    val batch = StreamingOps.purchaseAttribution(Tables.events(spark, TestSession.sf))
    assert(batch.count() > 0, "fixture must produce at least one attribution pair")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      s"streamed=${streamed.count()} batch=${batch.count()}")
  }

  test("streaming incremental dedup over a growing index reproduces the batch pair set") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, TestSession.sf)
    val inDir = Files.createTempDirectory("graft-dedup-in").toString
    val base = Files.createTempDirectory("graft-dedup-out").toString
    // the corpus arrives in two waves; the index starts EMPTY
    docs.filter(col("doc_id") % 2 === 0).write.mode("append").parquet(inDir)
    docs.filter(col("doc_id") % 2 === 1).write.mode("append").parquet(inDir)
    val q = StreamingOps.incrementalDedupLoop(spark, inDir,
      s"$base/index", s"$base/pairs",
      Files.createTempDirectory("graft-ckpt6").toString, maxFilesPerTrigger = Some(1))
    q.awaitTermination(180000)
    // every doc was hashed exactly once (index holds one row per long-enough doc)
    val indexed = spark.read.parquet(s"$base/index")
    assert(indexed.select("doc_id").distinct().count() == indexed.count())
    // the accumulated pair stream == the one-shot batch pair set
    val streamed = spark.read.parquet(s"$base/pairs")
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val batch = Dedup.minhashPairs(docs)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"streamed ${streamed.size} pairs, batch ${batch.size}")
    // worst-case crash recovery: a FULL replay (fresh checkpoint, same input)
    // re-fires every micro-batch; the batchId commit markers make each one a
    // no-op, so the index keeps exactly one row per doc and the pair set is
    // unchanged — no duplicate appends, no self-matching pairs
    val nIndexed = indexed.count()
    val q2 = StreamingOps.incrementalDedupLoop(spark, inDir,
      s"$base/index", s"$base/pairs",
      Files.createTempDirectory("graft-ckpt6b").toString, maxFilesPerTrigger = Some(1))
    q2.awaitTermination(180000)
    val replayedIdx = spark.read.parquet(s"$base/index")
    assert(replayedIdx.count() == nIndexed, "replayed micro-batches must be no-ops")
    assert(replayedIdx.select("doc_id").distinct().count() == nIndexed)
    val replayedPairs = spark.read.parquet(s"$base/pairs")
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(replayedPairs == batch)
  }

  test("streaming media dedup over a growing hash index reproduces the doc-grain pair set") {
    import graft.multimodal.Multimodal
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, TestSession.sf))
      .select(col("doc_id"), col("payload"))
    val inDir = Files.createTempDirectory("graft-mdedup-in").toString
    val base = Files.createTempDirectory("graft-mdedup-out").toString
    // the corpus arrives in two waves; the index starts EMPTY
    media.filter(col("doc_id") % 2 === 0).write.mode("append").parquet(inDir)
    media.filter(col("doc_id") % 2 === 1).write.mode("append").parquet(inDir)
    val q = StreamingOps.incrementalMediaDedupLoop(spark, inDir,
      s"$base/index", s"$base/pairs",
      Files.createTempDirectory("graft-mckpt").toString, maxFilesPerTrigger = Some(1))
    q.awaitTermination(180000)
    // every payload was decoded exactly once (one index row per doc)
    val indexed = spark.read.parquet(s"$base/index")
    assert(indexed.count() == media.count())
    assert(indexed.select("doc_id").distinct().count() == indexed.count())
    // accumulated pair stream == the full doc-grain banded pair set
    // (= incrementalMediaPairs of the whole corpus against an empty index)
    val streamed = spark.read.parquet(s"$base/pairs")
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val full = Multimodal.incrementalMediaPairs(media, Multimodal.dhashOf(media.limit(0)))
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(streamed == full, s"streamed ${streamed.size} pairs, batch ${full.size}")
    // replay with a fresh checkpoint: commit markers make every batch a no-op
    val q2 = StreamingOps.incrementalMediaDedupLoop(spark, inDir,
      s"$base/index", s"$base/pairs",
      Files.createTempDirectory("graft-mckpt2").toString, maxFilesPerTrigger = Some(1))
    q2.awaitTermination(180000)
    assert(spark.read.parquet(s"$base/index").count() == indexed.count(),
      "replayed micro-batches must be no-ops")
  }

  test("streaming span dedup over a growing owner index reproduces the batch rewrite") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, TestSession.sf)
    val cut = 250L
    val inDir = Files.createTempDirectory("graft-sdedup-in").toString
    val base = Files.createTempDirectory("graft-sdedup-out").toString
    // doc_id-ORDERED waves (arrival order = canonical order, so
    // first-writer-wins == the full rewrite's global (doc_id, pos) min).
    // One part file per wave: FileStreamSource orders by mod-time then path,
    // so a multi-part wave under maxFilesPerTrigger=1 could split into
    // out-of-doc_id-order micro-batches and void the ordering premise.
    docs.filter(col("doc_id") < cut).coalesce(1).write.mode("append").parquet(inDir)
    docs.filter(col("doc_id") >= cut).coalesce(1).write.mode("append").parquet(inDir)
    val q = StreamingOps.incrementalSpanDedupLoop(spark, inDir,
      s"$base/index", s"$base/clean",
      Files.createTempDirectory("graft-sckpt").toString, maxFilesPerTrigger = Some(1))
    q.awaitTermination(180000)
    def keyOf(r: org.apache.spark.sql.Row) =
      r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_covered"), r.getAs[String]("clean_text"))
    val streamed = spark.read.parquet(s"$base/clean").collect().map(keyOf).toMap
    val full = Dedup.dedupSpans(docs).collect().map(keyOf).toMap
    assert(streamed.size == full.size)
    assert(streamed == full, "streamed rewrite must equal the one-shot batch rewrite")
    assert(full.values.exists(_._1 > 0), "fixture must contain duplicated spans")
    // replay with a fresh checkpoint: commit markers make every batch a no-op
    val nIdx = spark.read.parquet(s"$base/index").count()
    val q2 = StreamingOps.incrementalSpanDedupLoop(spark, inDir,
      s"$base/index", s"$base/clean",
      Files.createTempDirectory("graft-sckpt2").toString, maxFilesPerTrigger = Some(1))
    q2.awaitTermination(180000)
    assert(spark.read.parquet(s"$base/index").count() == nIdx,
      "replayed micro-batches must be no-ops")
    assert(spark.read.parquet(s"$base/clean").collect().map(keyOf).toMap == full)
  }

  test("streaming search-index maintenance equals the one-shot batch build") {
    import graft.operators.Search
    val docs = Tables.documents(spark, TestSession.sf)
    val inDir = Files.createTempDirectory("graft-search-in").toString
    val idxDir = Files.createTempDirectory("graft-search-idx").toString + "/index"
    // the corpus arrives in two waves of doc-disjoint batches
    docs.filter(col("doc_id") % 2 === 0).write.mode("append").parquet(inDir)
    docs.filter(col("doc_id") % 2 === 1).write.mode("append").parquet(inDir)
    val q = StreamingOps.incrementalSearchIndex(spark, inDir, idxDir,
      Files.createTempDirectory("graft-ckpt-si").toString, maxFilesPerTrigger = Some(1))
    q.awaitTermination(180000)
    val streamed = StreamingOps.storedStreamIndex(spark, idxDir)
    val batch = Search.buildIndex(docs)
    def postingsOf(i: Search.Bm25Index) = i.postings.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("token"),
        r.getAs[Long]("tf"), r.getAs[Long]("len"))).toSet
    def dfOf(i: Search.Bm25Index) = i.df.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def statsOf(i: Search.Bm25Index) = i.stats.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(postingsOf(streamed) == postingsOf(batch))
    assert(dfOf(streamed) == dfOf(batch))
    assert(statsOf(streamed) == statsOf(batch))
    // the ranked query over the streamed bundle equals the batch query
    def ranked(i: Search.Bm25Index) = Search.bm25TopKFromIndex(i).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("score_q"),
        r.getAs[Int]("rank"))).toSet
    assert(ranked(streamed) == ranked(batch))
    // full replay (fresh checkpoint): committed bundles are no-ops
    val q2 = StreamingOps.incrementalSearchIndex(spark, inDir, idxDir,
      Files.createTempDirectory("graft-ckpt-si2").toString, maxFilesPerTrigger = Some(1))
    q2.awaitTermination(180000)
    val replayed = StreamingOps.storedStreamIndex(spark, idxDir)
    assert(postingsOf(replayed) == postingsOf(batch), "replay must be a no-op")
    assert(dfOf(replayed) == dfOf(batch) && statsOf(replayed) == statsOf(batch))
  }

  test("streaming session windows converge to the batch session_window answer") {
    val dir = stageEvents()
    val q = StreamingOps.runAvailableNow(
      StreamingOps.sessionRollup(StreamingOps.eventStream(spark, dir)),
      "sessions_test", Files.createTempDirectory("graft-ckpt7").toString)
    q.awaitTermination(120000)
    val streamed = spark.table("sessions_test")
    // identical grouping + DECIMAL-quantized sum, batch execution — the
    // DuckDB-gated events_session_windows op
    val batch = EventOps.sessionWindows(Tables.events(spark, TestSession.sf))
      .select("user_id", "session_start", "n_events", "total_value")
    assert(batch.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      s"streamed=${streamed.count()} batch=${batch.count()}")
  }

  test("flatMapGroupsWithState sessions: exactly the batch sessions closed by the final watermark") {
    import spark.implicits._
    val dir = stageEvents()
    val typed = StreamingOps.eventStream(spark, dir).as[StreamingOps.Event]
    val q = StreamingOps.runAvailableNow(
      StreamingOps.sessionizeStream(typed).toDF(),
      "fsess_test", Files.createTempDirectory("graft-ckpt8").toString,
      outputMode = "append")
    q.awaitTermination(180000)
    val streamed = spark.table("fsess_test").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("session_start"),
        r.getAs[java.sql.Timestamp]("session_end"), r.getAs[Long]("n_events"),
        r.getAs[Double]("total_value"))).toSet
    // final watermark = max event time − 30 min; the stream must emit exactly
    // the batch sessions that closed (end + gap) strictly before it
    val events = Tables.events(spark, TestSession.sf)
    val maxUs = events.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val wmUs = maxUs - 30L * 60 * 1000000
    val gapUs = EventOps.sessionGapUs
    val expected = EventOps.sessionize(events).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("session_start"),
        r.getAs[java.sql.Timestamp]("session_end"), r.getAs[Long]("n_events"),
        r.getAs[Double]("total_value")))
      .filter(s => s._3.getTime / 1000L * 1000000L + s._3.getNanos / 1000L + gapUs < wmUs)
      .toSet
    assert(expected.nonEmpty)
    assert(streamed == expected,
      s"streamed ${streamed.size} sessions, expected ${expected.size}")
  }

  test("mapGroupsWithState running user stats equal batch per-user totals") {
    import spark.implicits._
    val dir = stageEvents()
    val typed = StreamingOps.eventStream(spark, dir).as[StreamingOps.Event]
    val q = StreamingOps.runAvailableNow(
      StreamingOps.userRunningStats(typed).toDF(),
      "user_state_test", Files.createTempDirectory("graft-ckpt2").toString,
      outputMode = "update")
    q.awaitTermination(120000)
    // "update" emits one row per user per micro-batch — keep the final state
    val streamed = spark.table("user_state_test")
      .groupBy("user_id").agg(max(struct(col("n_events"), col("total_value"), col("last_seen"))).as("s"))
      .select(col("user_id"), col("s.n_events"), col("s.total_value"), col("s.last_seen"))
    val batch = EventOps.userStats(Tables.events(spark, TestSession.sf))
      .select(col("user_id"), col("n_events"), col("total_value"), col("last_seen"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      s"streamed=${streamed.count()} batch=${batch.count()}")
  }

  test("streaming url dedup: final index equals full recompute; ownership first-writer") {
    import graft.operators.TextOps
    val docs = Tables.documents(spark, TestSession.sf)
    val cut = 250L
    val inDir = Files.createTempDirectory("graft-url-in").toString
    val base = Files.createTempDirectory("graft-url-out").toString
    // doc_id-ordered waves, one part file each (the span-loop convention:
    // arrival order = canonical order so first-writer = global-min owner)
    docs.filter(col("doc_id") < cut).coalesce(1).write.mode("append").parquet(inDir)
    docs.filter(col("doc_id") >= cut).coalesce(1).write.mode("append").parquet(inDir)
    val q = StreamingOps.incrementalUrlDedupLoop(spark, inDir,
      s"$base/index", s"$base/assign",
      Files.createTempDirectory("graft-uckpt").toString, maxFilesPerTrigger = Some(1))
    q.awaitTermination(180000)
    // compacted index == the one-shot full index
    def idxKey(r: org.apache.spark.sql.Row) =
      r.getAs[Long]("ch") -> (r.getAs[Long]("n_dups"), r.getAs[Long]("owner_doc"))
    val compacted = spark.read.parquet(s"$base/index")
      .groupBy(col("ch")).agg(org.apache.spark.sql.functions.sum(col("n_dups")).as("n_dups"),
        org.apache.spark.sql.functions.min(col("owner_doc")).as("owner_doc"))
      .collect().map(idxKey).toMap
    val full = TextOps.urlIndex(docs).collect().map(idxKey).toMap
    assert(compacted == full, "streamed index must equal the one-shot index")
    // per-doc ownership under ordered arrival == the full recompute's flag
    val streamedOwn = spark.read.parquet(s"$base/assign")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Boolean]("is_url_canonical")).toMap
    val fullOwn = TextOps.urlDedup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Boolean]("is_url_canonical")).toMap
    assert(streamedOwn == fullOwn)
    // replay with a fresh checkpoint: commit markers make every batch a no-op
    val nIdx = spark.read.parquet(s"$base/index").count()
    val q2 = StreamingOps.incrementalUrlDedupLoop(spark, inDir,
      s"$base/index", s"$base/assign",
      Files.createTempDirectory("graft-uckpt2").toString, maxFilesPerTrigger = Some(1))
    q2.awaitTermination(180000)
    assert(spark.read.parquet(s"$base/index").count() == nIdx,
      "replayed micro-batches must be no-ops")
  }

  test("manifest state compaction: seal fences atomically; decisions, replay and GC all unchanged") {
    import spark.implicits._
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
      "theta", "iota", "kappa", "lam", "mu", "nu", "xi")
    def gen(seed: Int, n: Int = 40): String =
      (0 until n).map(i => vocab((i * 7 + seed * 13 + i * i * seed) % vocab.size))
        .mkString(" ")
    def vary(base: String, at: Int*): String = {
      val ws = base.split(" "); at.foreach(i => ws(i) = s"CHANGED$i"); ws.mkString(" ")
    }
    val a = gen(1); val y = gen(5)
    val wave0 = Seq(1L -> a, 2L -> vary(a, 25), 15L -> y)
    val wave1 = Seq(7L -> a, 21L -> vary(a, 30))
    // wave 2 arrives AFTER compaction: 14 is a smaller-id exact copy of the
    // SEALED owner 15 (exercises the folded owners state), 28 is a loner
    val wave2 = Seq(14L -> y, 28L -> gen(11))
    def df(ws: Seq[(Long, String)]) =
      ws.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    val inDir = Files.createTempDirectory("graft-cmp-in").toString
    for (w <- Seq(wave0, wave1)) df(w).coalesce(1).write.mode("append").parquet(inDir)
    val storeA = Files.createTempDirectory("graft-cmp-a").toString
    val storeB = Files.createTempDirectory("graft-cmp-b").toString
    val ckptA = Files.createTempDirectory("graft-cmp-ca").toString
    val ckptB = Files.createTempDirectory("graft-cmp-cb").toString
    def run(store: String, ckpt: String) = {
      val q = StreamingOps.incrementalManifestLoop(spark, inDir, store, ckpt,
        maxFilesPerTrigger = Some(1))
      q.awaitTermination(180000)
    }
    run(storeA, ckptA); run(storeB, ckptB)
    StreamingOps.compactManifestState(spark, storeA)
    // atomic fencing: folded numeric dirs are still on disk, yet invisible
    val live = StreamingOps.committedManifestDirs(spark, storeA, "labels")
    assert(live.size == 1 && live.head.contains("sealed1"), s"got $live")
    assert(new java.io.File(s"$storeA/labels").list()
      .count(_.startsWith("batch_id=")) == 3, "garbage not yet reclaimed")
    // the post-compaction batch decides identically on both stores
    df(wave2).coalesce(1).write.mode("append").parquet(inDir)
    run(storeA, ckptA); run(storeB, ckptB)
    def key(r: org.apache.spark.sql.Row) = r.getAs[Long]("doc_id") ->
      (r.getAs[Boolean]("is_canonical"), r.getAs[Long]("cluster_id"),
        r.getAs[Boolean]("is_cluster_survivor"), r.getAs[Boolean]("keep"))
    def manifests(store: String) =
      spark.read.parquet(s"$store/manifest").collect().map(key).toMap
    val a2 = manifests(storeA)
    assert(a2 == manifests(storeB),
      "compaction must not change any decision the loop makes")
    assert(a2(14L)._1, "smaller-id copy must still beat the SEALED owner")
    // GC reclaims the fenced dirs but keeps the replay no-op markers
    StreamingOps.gcManifestState(spark, storeA)
    assert(!new java.io.File(s"$storeA/labels/batch_id=0").exists())
    assert(new java.io.File(s"$storeA/sigindex/batch_id=0/_SUCCESS").exists())
    assert(new java.io.File(s"$storeA/sigindex/batch_id=0").list()
      .forall(n => n == "_SUCCESS" || n == "._SUCCESS.crc"),
      "sealed sigindex batch keeps only its marker (and the local-FS crc twin)")
    // a worst-case fresh-checkpoint full replay stays a no-op AFTER gc
    run(storeA, Files.createTempDirectory("graft-cmp-ca2").toString)
    assert(manifests(storeA) == a2, "replay after compaction+gc must be a no-op")
  }

  test("streaming manifest loop: per-batch rows equal the sequential incremental manifest") {
    import spark.implicits._
    import graft.operators.{Dedup, TextOps}
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
      "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omi", "pi", "rho",
      "sigma")
    def gen(seed: Int, n: Int = 50): String =
      (0 until n).map(i => vocab((i * 7 + seed * 13 + i * i * seed) % vocab.size))
        .mkString(" ")
    def vary(base: String, at: Int*): String = {
      val ws = base.split(" "); at.foreach(i => ws(i) = s"CHANGED$i"); ws.mkString(" ")
    }
    val a = gen(1); val y = gen(5); val m2 = gen(6)
    // wave 0: the a-family seed cluster, y's first copy, and TWO separate
    // singletons each ~0.78-jaccard from m2 but only ~0.6 from each other
    // (tau = 0.7: both pair with m2, never with each other) — the stage for
    // a genuine cross-batch cluster MERGE when m2 itself arrives in wave 2
    val wave0 = Seq(1L -> a, 2L -> vary(a, 25), 15L -> y,
      41L -> vary(m2, 10, 20), 43L -> vary(m2, 30, 40))
    // wave 1: an exact copy of doc 1 (loses canonicity AND survivorship to
    // the identical older doc) and an exact copy of y with a SMALLER id
    // (id-min semantics: wins canonicity against the stored owner)
    val wave1 = Seq(7L -> a, 21L -> vary(a, 30), 14L -> y)
    // wave 2: m2 bridges the two wave-0 singletons (merge), plus a loner
    val wave2 = Seq(42L -> m2, 28L -> gen(11))
    def df(ws: Seq[(Long, String)]) =
      ws.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    val inDir = Files.createTempDirectory("graft-manifest-in").toString
    for (w <- Seq(wave0, wave1, wave2))
      df(w).coalesce(1).write.mode("append").parquet(inDir)
    val base = Files.createTempDirectory("graft-manifest-out").toString
    val q = StreamingOps.incrementalManifestLoop(spark, inDir, base,
      Files.createTempDirectory("graft-mfckpt").toString,
      maxFilesPerTrigger = Some(1))
    q.awaitTermination(180000)
    val all = (wave0 ++ wave1 ++ wave2).toMap
    def key(r: org.apache.spark.sql.Row) = r.getAs[Long]("doc_id") ->
      (r.getAs[Boolean]("is_canonical"), r.getAs[Double]("quality"),
        r.getAs[String]("lang_pred"), r.getAs[Long]("cluster_id"),
        r.getAs[Boolean]("is_cluster_survivor"), r.getAs[String]("split"),
        r.getAs[Boolean]("model_keep"), r.getAs[Boolean]("keep"))
    // reconstruct arrival order from the committed batch subdirs (file-source
    // ordering is an implementation detail; the CONTRACT is per-batch
    // equality against the sequential incremental manifest over whatever
    // arrived earlier)
    val mroot = new java.io.File(s"$base/manifest")
    val batchDirs = mroot.listFiles().filter(_.getName.startsWith("batch_id="))
      .sortBy(_.getName.stripPrefix("batch_id=").toLong)
    assert(batchDirs.length == 3, s"expected 3 micro-batches, got ${batchDirs.length}")
    var seen = Seq.empty[Long]
    val streamed = scala.collection.mutable.Map.empty[Long, Any]
    for (bd <- batchDirs) {
      val got = spark.read.parquet(bd.toString).collect()
      val ids = got.map(_.getAs[Long]("doc_id")).toSeq
      val hist = df(seen.map(id => id -> all(id)))
      val batch = df(ids.map(id => id -> all(id)))
      val histLabels = hist.select(col("doc_id"))
        .join(Dedup.connectedComponents(Dedup.minhashPairs(hist))
          .select(col("node").as("doc_id"), col("label").as("cid")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("cid"), col("doc_id")).as("cluster_id"))
      val want = TextOps.trainingManifestIncremental(batch, histLabels,
        Dedup.clusterSurvivors(hist, histLabels)
          .select(col("cluster_id"), col("survivor_id"), col("survivor_quality")),
        Dedup.exactGroups(hist).select(col("text_key"), col("canonical_id")),
        Dedup.minhashIndex(hist)).collect()
      assert(got.map(key).toMap == want.map(key).toMap,
        s"batch ${bd.getName} (docs $ids)")
      got.map(key).foreach { case (id, v) => streamed(id) = v }
      seen = seen ++ ids
    }
    // every doc decided exactly once, and the engineered cross-batch
    // decisions came out as designed
    assert(streamed.keySet == all.keySet)
    val s7 = streamed(7L).asInstanceOf[(Boolean, Double, String, Long, Boolean, String, Boolean, Boolean)]
    assert(!s7._1 && !s7._5, "late exact copy loses canonicity and survivorship")
    val s14 = streamed(14L).asInstanceOf[(Boolean, Double, String, Long, Boolean, String, Boolean, Boolean)]
    assert(s14._1 && s14._5, "smaller-id copy wins against the stored owner")
    val s42 = streamed(42L).asInstanceOf[(Boolean, Double, String, Long, Boolean, String, Boolean, Boolean)]
    assert(s42._4 == 41L,
      s"doc 42 must merge the two wave-0 singletons under min id 41, got cluster ${s42._4}")
    // worst-case crash recovery: full replay with a fresh checkpoint — the
    // sigindex commit markers make every micro-batch a no-op
    val before = spark.read.parquet(s"$base/manifest").collect().map(key).toMap
    val q2 = StreamingOps.incrementalManifestLoop(spark, inDir, base,
      Files.createTempDirectory("graft-mfckpt2").toString,
      maxFilesPerTrigger = Some(1))
    q2.awaitTermination(180000)
    val after = spark.read.parquet(s"$base/manifest").collect().map(key).toMap
    assert(after == before, "replayed micro-batches must be no-ops")
  }
}
