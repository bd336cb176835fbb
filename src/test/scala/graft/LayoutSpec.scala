package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Portable.zorderKey
import graft.sources.{Layout, Tables}

/** Z-order clustered layout: after a Z-write on (partkey, suppkey), EVERY
  * file covers a narrow rectangle in both dimensions — so min-max stats can
  * prune scans filtered on either column. The single-column baseline layout
  * clusters only its sort column and leaves the other full-range per file.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  /** Mean per-file normalized min-max width of `c` over the files of a
    * parquet dir — the fraction of the column's full range a scan of that
    * file cannot rule out.
    */
  private def meanFileWidth(dir: String, c: String, lo: Long, hi: Long): Double = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length > 1, s"expected multiple files in $dir")
    val widths = files.map { f =>
      val r = spark.read.parquet(f).agg(min(col(c)), max(col(c))).head()
      (r.getLong(1) - r.getLong(0)).toDouble / (hi - lo)
    }
    widths.sum / widths.length
  }

  test("z-order write keeps BOTH dimensions narrow per file; single-sort leaves one full-range") {
    val li = Tables.lineitem(spark, TestSession.sf)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    val base = Files.createTempDirectory("graft-layout").toString
    // partkey spans 8 bits, suppkey 4 at this SF (widths from table stats)
    Layout.zorderWrite(li, "l_partkey", 8, "l_suppkey", 4, s"$base/z", 16)
    Layout.sortedWrite(li, "l_partkey", s"$base/single", 16)

    val zPart = meanFileWidth(s"$base/z", "l_partkey", 0, 199)
    val zSupp = meanFileWidth(s"$base/z", "l_suppkey", 0, 9)
    val sPart = meanFileWidth(s"$base/single", "l_partkey", 0, 199)
    val sSupp = meanFileWidth(s"$base/single", "l_suppkey", 0, 9)

    // z-layout: both dimensions clustered — skippable on either filter
    assert(zPart <= 0.6, s"z-layout partkey width $zPart")
    assert(zSupp <= 0.6, s"z-layout suppkey width $zSupp")
    // baseline: its sort column is tight but the other dimension is useless
    assert(sPart <= 0.2, s"single-sort partkey width $sPart")
    assert(sSupp >= 0.9, s"single-sort suppkey width $sSupp — expected full-range")
  }

  test("size-targeted write: file count follows the byte target, data complete") {
    val li = graft.sources.Tables.lineitem(spark, TestSession.sf)
    val n = li.count()
    val out = java.nio.file.Files.createTempDirectory("graft-sized").toString
    // pick a target that implies a handful of files for the smoke fixture
    val totalProbe = java.nio.file.Files.createTempDirectory("graft-sized-all").toString
    li.coalesce(1).write.mode("overwrite").parquet(totalProbe)
    val totalBytes = new java.io.File(totalProbe).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val target = math.max(1L, totalBytes / 4) // aim for ~4 files
    val planned = graft.sources.Layout.sizeTargetedWrite(li, out, target)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(planned >= 2 && planned <= 8, s"expected ~4 planned files, got $planned")
    assert(files.length.toLong == planned,
      s"wrote ${files.length} files, planned $planned")
    // every file within the order-of-magnitude band of the target (codec
    // variance allowed; the point is no KB-dust and no multi-GB monolith)
    files.foreach { f =>
      assert(f.length < target * 3, s"${f.getName} is ${f.length} B vs target $target")
    }
    assert(spark.read.parquet(out).count() == n, "sized write must keep every row")
  }

  test("shuffled export: one file per shard, rows in global-shuffle order, corpus complete") {
    val docs = Tables.documents(spark, TestSession.sf)
    val out = Files.createTempDirectory("graft-export").toString + "/shuffled"
    Layout.shuffledExport(docs, out, shards = 4)
    val shardDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard=")).sortBy(_.getName)
    assert(shardDirs.length == 4)
    var seen = Set.empty[Long]
    shardDirs.foreach { dir =>
      val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${dir.getName}: expected one file, got ${files.length}")
      // a sequential read of the single file must replay pos order exactly
      val rows = spark.read.parquet(files.head.getPath).select("doc_id", "pos")
        .coalesce(1).collect()
      val ps = rows.map(_.getAs[Long]("pos"))
      assert(ps.toSeq == (1L to ps.length), s"${dir.getName} not in pos order")
      seen ++= rows.map(_.getAs[Long]("doc_id"))
    }
    // the export is a permutation of the corpus: nothing lost, nothing doubled
    assert(seen == docs.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("zorder key: MSB-aligned interleave orders the plane in Morton order") {
    import spark.implicits._
    // 2-bit × 2-bit: z of (a,b) must be a1 b1 a0 b0
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 0L), (0L, 2L), (3L, 3L))
      .toDF("a", "b")
      .select(col("a"), col("b"), zorderKey(col("a"), 2, col("b"), 2).as("z"))
    val z = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(z == Map(
      (0L, 0L) -> 0L, (1L, 0L) -> 2L, (0L, 1L) -> 1L, (1L, 1L) -> 3L,
      (2L, 0L) -> 8L, (0L, 2L) -> 4L, (3L, 3L) -> 15L))
  }

  test("pruning stats: Z-order beats the wrong-column sort on files touched") {
    val r = graft.operators.Relational
      .pruningStats(graft.sources.Tables.lineitem(spark, TestSession.sf))
      .collect()
      .map(x => (x.getAs[String]("layout"), x.getAs[Long]("probe_id")) ->
        x.getAs[Long]("files_touched")).toMap
    val probes = r.keys.map(_._2).toSeq.distinct
    val sup = probes.map(p => r(("supplier", p))).sum
    val zo = probes.map(p => r(("zorder", p))).sum
    val hil = probes.map(p => r(("hilbert", p))).sum
    assert(zo < sup,
      s"Z-order must touch fewer files than the supplier sort: $zo vs $sup")
    assert(hil < sup,
      s"Hilbert must also beat the wrong-column sort: $hil vs $sup")
    // probes beyond the fixture's product range touch nothing under either
    // layout; in-range probes always touch at least one file
    r.foreach { case ((l, p), t) =>
      assert(t >= 0 && t <= graft.operators.Relational.pruneFiles, s"($l,$p)=$t")
    }
  }

  test("file sizing plan: ceil-divided file counts, floor of one file, rows rounded up") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "t", "en", "big", 9000L), (2L, "t", "en", "big", 200L),
      (3L, "t", "en", "tiny", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.operators.Relational.fileSizing(fixture).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("est_bytes"),
          r.getAs[Long]("n_files"), r.getAs[Long]("rows_per_file"))).toMap
    // big: 9200 bytes / 4096 target → ceil = 3 files, 2 rows → 1 row/file
    assert(out("big") == ((2L, 9200L, 3L, 1L)))
    // tiny: 10 bytes → floor of 1 file, 1 row per file
    assert(out("tiny") == ((1L, 10L, 1L, 1L)))
  }
}
