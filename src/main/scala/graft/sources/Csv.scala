package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** CSV ingestion surface (reference: transform_task.py:121-136 reads
  * header-only untyped CSV; validate_task.py:122-138 samples with nrows).
  *
  * Stronger than the reference by design: every table is read with an explicit
  * `StructType` (SURVEY.md §1.2) — types are enforced at the scan, not by
  * downstream casts. Multi-part files per partition are one multi-path scan
  * (implicit union-all, S1/U1); Spark parallelizes by file split, so a
  * date-partitioned prefix with thousands of parts reads at cluster width.
  */
object Csv {

  /** products(id, sku, cost, category, retail_price) — contract:
    * reference validate_task.py:15.
    */
  val productsSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("sku", StringType),
    StructField("cost", DoubleType),
    StructField("category", StringType),
    StructField("retail_price", DoubleType)))

  /** orders(order_id, user_id, created_at [, returned_at]) — contract:
    * validate_task.py:16; optional column transform_task.py:177.
    */
  val ordersSchema: StructType = StructType(Seq(
    StructField("order_id", LongType),
    StructField("user_id", LongType),
    StructField("created_at", TimestampType),
    StructField("returned_at", TimestampType)))

  /** order_items(order_id, product_id, sale_price [, returned_at, created_at])
    * — contract: validate_task.py:17; created_at is required by the KPI layer
    * (made explicit here, unlike the reference — SURVEY.md §2.2.3).
    */
  val orderItemsSchema: StructType = StructType(Seq(
    StructField("order_id", LongType),
    StructField("product_id", LongType),
    StructField("sale_price", DoubleType),
    StructField("returned_at", TimestampType),
    StructField("created_at", TimestampType)))

  /** S1: multi-path CSV scan with explicit schema (parts union-all'd). */
  def read(spark: SparkSession, schema: StructType, paths: Seq[String]): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(paths: _*)

  /** Header-only read for column-presence validation (V1) — one file split. */
  def readHeaderColumns(spark: SparkSession, path: String): Seq[String] =
    spark.read.option("header", "true").csv(path).columns.toSeq

  /** S2: row-limited sample read (reference SAMPLE_SIZE=100, validate_task.py:28). */
  def readSample(spark: SparkSession, schema: StructType, path: String, n: Int): DataFrame =
    read(spark, schema, Seq(path)).limit(n)

  /** S3: source discovery — list all `*.csv` under a prefix, recursively
    * (reference: transform_task.py:138-156 paginated S3 listing). Uses the
    * Hadoop FileSystem so the same code serves file://, hdfs:// and s3a://.
    */
  def listCsv(spark: SparkSession, prefix: String): Seq[String] = {
    val p = new Path(prefix)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else {
      val it = fs.listFiles(p, true)
      val out = scala.collection.mutable.ArrayBuffer[String]()
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && f.getPath.getName.endsWith(".csv")) out += f.getPath.toString
      }
      out.toSeq.sorted
    }
  }

  /** Scheme-insensitive path normalization (`file:/x` and `/x` compare equal). */
  def stripScheme(p: String): String = new Path(p).toUri.getPath

  /** S6: lifecycle move — copy+delete preserving the path relative to
    * `srcRoot`, idempotent when the source is already gone
    * (reference: validate_task.py:64-120, transform_task.py:55-88).
    */
  def moveFile(spark: SparkSession, srcRoot: String, destRoot: String, file: String): Boolean = {
    val src = new Path(file)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(src)) false // already moved — idempotent no-op
    else {
      val rel = stripScheme(file).stripPrefix(stripScheme(srcRoot).stripSuffix("/") + "/")
      val dest = new Path(destRoot.stripSuffix("/") + "/" + rel)
      fs.mkdirs(dest.getParent)
      // a re-arrived file replaces its previous lifecycle copy (the
      // reference's S3 copy overwrites); FileContext's OVERWRITE rename does
      // this without a delete-then-rename window that could lose the old
      // copy if the rename fails
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        src.toUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(src, dest, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      true
    }
  }

  /** Writes a small text file (rejection manifests, logs) via the FS API. */
  def writeTextFile(spark: SparkSession, path: String, content: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }
}
