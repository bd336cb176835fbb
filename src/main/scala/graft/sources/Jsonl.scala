package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** JSON-lines ingestion surface — the interchange format large text-corpus
  * drops actually arrive in (one JSON object per line, splittable, appendable).
  * The reference ingests only CSV (transform_task.py:121-136); a
  * training-data engine needs the JSONL path as a first-class source.
  *
  * Same design stance as [[Csv]]: an EXPLICIT `StructType` at every scan —
  * schema inference would be a full extra pass over 100 TB before the first
  * real job — and multi-path reads that union parts at cluster width.
  * Malformed lines are kept, not dropped: PERMISSIVE mode routes them to a
  * `_corrupt_record` column so a batch can apply the whole-batch
  * accept/reject protocol ([[graft.pipeline.Validator]]) to wire-format
  * damage the same way it does to semantic damage.
  */
object Jsonl {

  val corruptCol = "_corrupt_record"

  /** documents(doc_id, text, lang, source, n_chars) — the corpus table. */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Multi-path JSONL scan with explicit schema; malformed lines surface as
    * rows where every data column is null and `_corrupt_record` holds the
    * raw line.
    */
  def read(spark: SparkSession, schema: StructType, paths: Seq[String]): DataFrame =
    spark.read
      .schema(schema.add(StructField(corruptCol, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(paths: _*)

  /** Strict scan for trusted data (e.g. re-reading our own exports): no
    * corrupt-record column, malformed lines dropped at the parser. Unlike
    * [[clean]] this stays legal under ANY projection — an aggregate-only
    * query over a [[read]]+[[clean]] chain prunes every data column and
    * leaves the corrupt-column filter as the scan's sole reference, which
    * Spark rejects (QUERY_ONLY_CORRUPT_RECORD_COLUMN).
    */
  def readStrict(spark: SparkSession, schema: StructType, paths: Seq[String]): DataFrame =
    spark.read.schema(schema).option("mode", "DROPMALFORMED").json(paths: _*)

  /** The clean rows of a PERMISSIVE read (data columns only). */
  def clean(df: DataFrame): DataFrame =
    df.filter(col(corruptCol).isNull).drop(corruptCol)

  /** Partition a PERMISSIVE [[read]] into (clean rows, corrupt raw lines) —
    * the validation-path pair (forward the clean rows, manifest the bad
    * lines, [[Csv.writeTextFile]] shape). Both views share ONE persisted
    * parse: Spark refuses a scan whose only referenced column is the corrupt
    * record (the pruned parse would have nothing to fail on), and the two
    * consumers would otherwise parse the batch twice. The CALLER owns the
    * lifecycle: `df.unpersist()` after both sides are consumed — nothing is
    * pinned invisibly across batches.
    */
  def split(df: DataFrame): (DataFrame, DataFrame) = {
    val parsed = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (clean(parsed), parsed.filter(col(corruptCol).isNotNull).select(col(corruptCol)))
  }

  /** JSONL export (round-trips [[read]]; used by the interchange op). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
