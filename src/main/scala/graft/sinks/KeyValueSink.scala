package graft.sinks

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Key-value upsert sinks (reference: transform_task.py:277-346 collects the
  * whole KPI result to the driver with toPandas, then boto3 batch-writes to
  * DynamoDB — a single-node bottleneck).
  *
  * Two scale-correct replacements, both preserving the reference's idempotent
  * put-item-upsert semantics (recomputing a date overwrites it, SURVEY §2.2.5):
  *
  *  - [[upsertPartitioned]]: KPI table as date-partitioned parquet with
  *    DYNAMIC partition overwrite — only the recomputed dates' partitions are
  *    replaced; other history is untouched. The idiomatic Spark "upsert by
  *    partition". This is the durable sink.
  *  - [[foreachPartitionWrite]]: executor-side batched writes to an external
  *    KV store through a pluggable client factory — the DynamoDB-shaped
  *    boundary without any driver collect. Batches of 25 mirror DynamoDB's
  *    BatchWriteItem limit.
  */
object KeyValueSink {

  /** Dynamic-partition-overwrite parquet upsert keyed by `partitionCol`. */
  def upsertPartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)

  /** A minimal KV client boundary (DynamoDB table shape: string PK → item). */
  trait KvClient extends Serializable {
    def putBatch(items: Seq[(String, Map[String, String])]): Unit
    def close(): Unit = ()
  }

  /** Distributed write: each partition opens its own client and writes in
    * batches of `batchSize` — no data ever crosses the driver.
    */
  def foreachPartitionWrite(df: DataFrame, keyCols: Seq[String],
      clientFactory: () => KvClient, batchSize: Int = 25): Unit = {
    val schema = df.schema.fieldNames
    df.foreachPartition { rows: Iterator[Row] =>
      val client = clientFactory()
      try {
        rows.grouped(batchSize).foreach { batch =>
          client.putBatch(batch.map { r =>
            val key = keyCols.map(c => String.valueOf(r.getAs[Any](c))).mkString("|")
            key -> schema.map(f => f -> String.valueOf(r.getAs[Any](f))).toMap
          })
        }
      } finally client.close()
    }
  }

  /** In-JVM KV store — the test double for the external-store boundary
    * (works in local mode because executors share the driver JVM).
    */
  object InMemoryStore {
    val tables = new ConcurrentHashMap[String, ConcurrentHashMap[String, Map[String, String]]]()

    def table(name: String): ConcurrentHashMap[String, Map[String, String]] =
      tables.computeIfAbsent(name, _ => new ConcurrentHashMap())

    def client(name: String): KvClient = new KvClient {
      def putBatch(items: Seq[(String, Map[String, String])]): Unit = {
        val t = table(name)
        items.foreach { case (k, v) => t.put(k, v) }
      }
    }

    def snapshot(name: String): Map[String, Map[String, String]] =
      table(name).asScala.toMap

    def clear(name: String): Unit = table(name).clear()
  }

  /** Reads back a partitioned KPI table written by [[upsertPartitioned]]. */
  def readTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
