package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Bucketed-table support: pre-shuffling fact tables into N buckets on the
  * join key at WRITE time so every subsequent join/aggregation on that key
  * runs shuffle-free (Spark reads matching buckets pairwise).
  *
  * At 100 TB this converts the recurring items⋈orders shuffle — the single
  * biggest cost in the KPI pipeline — into a one-time cost paid at ingest:
  * the nightly batch then joins co-located buckets with zero exchange.
  */
object Bucketing {

  /** Writes `df` as a bucketed (and per-bucket sorted) managed table. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, key: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** True if the physical plan of `df` contains any shuffle exchange.
    * AQE wraps plans in a LEAF `AdaptiveSparkPlanExec` — collecting on the
    * wrapper alone would never see a shuffle, so unwrap it first.
    */
  def hasShuffle(df: DataFrame): Boolean = {
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    unwrap(df.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeLike => e }.nonEmpty
  }
}
