package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every module's registered [[Op]]s into the flat maps the
  * driver consumes; each op carries its own DuckDB oracle when expressible.
  */
object SparkEntry {

  /** Every registered operation, name-deduplicated (later modules win). */
  def allOps: Seq[Op] =
    Kpi.ops ++ Quality.ops ++ Relational.ops ++ Analytics.ops ++
      TextOps.ops ++ Html.ops ++ Dedup.ops ++ Similarity.ops ++ EventOps.ops ++ Temporal.ops ++
      Warehouse.ops ++ Graph.ops ++ Search.ops ++ Tokenizer.ops ++
      graft.multimodal.Multimodal.ops ++ graft.multimodal.MediaTransforms.ops

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Kpi.categoryKpis(Kpi.consolidatedOf(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allOps.map(op => op.name -> op.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allOps.flatMap(op => op.oracle.map(op.name -> _)).toMap
}
