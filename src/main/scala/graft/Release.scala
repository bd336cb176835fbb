package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Inter-query memory release for the Bench / Verify harnesses.
  *
  * Why this exists (r8 find, sf10): `spark.catalog.clearCache()` empties the
  * SQL CacheManager (every `Dataset.persist`) but NOT block-manager RDD
  * storage, and `localCheckpoint` frames live exactly there. The iterative
  * ops checkpoint per round (edges, graph state, union-find rounds), so a
  * multi-query heavy run ACCUMULATES every finished query's checkpoint
  * blocks in storage memory until the ContextCleaner's weak references
  * happen to be collected — at sf10 that turned the six-query calibration
  * batch into an execution-memory OOM in warm-up (triangles, stage with
  * 32 spilling tasks got 0 bytes) followed by a Java-heap OOM that killed
  * the SparkContext. Queries that each pass SOLO failed only in sequence —
  * the classic leak signature.
  *
  * [[interQuery]] therefore unpersists every persistent RDD after each
  * query, EXCEPT ids ops have [[retain]]ed for deliberate cross-query
  * sharing (the capped-shingle trio memo — its checkpoint blocks are the
  * lineage; dropping them would break, not slow, the sharing ops).
  * Unpersist is blocking so the next query's memory headroom is real, not
  * eventual.
  */
object Release {

  private val retained = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** Checkpoint-RDD ids at the leaves of `df`'s plan. */
  private def ckptIds(df: DataFrame): Seq[Int] =
    df.queryExecution.optimizedPlan.collectLeaves().collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }

  /** Test hook: the ids [[interQuery]] decides over for `df`. */
  private[graft] def ckptIdsForTest(df: DataFrame): Seq[Int] = ckptIds(df)

  /** Mark checkpointed frames as deliberately shared across queries —
    * [[interQuery]] will leave their blocks resident.
    */
  def retain(dfs: DataFrame*): Unit =
    dfs.foreach(df => ckptIds(df).foreach(retained.add(_)))

  /** Drop the cross-query mark; the blocks go at the next [[interQuery]]. */
  def unretain(dfs: DataFrame*): Unit =
    dfs.foreach(df => ckptIds(df).foreach(id => retained.remove(id)))

  /** The inter-query hook: SQL cache + all non-retained RDD blocks. */
  def interQuery(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!retained.contains(id)) rdd.unpersist(blocking = true)
    }
  }
}
