package graft

import org.apache.spark.sql.DataFrame

/** Size-based partition counts for the explicit corpus-scale repartitions
  * the operators issue (shingle/encode fan-out, iterative-loop edge tables,
  * global-rank range partitioning).
  *
  * Why this exists: `defaultParallelism` is a CLUSTER constant, not a DATA
  * constant. Calibrated at local[32] it silently pins a 60 M-edge
  * repartition to 32 tasks at sf10 (PERF.md r7: the stated cause of two
  * super-linear scale ratios), and on a 1000-executor cluster it would do
  * the opposite — far more partitions than a small frame warrants. The
  * policy here sizes the GROW direction from the plan's byte estimate;
  * the shrink direction stays AQE's job (post-shuffle coalescing).
  *
  * Caller contract: pass a SCAN-ROOTED (or narrow-on-scan) frame, whose
  * size estimate is the actual file bytes. Join- and explode-rooted frames
  * can carry garbage multiplied estimates — size those from their scan
  * inputs instead (see [[graft.operators.Graph]]'s loop edges).
  */
object Scale {

  /** Target input bytes per task for CPU-heavy passes: small enough that a
    * task's input plus its expanded intermediates (shingle arrays, PQ
    * distance tables) sit comfortably in executor memory, large enough
    * that per-task scheduling overhead stays invisible. Half of Spark's
    * 128 MB `files.maxPartitionBytes` default because these passes EXPAND
    * their input (a 64-token document becomes ~62 shingle hashes).
    */
  val targetBytesPerPartition: Long = 64L << 20

  /** Backstop cap for a repartition fan-out — far above any sane single-job
    * width, it only exists so a wrong size estimate cannot schedule
    * millions of tasks.
    */
  val maxPartitions: Int = 1 << 14

  /** Tighter cap for [[graft.operators.Analytics.withGlobalRowNumber]]-style
    * range rankings: their per-partition offsets fold back into the plan as
    * a literal map whose lookup is linear in the partition count, so the
    * fan-out must stay a bounded driver artifact. 1024 ranges × the byte
    * target is ~64 GB per ranked pass — rank inputs are skinny projections
    * (key + sort columns), so this bounds corpora far past the bench
    * scales while keeping the literal map trivial.
    */
  val maxRangePartitions: Int = 1 << 10

  /** Partition count for an explicit repartition of `df`: the optimized
    * plan's byte estimate over [[targetBytesPerPartition]], clamped to
    * [defaultParallelism, cap]. At bench scale this floors to
    * defaultParallelism (existing plans unchanged); past ~2 GB of input it
    * grows with the data.
    */
  def partitionsFor(df: DataFrame, cap: Int = maxPartitions): Int = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val byBytes =
      if (bytes.isValidLong) bytes.toLong / targetBytesPerPartition + 1
      else cap.toLong
    val floor = df.sparkSession.sparkContext.defaultParallelism.toLong
    math.min(cap.toLong, math.max(floor, byBytes)).toInt
  }
}
