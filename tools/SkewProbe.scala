// Dev tool: skew-join demonstration on the zipf lineitem fixture
// (tools/make_sf1.py <dir> <factor> zipf [s]). cp into src/main/scala/graft/
// to use, like Explain/TimeQ:
//   cp tools/SkewProbe.scala src/main/scala/graft/
//   SPARK_GRAFT_SF_DIR=/tmp/sf2skew SPARK_GRAFT_AQE=true  sbt "runMain graft.SkewProbe"
//   SPARK_GRAFT_SF_DIR=/tmp/sf2skew SPARK_GRAFT_AQE=false sbt "runMain graft.SkewProbe"
//   rm src/main/scala/graft/SkewProbe.scala
// Broadcast is DISABLED: at this fixture size Spark would broadcast the
// few-M-row orders side and no shuffle skew could exist — but the 100 TB
// deployment this engine targets has dims past any broadcast threshold,
// and that shuffled-join shape is what the skew story is about.
// AQE skew thresholds are scaled to the fixture: the defaults
// (skewedPartitionThresholdInBytes=256m, advisoryPartitionSizeInBytes=64m)
// are cluster-sized — a local hot partition of ~100 MB never trips them,
// so OptimizeSkewedJoin silently stays idle (measured r12: 0 skewed plan
// nodes at defaults). 8m/4m keeps the same factor-5 relative test at
// fixture scale; a production deployment keeps the defaults.
// Reported per case: wall, the straggler shape of the heaviest STAGE
// (max task vs p50 task — an AQE-off skewed join shows max >> p50), and
// how many plan nodes carry the "skewed" marker after execution.
package graft

import scala.collection.mutable.{ArrayBuffer, HashMap}

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

object SkewProbe {
  @volatile private var lastPlan: String = ""

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf2skew")
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true").toBoolean
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the FINAL adaptive plan only exists on the query execution that ran —
    // and df.count() runs its own (column-pruned!) execution whose key-only
    // shuffle compresses under any realistic skew threshold. Evidence must
    // come from the execution that carried the payload: a noop write of the
    // full row, with the executed plan captured at completion.
    spark.listenerManager.register(new QueryExecutionListener {
      def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        lastPlan = qe.executedPlan.toString
      def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = {}
    })
    val byStage = new HashMap[Int, ArrayBuffer[Long]]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        byStage.synchronized {
          byStage.getOrElseUpdate(te.stageId, ArrayBuffer.empty) +=
            te.taskInfo.duration
        }
    })
    def li = spark.read.parquet(s"$sfDir/lineitem.parquet").select(
      col("l_orderkey").as("order_id"), col("l_linenumber").as("line_no"),
      col("l_quantity").as("quantity"))
    def dim = spark.read.parquet(s"$sfDir/orders.parquet").select(
      col("o_orderkey").as("order_id"), col("o_orderpriority").as("priority"))
    li.count(); dim.count() // warm page cache + JVM, untimed
    def run(label: String)(mk: => DataFrame): Unit = {
      byStage.synchronized { byStage.clear() }
      val df = mk
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.ListenerBridge.flush(spark.sparkContext)
      // the stage with the slowest single task is where a straggler lives
      val (worst, stats) = byStage.synchronized {
        val (sid, ds) = byStage.maxBy(_._2.max)
        val sorted = ds.sorted
        (sid, (ds.size, sorted(ds.size / 2), ds.max))
      }
      val (nTasks, p50, mx) = stats
      val skewSplit = lastPlan.linesIterator.count(_.contains("skewed"))
      println(f"$label%-24s aqe=$aqe%-5s wall=$wall%6.2f s " +
        f"straggler-stage=$worst tasks=$nTasks p50=${p50}ms max=${mx}ms " +
        f"(x${mx.toDouble / math.max(1L, p50)}%.1f) skewed-plan-nodes=$skewSplit")
    }
    run("plain_left_join")(li.join(dim, Seq("order_id"), "left"))
    run("skew_split_join_b32") {
      val hot = operators.Relational.hotKeys(li, "order_id")
      println(s"  hot keys (sampled, bounded): $hot")
      operators.Relational.skewSplitLeftJoin(li, dim, "order_id", hot, buckets = 32)
    }
    run("salted_left_join_b8")(
      operators.Relational.saltedLeftJoin(li, dim, "order_id", buckets = 8))
    run("salted_left_join_b32")(
      operators.Relational.saltedLeftJoin(li, dim, "order_id", buckets = 32))
    spark.stop()
  }
}
