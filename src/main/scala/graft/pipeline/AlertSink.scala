package graft.pipeline

import java.time.Instant
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession

import graft.Json
import graft.sources.Csv

/** Terminal-failure alert channel (reference: the Step Function's catch-all
  * publishes to SNS before failing the execution,
  * infra/step-function-definition.json:86-98,169-181). [[Pipeline.run]]
  * invokes the sink beside the RunLog record when a batch dies with an
  * exception, so "failed loudly somewhere a human looks" is distinct from a
  * log line. Pluggable like [[graft.sinks.KeyValueSink.KvClient]]: a
  * deployment routes to a pager / SNS / webhook by passing its own sink.
  */
trait AlertSink {
  def alert(spark: SparkSession, root: String, batchDate: String, error: Throwable): Unit
}

object AlertSink {

  private val seq = new AtomicLong()

  /** Default sink: one JSON alert object per failure under `$root/alerts/` —
    * the zero-infrastructure analog of an SNS topic a human (or a poller)
    * watches. File name carries pid + a process counter so concurrent
    * drivers can't clobber each other's alert.
    */
  val file: AlertSink = new AlertSink {
    def alert(spark: SparkSession, root: String, batchDate: String, error: Throwable): Unit = {
      val pid = ProcessHandle.current().pid()
      val path =
        s"$root/alerts/pipeline_${batchDate}_${pid}_${seq.incrementAndGet()}.json"
      Csv.writeTextFile(spark, path,
        s"""{"batch_date": ${Json.quote(batchDate)},
           |"error": ${Json.quote(s"${error.getClass.getSimpleName}: ${error.getMessage}")},
           |"timestamp": "${Instant.now()}"}""".stripMargin)
    }
  }

  /** Swallow-nothing-but-log sink for callers that opt out of artifacts. */
  val none: AlertSink = new AlertSink {
    def alert(spark: SparkSession, root: String, batchDate: String, error: Throwable): Unit = ()
  }
}
