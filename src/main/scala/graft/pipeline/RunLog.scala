package graft.pipeline

import java.time.Instant
import java.time.format.DateTimeFormatter
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession

import graft.sources.Csv

/** Per-run task log artifact (reference: ecs/validation/validate_task.py:45-61,
  * ecs/transformation/transform_task.py:38-52): timestamped `[LEVEL]` lines
  * collected in memory, echoed to the console stream, and flushed as ONE
  * object to `logs/{task}/{task}_{ts}.log` under the pipeline root when the
  * run ends — the artifact an operator opens to debug a batch after the
  * container is gone.
  *
  * Differences from the reference, deliberate: the echo goes to stderr (the
  * container-log channel; stdout stays clean for machine-readable output),
  * and the file name carries milliseconds plus a process-unique counter so
  * two runs in the same second can't clobber each other's log (the
  * reference's second-granularity names can).
  */
final class RunLog(spark: SparkSession, root: String, task: String) {
  private val lines = scala.collection.mutable.ArrayBuffer[String]()

  def info(msg: String): Unit = log("INFO", msg)
  def warn(msg: String): Unit = log("WARN", msg)
  def error(msg: String): Unit = log("ERROR", msg)

  private def log(level: String, msg: String): Unit = synchronized {
    val line = s"${Instant.now()} [$level] $msg"
    System.err.println(line)
    lines += line
  }

  /** Write the collected lines as one log object; returns its path. */
  def flush(): String = synchronized {
    val ts = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH-mm-ss-SSS")
      .format(java.time.LocalDateTime.ofInstant(Instant.now(), java.time.ZoneOffset.UTC))
    // pid + process-local counter: unique even across concurrent drivers
    val pid = ProcessHandle.current().pid()
    val path = s"$root/logs/$task/${task}_${ts}_${pid}_${RunLog.seq.incrementAndGet()}.log"
    Csv.writeTextFile(spark, path, lines.mkString("\n"))
    path
  }
}

object RunLog {
  private val seq = new AtomicLong()
}
