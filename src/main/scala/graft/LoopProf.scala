package graft

/** Per-round timing hook for the fixed-round iterative ops (PageRank, label
  * propagation, the PQ/k-means Lloyd loops). Each round of those loops ends
  * in an EAGER materialization (localCheckpoint / codebook collect), so
  * wall/CPU measured around the round body is the round's true cost — the
  * term-by-term evidence PERF.md's scale-ratio attributions need (a flat
  * per-round series proves a super-linear total comes from one-time setup;
  * a growing one localizes the bug to the loop).
  *
  * Disabled (the default) it is a single volatile read per ROUND — nothing
  * per row, nothing in any query plan. Enable with env
  * `SPARK_GRAFT_LOOPPROF=1`; rounds print one line each to stderr and
  * accumulate in [[records]] for programmatic reads.
  */
object LoopProf {
  val enabled: Boolean = sys.env.get("SPARK_GRAFT_LOOPPROF").contains("1")

  /** (op, round, wall ms, process CPU ms). */
  val records = new scala.collection.mutable.ArrayBuffer[(String, Int, Long, Long)]()

  private def cpuMs(): Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime / 1000000L
      case _ => -1L
    }

  def timed[A](op: String, round: Int)(body: => A): A =
    if (!enabled) body
    else {
      val (w0, c0) = (System.nanoTime(), cpuMs())
      val r = body
      val (w1, c1) = (System.nanoTime(), cpuMs())
      val rec = (op, round, (w1 - w0) / 1000000L, c1 - c0)
      records.synchronized { records += rec }
      System.err.println(s"[loopprof] ${rec._1} round=${rec._2} wall_ms=${rec._3} cpu_ms=${rec._4}")
      r
    }
}
