package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql.extensions=graft.functions.GraftSparkExtensions` path — how
  * an external deployment gets the graft kernels as permanent SQL functions
  * without touching graft's Scala API. Exercises the injectFunction hook end
  * to end: a session built WITH the extension resolves every registered name
  * from plain SQL (no [[graft.functions.GraftExpressions.register]] call).
  */
class ExtensionsSpec extends AnyFunSuite {

  /** Build an extension-carrying session on the shared SparkContext, run f,
    * restore the shared test session as active/default.
    */
  private def withExtSession[T](f: SparkSession => T): T = {
    val shared = TestSession.spark // ensure the context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // `spark.sql.extensions=graft.functions.GraftSparkExtensions` is the
      // config-file spelling; it is read from the SparkContext's static conf
      // at context creation, so under the shared test context we attach the
      // same class through the builder API — identical injection path.
      val ext = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.functions.GraftSparkExtensions()(_))
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      f(ext)
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }

  test("extension-injected functions resolve from plain SQL and compute correctly") {
    withExtSession { ext =>
      // one value-check per injected function — same fixtures as
      // GraftExpressionsSpec's model tests, via SQL text only
      val r = ext.sql(
        """SELECT
          |  graft_sorted_intersect_count(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS ic,
          |  graft_qdot(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS qd,
          |  graft_simhash32(array(7L, 7L, 7L)) AS sh,
          |  graft_minhash(array(9L), array(32L), 2) AS mh,
          |  graft_sorted_run_stats(array('a', 'a', 'b')) AS rs
          |""".stripMargin).head()
      assert(r.getInt(0) == 2)
      // floor(1*2^20) * floor(2*2^20) = 2^41
      assert(r.getLong(1) == (1L << 41))
      assert(r.getLong(2) == 7L) // majority of {7,7,7} sets bits 0..2
      // h_s = (9 + s*(32>>4)) & mask -> s=0: 9, s=1: 11
      assert(r.getSeq[Long](3) == Seq(9L, 11L))
      assert(r.getSeq[Long](4) == Seq(2L, 2L))
    }
  }

  test("a session WITHOUT the extension does not see the functions (injection is the source)") {
    val shared = TestSession.spark
    val fresh = shared.newSession() // no runtime register() call, no extension
    val err = intercept[Exception] {
      fresh.sql("SELECT graft_qdot(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT)))").head()
    }
    assert(err.getMessage.toLowerCase.contains("graft_qdot"))
  }
}
