package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency: every registered op must be uniquely named
  * (duplicates would silently shadow in the Map) and must at least ANALYZE
  * against the fixture tables — a broken op would otherwise just vanish from
  * the verify gate with a stderr line nobody reads.
  */
class RegistrySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("op names are unique (no silent shadowing in the queries map)") {
    val names = SparkEntry.allOps.map(_.name)
    val dupes = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate op names: ${dupes.mkString(", ")}")
  }

  test("every oracle belongs to a registered query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracles without queries: ${orphans.mkString(", ")}")
  }

  test("every op analyzes against the fixtures (schema resolution only)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, TestSession.sf).schema; None }
      catch { case e: Exception => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("flagship entry analyzes and targets the smoke fixture") {
    assert(SparkEntry.entry(spark).schema.fieldNames.contains("daily_revenue"))
  }

  test("every rows-only op states a non-empty bit-match blocker") {
    val bad = SparkEntry.allOps
      .filter(op => op.oracle.isEmpty && op.blocker.forall(_.trim.isEmpty))
      .map(_.name)
    assert(bad.isEmpty,
      s"rows-only ops without a stated oracle blocker: ${bad.mkString(", ")}")
    // and the list itself is pinned: a new rows-only op is a deliberate act
    val rowsOnly = SparkEntry.allOps.filter(_.oracle.isEmpty).map(_.name).toSet
    // r11: empty — the last two rows-only ops graduated (media_features via
    // grid-quantized entropy + list_reduce checksum replay; heavy hitters
    // via the Misra-Gries → Count-Min conversion).
    val expected = Set.empty[String]
    assert(rowsOnly == expected,
      s"rows-only set changed: +${rowsOnly -- expected} -${expected -- rowsOnly}")
  }
}
