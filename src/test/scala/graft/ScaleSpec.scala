package graft

import org.scalatest.funsuite.AnyFunSuite

class ScaleSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("small frames floor to defaultParallelism; counts grow with bytes and clamp at caps") {
    val tiny = Seq((1L, "x")).toDF("id", "s")
    assert(Scale.partitionsFor(tiny) == spark.sparkContext.defaultParallelism)

    // fixture scans at bench scale must also floor — the policy cannot
    // change any existing local plan
    val docs = graft.sources.Tables.documents(spark, TestSession.sf)
    assert(Scale.partitionsFor(docs) == spark.sparkContext.defaultParallelism)

    // the grow direction: the arithmetic, checked directly against the
    // documented formula on synthetic byte sizes
    def expect(bytes: Long, cap: Int): Long = {
      val byBytes = bytes / Scale.targetBytesPerPartition + 1
      math.min(cap.toLong,
        math.max(spark.sparkContext.defaultParallelism.toLong, byBytes))
    }
    assert(expect(100L << 30, Scale.maxPartitions) == (100L << 30) / (64L << 20) + 1,
      "100 GB sizes past the floor, under the cap")
    assert(expect(100L << 40, Scale.maxPartitions) == Scale.maxPartitions.toLong,
      "100 TB clamps at the backstop")
    assert(expect(100L << 30, Scale.maxRangePartitions) == Scale.maxRangePartitions.toLong,
      "range rankings clamp at the bounded-driver-artifact cap")
  }
}
