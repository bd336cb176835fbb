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

  test("unknown-size plans (default-size sentinel stats) fall back to the floor, never the cap") {
    // an RDD-rooted LogicalRDD carries no size signal — its stats degrade
    // to spark.sql.defaultSizeInBytes (Long.MaxValue); scheduling the 2^14
    // cap off that sentinel would be a pathological repartition (ADVICE r8)
    val rdd = spark.sparkContext.parallelize(1 to 1000)
      .map(i => org.apache.spark.sql.Row(i))
    val df = spark.createDataFrame(rdd,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.IntegerType))))
    assert(df.queryExecution.optimizedPlan.stats.sizeInBytes >=
      BigInt(spark.sessionState.conf.defaultSizeInBytes),
      "precondition: the RDD root must carry sentinel stats")
    assert(Scale.partitionsFor(df) == spark.sparkContext.defaultParallelism,
      s"sentinel stats must floor, got ${Scale.partitionsFor(df)}")
    // checkpointed frames (however their stats surface) must also never cap
    val ck = (1 to 1000).toDF("x").localCheckpoint()
    assert(Scale.partitionsFor(ck) == spark.sparkContext.defaultParallelism)
    ck.unpersist(blocking = true)
  }

  test("offsetArray: dense over pid gaps, exclusive running sums, O(1) plan constant") {
    import org.apache.spark.sql.functions.{col, element_at}
    // pid 1 absent (an empty range partition) must carry the offset forward
    val off = Scale.offsetArray(Map(0 -> 5L, 2 -> 7L, 3 -> 2L))
    val got = Seq(0, 1, 2, 3).toDF("pid")
      .select(element_at(off, col("pid") + 1)).collect().map(_.getLong(0))
    assert(got.toSeq == Seq(0L, 5L, 5L, 12L))
    // at the maxRangePartitions cap the fold must stay ONE constant: the
    // old per-entry map(lit, lit, …) fold crossed janino's 64 KB method
    // limit exactly here (the r8 PQ-encode failure class) — this evaluates
    // under codegen or the test fails
    val wide = Scale.offsetArray((0 until Scale.maxRangePartitions).map(p => p -> 3L).toMap)
    val last = Seq(Scale.maxRangePartitions - 1).toDF("pid")
      .select(element_at(wide, col("pid") + 1)).head().getLong(0)
    assert(last == 3L * (Scale.maxRangePartitions - 1))
  }

  test("offsetArrayByKey: offsets cumulate independently per source") {
    import org.apache.spark.sql.functions.{col, element_at}
    val off = Scale.offsetArrayByKey(Map(
      (0, "a") -> 10L, (2, "a") -> 4L, (0, "b") -> 1L, (1, "b") -> 2L))
    val got = Seq((0, "a"), (1, "a"), (2, "a"), (0, "b"), (1, "b"), (2, "b"))
      .toDF("pid", "src")
      .select(element_at(element_at(off, col("src")), col("pid") + 1))
      .collect().map(_.getLong(0))
    assert(got.toSeq == Seq(0L, 10L, 10L, 0L, 1L, 3L))
    // unknown source → null, matching the old concat-keyed map fold
    assert(Seq((0, "zz")).toDF("pid", "src")
      .select(element_at(element_at(off, col("src")), col("pid") + 1))
      .head().isNullAt(0))
  }
}
