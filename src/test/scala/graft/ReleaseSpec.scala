package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The inter-query release must drop finished queries' checkpoint blocks
  * (the r8 sf10 OOM: clearCache leaves RDD storage untouched) while leaving
  * deliberately retained shared frames resident AND usable.
  */
class ReleaseSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("interQuery drops non-retained checkpoint blocks, keeps retained ones usable") {
    import spark.implicits._
    val keep = (1 to 100).toDF("x").withColumn("y", col("x") * 2).localCheckpoint()
    val drop = (1 to 100).toDF("x").withColumn("y", col("x") * 3).localCheckpoint()
    // track OUR frames' ids only — the session is shared with other suites,
    // whose blocks may come and go while this test runs
    val keepIds = Release.ckptIdsForTest(keep)
    val dropIds = Release.ckptIdsForTest(drop)
    assert(keepIds.nonEmpty && dropIds.nonEmpty)
    def live = spark.sparkContext.getPersistentRDDs.keySet

    Release.retain(keep)
    Release.interQuery(spark)

    // the dropped frame's blocks are gone; the retained frame's remain
    assert(dropIds.forall(!live.contains(_)), "non-retained blocks must drop")
    assert(keepIds.forall(live.contains), "retained blocks must survive")
    assert(keep.count() == 100, "retained frame must stay fully usable")

    // unretain → the next release reclaims it too
    Release.unretain(keep)
    Release.interQuery(spark)
    assert(keepIds.forall(!live.contains(_)))
  }

  test("the capped-shingle memo survives an inter-query release end to end") {
    val docs = graft.sources.Tables.documents(spark, TestSession.sf)
    val (hs, _) = graft.operators.Dedup.cappedShingleShared(docs)
    val n = hs.count()
    assert(n > 0)
    Release.interQuery(spark)
    // same memo entry, blocks still resident — the shared subtree is not
    // silently recomputed (or worse, broken) by the release
    val (hs2, _) = graft.operators.Dedup.cappedShingleShared(docs)
    assert(hs2.count() == n)
  }

  test("the curation-manifest memo is shared, retained across releases, and keyed by plan identity") {
    val docs = graft.sources.Tables.documents(spark, TestSession.sf)
    val m1 = graft.operators.TextOps.curationManifestShared(docs)
    val ids1 = Release.ckptIdsForTest(m1)
    assert(ids1.nonEmpty, "the shared manifest must be checkpointed")
    // the funnel consumes the SAME checkpointed frame — no eleven-gate rebuild
    val funnelLeafIds = Release.ckptIdsForTest(
      graft.operators.TextOps.curationFunnel(docs))
    assert(funnelLeafIds.toSet == ids1.toSet,
      s"funnel must read the shared manifest checkpoint: $funnelLeafIds vs $ids1")
    Release.interQuery(spark)
    val m2 = graft.operators.TextOps.curationManifestShared(docs)
    assert(Release.ckptIdsForTest(m2).toSet == ids1.toSet,
      "the memo entry must survive an inter-query release")
    // a semantically different input plan misses the memo (sameResult check)
    val m3 = graft.operators.TextOps.curationManifestShared(docs.filter(col("doc_id") >= 0))
    assert(Release.ckptIdsForTest(m3).toSet != ids1.toSet,
      "a different input plan must rebuild, not serve the old corpus")
  }
}
