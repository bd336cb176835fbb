package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Op
import graft.functions.GraftExpressions
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (north-star extension; SURVEY.md §7.3 step 8).
  *
  * Two strategies:
  *  - [[bruteForceTopK]]: exact top-k for a bounded query set — a broadcast of
  *    the (small) query side against the full corpus, cost O(|Q|·N), linear in
  *    the corpus. The correctness baseline.
  *  - [[lshTopK]]: sign-projection LSH bucketing ([[Dedup.lshBucket]]) —
  *    queries only score vectors in their own bucket, cost O(|Q|·N/2^bits).
  *    The 100 TB path; recall < 1 by construction and measured against the
  *    brute-force baseline in tests.
  *
  * Scoring is the quantized cosine ([[graft.functions.QuantizedDot]] — one
  * codegen'd integer dot per scored pair, norms precomputed per vector),
  * which is bit-identical on every engine, so both ops are fully
  * DuckDB-oracle-checked; ties broken by vec_id.
  */
object Similarity {

  val defaultK = 10

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Exact cosine top-k neighbors for each query vector (queries = rows
    * matching `queryPred`, e.g. `vec_id < 5`). The query side is broadcast —
    * the corpus never shuffles.
    */
  def bruteForceTopK(embs: DataFrame, queryPred: Column, k: Int = defaultK): DataFrame = {
    GraftExpressions.register(embs.sparkSession)
    val corpus = embs.select(col("vec_id"), col("embedding"),
      GraftExpressions.qdot(col("embedding"), col("embedding")).as("n2"))
    val queries = corpus.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("n2").as("q_n2"))
    val scored = corpus.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Dedup.cosQ(col("q_emb"), col("embedding"), col("q_n2"), col("n2")).as("cos"))
    rankTopK(scored, k)
  }

  /** LSH-bucketed top-k: as [[bruteForceTopK]] but candidates restricted to
    * the query's sign-projection bucket.
    */
  def lshTopK(embs: DataFrame, queryPred: Column, k: Int = defaultK): DataFrame = {
    val bucketed = Dedup.bucketedWithNorm(embs)
    val queries = bucketed.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("bucket").as("q_bucket"), col("n2").as("q_n2"))
    val scored = bucketed.join(broadcast(queries),
        col("bucket") === col("q_bucket") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Dedup.cosQ(col("q_emb"), col("embedding"), col("q_n2"), col("n2")).as("cos"))
    rankTopK(scored, k)
  }

  // --------------------------------------------------------------------------
  // Registered ops + DuckDB oracles
  // --------------------------------------------------------------------------

  def ops: Seq[Op] = Seq(
    Op.sql("sim_topk_bruteforce",
      s"""WITH ev AS (
         |  SELECT vec_id, embedding, ${GraftExpressions.qdotSql("embedding", "embedding")} AS n2
         |  FROM embeddings),
         |scored AS (
         |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id, ${Dedup.cosQSql("q", "v")} AS cos
         |  FROM ev q JOIN ev v ON v.vec_id <> q.vec_id
         |  WHERE q.vec_id < 5),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cos, CAST(rank AS INTEGER) AS rank
         |FROM ranked WHERE rank <= $defaultK""".stripMargin) { (s, d) =>
      bruteForceTopK(Tables.embeddings(s, d), col("vec_id") < 5)
    },

    Op.sql("sim_topk_lsh",
      s"""WITH ${Dedup.bucketedWithNormSql},
         |scored AS (
         |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id, ${Dedup.cosQSql("q", "v")} AS cos
         |  FROM bv q JOIN bv v ON v.bucket = q.bucket AND v.vec_id <> q.vec_id
         |  WHERE q.vec_id < 20),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cos, CAST(rank AS INTEGER) AS rank
         |FROM ranked WHERE rank <= $defaultK""".stripMargin) { (s, d) =>
      lshTopK(Tables.embeddings(s, d), col("vec_id") < 20)
    },
  )
}
