// Dev tool: times selected queries. cp into src/main/scala/graft/ to use, like Explain.
package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    }
    val oi = graft.sources.Tables.orderItems(spark, sfDir)
    import graft.operators.Analytics._
    val baskets = oi.groupBy(col("order_id"))
      .agg(array_sort(collect_set(col("product_id"))).as("items"))
      .filter(size(col("items")) <= basketMaxItems)
    time("baskets agg")(baskets.count())
    val pnull = lit(null).cast(oi.schema("product_id").dataType)
    val counts = baskets
      .select(explode(concat(
        array(struct(pnull.as("p1"), pnull.as("p2"))),
        transform(col("items"), x => struct(x.as("p1"), pnull.as("p2"))),
        flatten(transform(col("items"), (x, i) =>
          transform(slice(col("items"), i + lit(2), size(col("items"))),
            y => struct(x.as("p1"), y.as("p2"))))))).as("t"))
      .groupBy(col("t.p1").as("p1"), col("t.p2").as("p2"))
      .agg(count(lit(1)).as("c"))
    time("counts agg")(counts.count())
    time("full op")(marketBasket(oi).count())
    time("full op again")(marketBasket(oi).count())
    spark.stop()
  }
}
