package graft
import org.apache.spark.sql.SparkSession
/** Scratch timing probe for duplicate clustering (dev tool, not part of the
  * library surface).
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    for (i <- 1 to 4) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime
      val n = graft.operators.Dedup.clusters(docs).count()
      println(s"ITER$i rows=$n sec=${(System.nanoTime - t0) / 1e9}")
    }
    spark.stop()
  }
}
