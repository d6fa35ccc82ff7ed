package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SketchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        graft.pipeline.Dedup.releaseCaches(); spark.catalog.clearCache()
        val t0 = System.nanoTime(); val n = f; val t = (System.nanoTime()-t0)/1e9
        (t, n)
      }
      println(f"$label%-28s min=${ts.map(_._1).min}%.3f s rows=${ts.head._2}")
    }
    time("minhash adaptive(direct)") { graft.pipeline.Dedup.minhashLshPairs(docs, "doc_id", "text").count() }
    time("minhash factored") { graft.pipeline.Dedup.minhashLshPairs(docs, "doc_id", "text", adaptive = false).count() }
    time("simhash adaptive(direct)") { graft.pipeline.Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 2).count() }
    time("simhash factored") { graft.pipeline.Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 2, adaptive = false).count() }
    spark.stop()
  }
}
