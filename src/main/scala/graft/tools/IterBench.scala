package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deep-iteration probe for the graph family (VERDICT r9 task 6):
  * `runMain graft.tools.IterBench [iters] [checkpointEvery] [sfDir]` —
  * times PageRank at high round counts over the g1 transition graph,
  * proving the checkpoint cadence keeps wall-clock LINEAR in rounds
  * (an unchecked plan re-derives each round's double pr reference,
  * going exponential). Prints seconds + the analyzed-plan node count
  * (the lineage bound PlanAuditSpec pins).
  */
object IterBench {
  def main(args: Array[String]): Unit = {
    val iters = if (args.length > 0) args(0).toInt else 20
    val ckptEvery = if (args.length > 1) args(1).toInt else 5
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edges = graft.pipeline.GraphOps.transitionEdges(
      graft.core.Tables.load(spark, sfDir, "events"), "user_id",
      get_json_object(col("props"), "$.k"), "ts", tieCols = Seq("event_id"))
      .persist()
    edges.count() // warm the cached base so timings isolate the iteration
    (1 to 2).foreach { pass =>
      val t0 = System.nanoTime()
      val pr = graft.pipeline.GraphOps.pageRank(edges, iters = iters,
        checkpointEvery = ckptEvery)
      val n = pr.count()
      val nodes = { var c = 0; pr.queryExecution.analyzed.foreach(_ => c += 1); c }
      println(f"pass $pass: pageRank iters=$iters ckptEvery=$ckptEvery " +
        f"rows=$n ${(System.nanoTime() - t0) / 1e9}%.3f s planNodes=$nodes")
      spark.catalog.clearCache()
      edges.persist(); edges.count()
    }
    spark.stop()
  }
}
