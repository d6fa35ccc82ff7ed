package graft.tools

import org.apache.spark.sql.SparkSession

/** Time one catalog query at a given SF dir (dev loop for plan work):
  * `runMain graft.tools.QueryBench <name> [sfDir] [passes]` — prints
  * per-pass seconds and the min, same steady-state convention as
  * [[graft.Bench]].
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    val times = (1 to passes).map { _ =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      (dt, n)
    }
    times.foreach { case (dt, n) => println(f"$name%s rows=$n%d ${dt}%.3f s") }
    println(f"min ${times.map(_._1).min}%.3f s")
    spark.stop()
  }
}
