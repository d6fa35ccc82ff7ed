package graft.tools

import org.apache.spark.sql.SparkSession

/** Split one catalog query's wall time into build (DataFrame
  * construction), plan (analysis + optimization + physical planning)
  * and execute (the count action): `runMain graft.tools.PhaseProbe
  * <name>[,name...] [sfDir] [passes]` — the r15 optimization round's
  * "is it Catalyst or the tasks" instrument.
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
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
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to passes).foreach { p =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis→physical planning
        val t2 = System.nanoTime()
        val n = df.count()
        val t3 = System.nanoTime()
        spark.catalog.clearCache()
        println(f"$name pass=$p rows=$n build=${(t1 - t0) / 1e9}%.3f " +
          f"plan=${(t2 - t1) / 1e9}%.3f exec=${(t3 - t2) / 1e9}%.3f " +
          f"total=${(t3 - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
