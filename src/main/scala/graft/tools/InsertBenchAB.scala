package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B: the state-insert bench harness ([[graft.Bench.stateInsertBench]],
  * shared — not a copy) at different state partition counts, 3 reps
  * each in one JVM. Decides the partition sizing baked into Bench.
  */
object InsertBenchAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Bench.stateInsertBench(spark, 8) // warmup
    for (p <- Seq(32, 8, 4, 32, 8, 4, 32, 8, 4))
      println(f"parts=$p%2d  ${graft.Bench.stateInsertBench(spark, p)}%.2f s")
    spark.stop()
  }
}
