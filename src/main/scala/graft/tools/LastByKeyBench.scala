package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Micro-benchmark: three formulations of last-row-per-key on
  * lineitem sf0.1 (600k rows, ~160k distinct (partkey,suppkey) keys).
  * Decides the physical shape of StateOps.lastByKey.
  */
object LastByKeyBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.build(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]", "lbk", 32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val li = graft.core.Tables.load(spark, dir, "lineitem")
      .withColumn("_seq", col("l_orderkey") * 100 + col("l_linenumber"))
    li.count() // warmup read

    def time(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
      }
    }

    val keys = Seq("l_partkey", "l_suppkey")
    val full = struct(li.columns.toIndexedSeq.map(col): _*)

    time("max_by_struct") {
      li.groupBy(keys.map(col): _*)
        .agg(max_by(full, col("_seq")).as("_last")).select(col("_last.*")).count()
    }
    time("window_rownum") {
      val w = Window.partitionBy(keys.map(col): _*).orderBy(col("_seq").desc)
      li.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn").count()
    }
    time("max_struct_seqfirst") {
      li.groupBy(keys.map(col): _*)
        .agg(max(struct((col("_seq") +: li.columns.filterNot(_ == "_seq").toIndexedSeq.map(col)): _*)).as("_last"))
        .select(col("_last.*")).count()
    }
    time("maxseq_rejoin") {
      val m = li.groupBy(keys.map(col): _*).agg(max(col("_seq")).as("_seq"))
      li.join(m, keys :+ "_seq").count()
    }
    spark.stop()
  }
}
