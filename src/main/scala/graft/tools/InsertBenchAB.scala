package graft.tools

import org.apache.spark.sql.{Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

/** Scratch A/B: state-insert micro-bench at different state partition
  * counts, 3 reps each, same JVM. */
object InsertBenchAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType),
      StructField("_seq", LongType)))
    val rows = (0 until 100000).map { i =>
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](i.toLong % 100, i * 0.5, i.toLong), schema): Row
    }
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def run(parts: Int): Double = {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Row](
        Encoders.row(schema), sqlCtx)
      val out = graft.streaming.StreamingState.lastByKeyStream(stream.toDF(), Seq("k"), "_seq")
      val q = out.writeStream.format("memory")
        .queryName(s"ab_${parts}_${System.nanoTime()}")
        .outputMode("update")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ab-ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
        .start()
      val t0 = System.nanoTime()
      try {
        rows.grouped(10000).foreach(stream.addData(_))
        q.processAllAvailable()
        (System.nanoTime() - t0) / 1e9
      } finally q.stop()
    }
    run(8) // warmup
    for (p <- Seq(32, 8, 4, 32, 8, 4, 32, 8, 4))
      println(f"parts=$p%2d  ${run(p)}%.2f s")
    spark.stop()
  }
}
