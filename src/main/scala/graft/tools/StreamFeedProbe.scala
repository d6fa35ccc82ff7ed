package graft.tools

import org.apache.spark.sql.functions.col

/** Decompose the st7s gate entry's fixed cost: driver collect of the
  * ordered feed, MemoryStream row-encoding, and the 4-batch complete
  * mode aggregation — so optimization effort lands on the real
  * bottleneck instead of the assumed one (round-7 guessed sketch
  * state serde; measure first).
  *
  *   sbt "runMain graft.tools.StreamFeedProbe"
  */
object StreamFeedProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.build("local[32]", "graft-feed-probe", 32)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val li = graft.core.Tables.load(spark, sfDir, "lineitem")
      .select(cols.map(col): _*)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    (1 to 2).foreach { pass =>
      println(s"-- pass $pass")
      val rows = time("orderBy+collect")(li.orderBy(col("l_orderkey")).collect())
      val stream = time("MemoryStream create")(
        org.apache.spark.sql.execution.streaming.runtime.MemoryStream[org.apache.spark.sql.Row](
          org.apache.spark.sql.Encoders.row(li.schema), sqlCtx))
      time("addData (encode all rows)")(stream.addData(rows.toIndexedSeq))
      val agg = time("batch agg equivalent")(
        graft.pipeline.Curation.numericProfileSketch(li, cols, sketchK = 1 << 18).collect())
      require(agg.length == 8)
    }
    spark.stop()
  }
}
